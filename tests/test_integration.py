"""End-to-end integration test: FASTA -> index -> map -> BAM.

Port of reference tests/integration_tests.rs (test genome, 17 reads, golden
per-record field comparison from shared_expectation() :464-868).
"""

import os

import numpy as np
import pytest

from mapad_tpu.index.builder import run as index_run
from mapad_tpu.io.bam import BamReader, BamRecord, BamWriter, SamHeader
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.pipeline import run as mapping_run
from mapad_tpu.models import Discrete, SimpleAncientDnaModel

FASTA_CONTENT = """>chr1
TGTACTCGGGTGCCGAAGCCTACAGCTGGACCACCCGATGGCGTGCCTCTATCGGCACTC
GGCAGAATTGTTCCGGACGTATTGCAACTCCTCCGTACTTTGGTCCGTAAACTCACTTAG
CTACCCTGTCACCCCTGCGGTATTTAAAAGGCCTAAGCTGATCTTGCACGTGAGAGCCTC
GCGTCTTGTGAGAAAAAGGTCCGGAAGTAATGGTTTGACACGATCAACGCCCGTCACGCC
GTATGGTCTGCTTAGCCCAACTAGAGTTTTAACAATGAACTTAGGGAACGACCAGGGAAC
ATATGCGACGTAAGAATGTTTGCCAGCCTCAGTAATTTGCAGGGGATAGTCTCCATTAGA
GCTTCCGGGTGGACATTTTTCGTGTCACTTGCCCCGACAAGCGACTAGCGTGTAGAGGGA
CAAAAGTCACAGGATTCCCAGGCATCTCTACTCCATAAGACTTTGTCACGAACTCATTAG
ACCTATGTCGCGACTACCCATGTATGGGCTCGCACCCTTCATGATTCTGCGCTGACCCTA
GGATGCCGAGTAGCACTTCCGCTGTGTATGTGGGGTTAGACCGAACACTAAGACCTTCAG
>Chromosome_02
CAGTGATGAAATGCCAAAGTCTAGGTTGGGGGAATAGGGCCGCGCCCTCTCCAGCGGCTC
TATGGCCGGACAATTTCGGACAGGCCTCATACAGGGTTCAAAGGTCAGGCCACGCGGGCT
GATCTTCCCTTCTGAGGCCCTCATGTATGTACTAAATAGCTAACGCTATGACTCGGCGTT
TAATACTTCAAGAATCCGTAGACTCTGATCGATCATGCTAAAAATCGATCGAGCATCAAC
TCCAATTGGAGGTCTTTACATTAGGACCTGACTCACTACGTACGCTGTGGTACATAATAG
CGATACTCATCGTCCAAGTTCAACGTGGGTAACAACCCTACTGGCTCCCCCGAATAGTAG
TACCAGGACGGGCTCAACAATACTGGAAGTAACGGAATTTTTTGCCGTAATTCTCAAAAT
AAAGAGGTAATTGACCGAAAACCCTGTAACTCACCAATATGGGTTGGCAATCTTACCAAA
ATTCTGATGACGAAGTGTATACCCTGGCGTGCTNGTCCCTCGGCGTTGGATATCCTAGAT
TGAGAATCCTGTCGCGGGACCTCGTTTAGGAAGCGAATGGTTGCACATCCGTCTAAACTA
>Chromosome_03
CCAAGAATCCGTAGACTCTGATCGATCATGCTAAAAATCGACCCAAGAATCCGTAGACTC
TGATCGATCATGCTAAAAATCGAT
>Chromosome_04
GATCacATGGCTGCTGTATTGATACAGTGGCTGGGGCATTCAATGC
"""

Q = b"]" * 64  # high-quality run for slicing


def _tags(rg=True):
    tags = [
        (b"XI", "Z", b"ACGACGT"), (b"YI", "Z", b":BBBBGG"),
        (b"XJ", "Z", b"TGCTGCA"), (b"YJ", "Z", b"AAAAABB"),
        (b"FF", "i", 3), (b"Z0", "i", 0),
    ]
    if rg:
        tags.append((b"RG", "Z", b"A12345"))
    return tags


def _input_reads():
    q45_1 = b"]" * 15 + b"\\" * 3 + b"]" * 21 + b"\\" + b"]" * 3 + b"\\" + b"Z"
    q45_2 = q45_1[::-1]
    return [
        # (name, flags, seq, qual_ascii, tags)
        (b"A00123_0123_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"TTAACAATGAACTTAGGGAACGACCAGG", Q[:28], _tags()),
        (b"A00234_0124_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 589,
         b"TTAACAATGAACTTAGGGAACGACCAGG", Q[:28], _tags()),
        (b"A00345_0125_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16,
         b"CCTGGTCGTTCCCTAAGTTCATTGTTAA", Q[:28], _tags()),
        (b"A00456_0126_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16,
         b"TTAACAATGAACTTAGGGAACGACCAGG", Q[:28], _tags()),
        (b"A00567_0127_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CCTGGTCGTTCCCAAGTTCATTGTTAA", Q[:27], _tags()),
        (b"A00678_0128_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CCTGGTCGTTCCCTTAAGTTCATTGTTAA", Q[:29], _tags()),
        (b"A00789_0129_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0,
         b"TTAACAATGAACTTAGGGAACGACCAGG", Q[:28],
         _tags() + [(b"AS", "i", 0), (b"NM", "i", 0), (b"MD", "Z", b"28"),
                    (b"XD", "i", 195)]),
        (b"A00789_0130_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"GATTGGTGCACGGACGCGCGTTGAAAGG", Q[:28], []),
        (b"A00791_0131_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CCTCAT", Q[:6], []),
        (b"A00792_0132_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"TCAAGAATCCGTAGACTCTGATCGATCATGCTAAAAATCGAT", Q[:42], []),
        (b"A00793_0133_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CTGGCGTGCTAGTCCCTCGGCG", Q[:22], []),
        (b"A00794_0134_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CGCCGAGGGACTAGCACGCCAG", Q[:22], []),
        (b"A00795_0135_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"CGCCGAGGGACTAGCACCCCAG", Q[:22], []),
        (b"A00795_0136_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4,
         b"TTAACAATGAACTTACGGGAACGACCAGG", Q[:29], []),
        (b"Regression_test_example_1", 4,
         b"GATCTATGGCTGCTGTATTGATACAGTGGCTGGGGCATTCAATGC", q45_1, []),
        (b"Regression_test_example_1_revcomp", 4,
         b"GCATTGAATGCCCCAGCCACTGTATCAATACAGCAGCCATAGATC", q45_2, []),
        (b"Regression_test_example_2", 4,
         b"GATCACATGGCTGCTGTATTGATACAGTGGCTGGGGCATTAATGC", q45_1, []),
    ]


INPUT_HEADER_TEXT = (
    "@HD\tVN:1.0\n"
    "@RG\tID:A12345\tSM:Sample1\n"
    "@SQ\tSN:chr1\tLN:600\n"
    "@PG\tID:samtools\tPN:samtools\tVN:1.13\tCL:samtools view -h "
    "interesting_specimen.bam -o input_reads.bam\n"
    "@PG\tID:mapAD\tPN:mapAD\tCL:mapad map\tPP:samtools\tDS:An aDNA aware "
    "short-read mapper\tVN:0.0.33\n"
    "@PG\tID:mapAD.1\tPN:mapAD\tCL:mapad map\tPP:mapAD\tDS:An aDNA aware "
    "short-read mapper\tVN:0.0.33\n"
)


def _qual_decoded(ascii_quals: bytes) -> bytes:
    return bytes(q - 33 for q in ascii_quals)


def prepare(tmp_path):
    genome = tmp_path / "test_genome.fa"
    genome.write_text(FASTA_CONTENT)
    index_run(str(genome), seed=1234)

    input_bam = tmp_path / "input_reads.bam"
    header = SamHeader.from_text(INPUT_HEADER_TEXT)
    with open(input_bam, "wb") as f:
        with BamWriter(f, header) as w:
            for name, flags, seq, qual, tags in _input_reads():
                w.write_record(
                    BamRecord(
                        name=name, flags=flags, ref_id=-1, pos=-1, mapq=0,
                        cigar=[], sequence=seq, quals=_qual_decoded(qual),
                        tags=tags,
                    )
                )

    base_error_rate = 0.02
    model = SimpleAncientDnaModel(
        ("single_stranded", 0.6, 0.55), 0.01, 1.0,
        np.float32(base_error_rate) / np.float32(3.0), False,
    )
    repr_mm = model.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=model,
        mismatch_bound=Discrete(0.03, base_error_rate, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=1,
        gap_dist_ends=5,
        stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    return genome, input_bam, params


# (name, flags, tid, pos_1based, mapq, cigar, seq, qual, md, x0, x1, xa, xs, xt, rg)
def shared_expectation():
    n28 = b"TTAACAATGAACTTAGGGAACGACCAGG"
    q45 = b"]" * 15 + b"\\" * 3 + b"]" * 21 + b"\\" + b"]" * 3 + b"\\" + b"Z"
    reg1 = b"GATCTATGGCTGCTGTATTGATACAGTGGCTGGGGCATTCAATGC"
    return [
        ("A00123_0123_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 0, 269, 37,
         "28M", n28, Q[:28], "28", 1, 0, None, None, "U", "A12345"),
        ("A00234_0124_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 577, 0, 269, 37,
         "28M", n28, Q[:28], "28", 1, 0, None, None, "U", "A12345"),
        ("A00345_0125_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 0, 269, 37,
         "28M", n28, Q[:28], "28", 1, 0, None, None, "U", "A12345"),
        ("A00456_0126_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16, 0, 269, 37,
         "28M", n28, Q[:28], "28", 1, 0, None, None, "U", "A12345"),
        ("A00567_0127_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16, 0, 269, 20,
         "14M1D13M", b"TTAACAATGAACTTGGGAACGACCAGG", Q[:27], "14^A13", 1, 0,
         None, None, "U", "A12345"),
        ("A00678_0128_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16, 0, 269, 20,
         "15M1I13M", b"TTAACAATGAACTTAAGGGAACGACCAGG", Q[:29], "28", 1, 0,
         None, None, "U", "A12345"),
        ("A00789_0129_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 0, 269, 37,
         "28M", n28, Q[:28], "28", 1, 0, None, None, "U", "A12345"),
        ("A00789_0130_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 4, None, None, 0,
         "*", b"GATTGGTGCACGGACGCGCGTTGAAAGG", Q[:28], None, None, None, None,
         None, None, None),
        ("A00791_0131_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 1, 85, 3,
         "6M", b"CCTCAT", Q[:6], "6", 2, 0, "Chromosome_02,+139,6M,6,0,2,0.00;",
         None, "R", None),
        ("A00792_0132_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 1, 188, 3,
         "42M", b"TCAAGAATCCGTAGACTCTGATCGATCATGCTAAAAATCGAT", Q[:42], "42", 1, 2,
         "Chromosome_03,+43,42M,0C41,1,1,-0.72;Chromosome_03,+1,42M,0C40C0,2,1,-1.56;",
         -0.7209588, "U", None),
        ("A00793_0133_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 1, 504, 37,
         "22M", b"CTGGCGTGCTAGTCCCTCGGCG", Q[:22], "10N11", 1, 0, None, None,
         "U", None),
        ("A00794_0134_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16, 1, 504, 37,
         "22M", b"CTGGCGTGCTAGTCCCTCGGCG", Q[:22], "10N11", 1, 0, None, None,
         "U", None),
        ("A00795_0135_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 16, 1, 504, 37,
         "22M", b"CTGGGGTGCTAGTCCCTCGGCG", Q[:22], "4C5N11", 1, 0, None, None,
         "U", None),
        ("A00795_0136_ABC12XXXXX_ABcd_AB_CC_DE:1:2345:1234:5678", 0, 0, 269, 20,
         "15M1I13M", b"TTAACAATGAACTTACGGGAACGACCAGG", Q[:29], "28", 1, 0,
         None, None, "U", None),
        ("Regression_test_example_1", 0, 3, 1, 20, "5M1D40M", reg1, q45,
         "4A0^C40", 1, 0, None, None, "U", None),
        ("Regression_test_example_1_revcomp", 16, 3, 1, 20, "5M1D40M", reg1, q45,
         "4A0^C40", 1, 0, None, None, "U", None),
        ("Regression_test_example_2", 0, 3, 1, 37, "40M1D5M",
         b"GATCACATGGCTGCTGTATTGATACAGTGGCTGGGGCATTAATGC", q45, "40^C5", 1, 0,
         None, None, "U", None),
    ]


def _check_results(bam_path, expected_rg=None):
    with open(bam_path, "rb") as f:
        reader = BamReader(f)
        header_text = reader.header_text
        records = list(reader)

    header_prefix = (
        "@HD\tVN:1.6\tSO:unsorted\n"
        "@SQ\tSN:chr1\tLN:600\n"
        "@SQ\tSN:Chromosome_02\tLN:600\n"
        "@SQ\tSN:Chromosome_03\tLN:84\n"
        "@SQ\tSN:Chromosome_04\tLN:46\n"
        + ("@RG\tID:A12345\tSM:Sample1\n" if expected_rg is None else f"@RG\tID:{expected_rg}\n")
        + "@PG\tID:samtools\tPN:samtools\tVN:1.13\tCL:samtools view -h "
        "interesting_specimen.bam -o input_reads.bam\n"
        "@PG\tID:mapAD\tPN:mapAD\tCL:mapad map\tPP:samtools\tDS:An aDNA aware "
        "short-read mapper"
    )
    assert header_text.startswith(header_prefix), header_text[: len(header_prefix) + 50]

    records.sort(key=lambda r: r.name or b"")
    expected = shared_expectation()
    assert len(records) == len(expected)
    for rec, exp in zip(records, expected):
        (name, flags, tid, pos1, mapq, cigar, seq, qual_ascii, md, x0, x1, xa,
         xs, xt, rg) = exp
        if expected_rg is not None:
            rg = expected_rg
        ctx = name
        assert rec.name.decode() == name, ctx
        assert rec.flags == flags, (ctx, rec.flags, flags)
        assert (rec.ref_id if rec.ref_id >= 0 else None) == tid, (ctx, rec.ref_id)
        got_pos = rec.pos + 1 if rec.pos >= 0 else None
        assert got_pos == pos1, (ctx, got_pos, pos1)
        assert rec.mapq == mapq, (ctx, rec.mapq, mapq)
        assert rec.cigar_string() == cigar, (ctx, rec.cigar_string(), cigar)
        assert rec.sequence == seq, (ctx, rec.sequence, seq)
        assert rec.quals == _qual_decoded(qual_ascii), ctx
        got_md = rec.tag(b"MD")
        assert got_md == (md.encode() if md is not None else None), (ctx, got_md, md)
        assert rec.tag(b"X0") == x0, (ctx, rec.tag(b"X0"), x0)
        assert rec.tag(b"X1") == x1, (ctx, rec.tag(b"X1"), x1)
        got_xa = rec.tag(b"XA")
        assert got_xa == (xa.encode() if xa is not None else None), (ctx, got_xa, xa)
        got_xs = rec.tag(b"XS")
        if xs is None:
            assert got_xs is None, ctx
        else:
            assert got_xs is not None and abs(got_xs - xs) < 1e-6, (ctx, got_xs, xs)
        got_xt = rec.tag(b"XT")
        assert got_xt == (ord(xt) if xt is not None else None), (ctx, got_xt, xt)
        got_rg = rec.tag(b"RG")
        assert got_rg == (rg.encode() if rg is not None else None), (ctx, got_rg, rg)


def test_integration_local(tmp_path):
    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_local.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params, None,
                cmdline="mapad map")
    _check_results(out)


def test_integration_local_python_postprocess(tmp_path, monkeypatch):
    # Force the pure-Python output path (run_inner uses the native C++
    # postprocessor when available); goldens must hold on both.
    monkeypatch.setenv("MAPAD_NO_NATIVE_POST", "1")
    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_pypost.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params, None,
                cmdline="mapad map")
    _check_results(out)


def test_integration_local_threaded_postprocess(tmp_path, monkeypatch):
    # threads > 1 parallelizes per-record BAM conversion; output must stay
    # byte-for-byte deterministic (order + per-read RNG).  Native post is
    # disabled so the threaded *Python* conversion pool is what runs.
    monkeypatch.setenv("MAPAD_NO_NATIVE_POST", "1")
    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_mt.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params, None,
                cmdline="mapad map", threads=4)
    _check_results(out)


def _small_pool_engine(genome, params, packed=True):
    from mapad_tpu.index.runtime import load_index
    from mapad_tpu.ops.search_pool import PoolConfig
    from mapad_tpu.ops.engine import DeviceSearchEngine

    index = load_index(str(genome))
    cfg = PoolConfig(max_len=64, lanes=8, total_steps=8192, max_chains=256,
                     compute_forward_part=False)
    return index, DeviceSearchEngine(
        index.fmd, params, mode="pool", pool_config=cfg, packed_hits=packed,
    )


def test_integration_preloaded_index(tmp_path):
    # pipeline.run(index=...) reuses a caller-loaded index (the reference
    # loads once per process, mapping.rs:75-90); output must equal the
    # path-loading run exactly.
    from mapad_tpu.index.runtime import load_index

    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_preidx.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params, None,
                cmdline="mapad map", index=load_index(str(genome)))
    _check_results(out)


def test_integration_device_streaming(tmp_path):
    # Full pipeline through the streaming block driver (device pool engine
    # + prep thread + ordered writer); goldens must hold exactly.
    genome, input_bam, params = prepare(tmp_path)
    _, engine = _small_pool_engine(genome, params)
    engine.block_reads = 8  # force multi-block streaming
    out = tmp_path / "output_reads_stream.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params, None,
                engine=engine, cmdline="mapad map")
    _check_results(out)


def test_streaming_block_slicing_matches_oracle(tmp_path):
    # Sheets larger than the device block (chunk_size=9, block_reads=4)
    # slice mid-sheet; the per-read PrRange seed uses the in-sheet index so
    # output must equal the sequential oracle path record for record
    # (modulo the XD wall-time tag).
    from mapad_tpu.map.pipeline import OracleSearchEngine

    genome, input_bam, params = prepare(tmp_path)
    params.chunk_size = 9  # dataclass; sheets of 9 records
    index, engine = _small_pool_engine(genome, params)
    engine.block_reads = 4
    out_stream = tmp_path / "out_stream.bam"
    mapping_run(str(input_bam), str(genome), str(out_stream), False, params,
                None, engine=engine, cmdline="mapad map")
    out_oracle = tmp_path / "out_oracle.bam"
    mapping_run(str(input_bam), str(genome), str(out_oracle), False, params,
                None, engine=OracleSearchEngine(index.fmd, params),
                cmdline="mapad map")

    def snapshot(path):
        with open(path, "rb") as f:
            reader = BamReader(f)
            return [
                (r.name, r.flags, r.ref_id, r.pos, r.mapq, r.cigar_string(),
                 r.sequence, r.quals,
                 sorted((t, tc, v) for t, tc, v in r.tags if bytes(t) != b"XD"))
                for r in reader
            ]

    got = snapshot(out_stream)
    want = snapshot(out_oracle)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g[0], g, w)


def test_integration_distributed(tmp_path):
    # reference integration_1_distributed (:220-257): dispatcher + 2 workers
    # as threads over localhost TCP, real sockets
    import threading
    import time as _time

    from mapad_tpu.distributed.dispatcher import Dispatcher
    from mapad_tpu.distributed.worker import Worker
    from mapad_tpu.map.pipeline import OracleSearchEngine

    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_distr.bam"
    port = 14321

    dispatcher = Dispatcher(
        str(input_bam), str(genome), str(out), False, params, None,
        cmdline="mapad map",
    )
    d_thread = threading.Thread(target=dispatcher.run, args=(port,))
    d_thread.start()
    _time.sleep(0.2)

    def run_worker():
        Worker(
            "127.0.0.1", port,
            engine_factory=lambda fmd, p: OracleSearchEngine(fmd, p),
        ).run()

    w_threads = [threading.Thread(target=run_worker) for _ in range(2)]
    for t in w_threads:
        t.start()
    for t in w_threads:
        t.join(timeout=120)
    d_thread.join(timeout=120)
    assert not d_thread.is_alive()

    _check_results(out)


def test_integration_rg(tmp_path):
    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_rg.bam"
    mapping_run(str(input_bam), str(genome), str(out), False, params,
                ("RG01", []), cmdline="mapad map")
    _check_results(out, expected_rg="RG01")


def test_distributed_worker_death_requeues(tmp_path):
    # Fault tolerance (dispatcher.rs:384-401): a worker dying mid-run must
    # not lose its chunk; the dispatcher re-queues it for the next worker.
    import threading
    import time as _time

    from mapad_tpu.distributed import wire
    from mapad_tpu.distributed.dispatcher import Dispatcher
    from mapad_tpu.distributed.worker import Worker
    from mapad_tpu.map.pipeline import OracleSearchEngine

    genome, input_bam, params = prepare(tmp_path)
    out = tmp_path / "output_reads_faulty.bam"
    port = 14323

    dispatcher = Dispatcher(
        str(input_bam), str(genome), str(out), False, params, None,
        cmdline="mapad map",
    )
    d_thread = threading.Thread(target=dispatcher.run, args=(port,))
    d_thread.start()
    _time.sleep(0.2)

    # Faulty worker: accepts one task sheet and drops the connection
    def faulty_worker():
        import socket

        sock = socket.create_connection(("127.0.0.1", port))
        msg = wire.read_message(sock)
        assert msg is not None
        sock.close()  # dies with an assigned, unanswered task

    f_thread = threading.Thread(target=faulty_worker)
    f_thread.start()
    f_thread.join(timeout=30)
    _time.sleep(0.3)

    def good_worker():
        Worker(
            "127.0.0.1", port,
            engine_factory=lambda fmd, p: OracleSearchEngine(fmd, p),
        ).run()

    g_thread = threading.Thread(target=good_worker)
    g_thread.start()
    g_thread.join(timeout=120)
    d_thread.join(timeout=120)
    assert not d_thread.is_alive()

    _check_results(out)
