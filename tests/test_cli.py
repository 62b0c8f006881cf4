"""CLI end-to-end smoke tests (index + map subcommands, FASTQ input)."""

import gzip

from mapad_tpu.cli import main, parse_read_group
from mapad_tpu.io.bam import BamReader

FASTA = ">chr1\nGGATCAAGTTCCGTAACCTGGATTACAGATTACAGGCCTTAGCAT\n"
FASTQ = (
    "@read1\nAAGTTCCGTAACCTGGATT\n+\nIIIIIIIIIIIIIIIIIII\n"
    "@read2\nCTGTAATCCAGGTTACGGA\n+\nIIIIIIIIIIIIIIIIIII\n"
)


def test_cli_index_and_map(tmp_path):
    ref = tmp_path / "genome.fa"
    ref.write_text(FASTA)
    reads = tmp_path / "reads.fq.gz"
    with gzip.open(reads, "wt") as f:
        f.write(FASTQ)
    out = tmp_path / "out.bam"

    assert main(["index", "-g", str(ref)]) == 0
    assert main([
        "map", "-r", str(reads), "-g", str(ref), "-o", str(out),
        "-p", "0.03", "-l", "single_stranded", "-f", "0.6", "-t", "0.55",
        "-d", "0.01", "-s", "1.0", "-i", "0.001", "--engine", "oracle",
    ]) == 0

    with open(out, "rb") as f:
        reader = BamReader(f)
        records = list(reader)
    assert [r.name for r in records] == [b"read1", b"read2"]
    assert records[0].flags == 0 and records[0].pos == 5
    assert records[1].flags == 16 and records[1].pos == 9  # reverse strand
    assert records[0].cigar_string() == "19M"
    assert reader.references[0] == ("chr1", 45)


def test_parse_read_group():
    rg_id, fields = parse_read_group("@RG\\tID:RG01\\tSM:sample2")
    assert rg_id == "RG01"
    assert fields == [("SM", "sample2")]


def test_cli_index_mapad_format(tmp_path):
    import numpy as np

    from mapad_tpu.cli import main
    from mapad_tpu.index.mapad_native import is_mapad_native_index, load_mapad_index
    from mapad_tpu.index.runtime import load_index

    rng = np.random.default_rng(3)
    fa = tmp_path / "g.fa"
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    fa.write_text(f">c1\n{seq[:2000]}\n>c2\n{seq[2000:]}NNN\n")
    assert main(["index", "-g", str(fa), "--mapad_format"]) == 0
    assert is_mapad_native_index(str(fa))
    ours = load_index(str(fa))
    theirs = load_mapad_index(str(fa))
    np.testing.assert_array_equal(ours.fmd.bwt, theirs.fmd.bwt)
    np.testing.assert_array_equal(
        np.asarray(ours.suffix_array.sample),
        np.asarray(theirs.suffix_array.sample),
    )
    assert [c.identifier for c in ours.id_pos_map] == ["c1", "c2"]
    assert [c.identifier for c in theirs.id_pos_map] == ["c1", "c2"]
