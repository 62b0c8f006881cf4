"""Equivalence: native C++ postprocess vs the Python postprocess path.

Both implement reference mapping.rs:402-927 + record.rs:282-438; the native
path must produce byte-identical encoded BAM records for the same inputs
(same per-read RNG seeds), across multi-mappers, reverse strand, unmapped
reads, XA enumeration, and original-symbol MD re-substitution.
"""

import io

import numpy as np
import pytest

from mapad_tpu.index.builder import build_from_sequences
from mapad_tpu.index.runtime import Index
from mapad_tpu.io.bam import BamWriter, decode_record, encode_record
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.native_post import (
    NativePostprocessor,
    PackedHits,
    available,
    pack_hits,
)
from mapad_tpu.map.oracle import k_mismatch_search
from mapad_tpu.map.postprocess import SplitMixRng, create_bam_header, intervals_to_bam
from mapad_tpu.map.record import Record
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.utils.seq import revcomp

pytestmark = pytest.mark.skipif(not available(), reason="no native postprocess")


def _params(chunk_size=10000):
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.6, 0.55), 0.01, 1.0,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    return AlignmentParameters(
        difference_model=dm,
        mismatch_bound=Discrete(0.03, 0.02, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=chunk_size, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(123)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g1 = rng.choice(bases, size=3000)
    # a duplicated segment so multi-mapping intervals appear
    g1[1000:1200] = g1[200:400]
    g1[2000:2200] = g1[200:400]
    # an N run (ambiguous-base replacement -> OriginalSymbols + MD resub)
    g1 = g1.tobytes()
    g1 = g1[:500] + b"N" * 6 + g1[506:]
    g2 = rng.choice(bases, size=1500).tobytes()
    fmd, ssa, idp, orig = build_from_sequences(
        [("chrA", g1), ("tiny_contig_b", g2)]
    )
    index = Index(fmd, ssa, idp, orig, {})
    params = _params()

    genome = {"chrA": g1, "tiny_contig_b": g2}
    reads = []
    rr = np.random.default_rng(5)
    for i in range(120):
        contig = "chrA" if rr.random() < 0.8 else "tiny_contig_b"
        g = genome[contig]
        ln = int(rr.integers(30, 90))
        pos = int(rr.integers(0, len(g) - ln))
        seq = bytearray(g[pos : pos + ln])
        for j in range(len(seq)):
            p = 0.3 * (0.5 ** j) + 0.3 * (0.5 ** (len(seq) - 1 - j)) + 0.01
            if seq[j : j + 1] == b"C" and rr.random() < p:
                seq[j] = ord("T")
        if rr.random() < 0.5:
            seq = bytearray(revcomp(bytes(seq)))
        # a few exogenous (unmappable) reads
        if i % 17 == 0:
            seq = bytearray(rr.choice(bases, size=ln).tobytes())
        quals = bytes(int(q) for q in rr.integers(25, 41, size=ln))
        reads.append(
            Record(sequence=bytes(seq), base_qualities=quals,
                   name=f"read{i}".encode())
        )

    results = []
    for r in reads:
        hits = k_mismatch_search(
            r.sequence, r.base_qualities, params, index.fmd
        )
        results.append((hits, 0.00125))
    return index, params, reads, results


def _python_records(index, params, reads, results, chunk_id=3, seed=0,
                    read_group=None):
    out = []
    for i, (record, (hits, duration)) in enumerate(zip(reads, results)):
        rng = SplitMixRng((seed << 40) ^ (chunk_id << 20) ^ i)
        out.append(
            intervals_to_bam(
                record, list(hits), index.suffix_array, index.id_pos_map,
                index.original_symbols, duration, params,
                read_group[0] if read_group else None, rng,
            )
        )
    return out


def _decode_all(blob):
    recs = []
    off = 0
    while off < len(blob):
        rec, off = decode_record(blob, off)
        recs.append(rec)
    return recs


def test_native_matches_python_bytes(fixture):
    index, params, reads, results = fixture
    post = NativePostprocessor(index, params, threads=3)
    blob = post.convert_chunk(reads, results, chunk_id=3, position_seed=0)

    py_records = _python_records(index, params, reads, results)
    py_blob = b"".join(encode_record(r) for r in py_records)

    native_recs = _decode_all(blob)
    py_recs = _decode_all(py_blob)
    assert len(native_recs) == len(py_recs)
    n_mapped = sum(1 for r in py_recs if not r.flags & 0x4)
    n_multi = sum(1 for r in py_recs if r.tag("X0") not in (None, 1))
    n_xa = sum(1 for r in py_recs if r.tag("XA"))
    n_rev = sum(1 for r in py_recs if r.flags & 0x10)
    # the workload must actually exercise the interesting paths
    assert n_mapped > 80 and n_multi > 3 and n_xa > 3 and n_rev > 20
    assert len(py_recs) - n_mapped >= 5
    for a, b in zip(native_recs, py_recs):
        assert a == b, f"record mismatch for {b.name}: {a} vs {b}"
    assert blob == py_blob


def test_native_matches_python_with_read_group(fixture):
    index, params, reads, results = fixture
    rg = (b"lib1", [("SM", "sample1")])
    post = NativePostprocessor(index, params, threads=2)
    blob = post.convert_chunk(
        reads[:40], results[:40], chunk_id=0, position_seed=7, read_group=rg
    )
    py_records = _python_records(
        index, params, reads[:40], results[:40], chunk_id=0, seed=7,
        read_group=rg,
    )
    assert blob == b"".join(encode_record(r) for r in py_records)


def test_packed_roundtrip(fixture):
    index, params, reads, results = fixture
    split = params.difference_model.find_alignment_start(75)
    for hits, _ in results:
        if not hits:
            continue
        ph = pack_hits(hits, split)
        assert isinstance(ph, PackedHits)
        dec = ph.decode()
        assert len(dec) == len(hits)
        for a, b in zip(dec, hits):
            assert a.interval == b.interval
            assert np.float32(a.alignment_score) == np.float32(b.alignment_score)
            assert a.edit_operations == b.edit_operations


def test_native_engine_packed_hits_decode_matches(fixture):
    """NativeSearchEngine(packed_hits=True) emits PackedHits whose decode()
    equals the engine's own decoded-hit output (same searcher, both modes)."""
    from mapad_tpu.map import native_search

    if not native_search.available():
        pytest.skip("no native searcher")
    index, params, reads, _ = fixture
    plain = native_search.NativeSearchEngine(index.fmd, params, threads=2)
    packed = native_search.NativeSearchEngine(
        index.fmd, params, threads=2, packed_hits=True
    )
    sub = reads[:30]
    res_plain = plain.search_chunk(sub)
    res_packed = packed.search_chunk(sub)
    n_nonempty = 0
    for (hits_a, _), (hits_b, _) in zip(res_plain, res_packed):
        assert isinstance(hits_b, PackedHits)
        dec = hits_b.decode()
        assert len(dec) == len(hits_a)
        n_nonempty += bool(hits_a)
        for a, b in zip(hits_a, dec):
            assert a.interval == b.interval
            assert np.float32(a.alignment_score) == np.float32(b.alignment_score)
            assert a.edit_operations == b.edit_operations
    assert n_nonempty > 20


def test_bam_writer_raw_path(fixture, tmp_path):
    """Raw-blob writes through BamWriter produce a parseable BAM."""
    index, params, reads, results = fixture
    from mapad_tpu.io.bam import BamReader

    post = NativePostprocessor(index, params, threads=2)
    blob = post.convert_chunk(reads, results, chunk_id=0)
    header = create_bam_header(None, index.id_pos_map, None, "test")
    buf = io.BytesIO()
    with BamWriter(buf, header) as w:
        w.write_raw(blob)
    buf.seek(0)
    recs = list(BamReader(buf))
    assert len(recs) == len(reads)
    assert [r.name for r in recs] == [r.name for r in reads]
