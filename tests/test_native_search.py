"""Native C++ searcher vs Python oracle equivalence."""

import os

import numpy as np
import pytest

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters, native_search
from mapad_tpu.map.oracle import k_mismatch_search as oracle_search
from mapad_tpu.map.record import Record
from mapad_tpu.models import Discrete, SimpleAncientDnaModel

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.skipif(not native_search.available(), reason="no native toolchain")
def test_native_matches_oracle():
    from mapad_tpu.ops.engine import DeviceSearchEngine

    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)), penalty_gap_extend=repr_mm,
        chunk_size=100, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    engine = DeviceSearchEngine(fmd, params, lanes=8)
    searcher = native_search.NativeSearcher(fmd)

    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [l.strip().encode() for l in
             open(os.path.join(HERE, "data", "bench_reads.txt"))]
    for _ in range(40):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 4))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        r = rng.random()
        if r < 0.2 and ln > 20:
            del seq[int(rng.integers(8, ln - 8))]
        elif r < 0.4 and ln > 20:
            seq.insert(int(rng.integers(8, ln - 8)), int(rng.choice(bases)))
        reads.append(bytes(seq))

    for read in reads:
        record = Record(sequence=bytes(read), base_qualities=bytes([40] * len(read)))
        got = engine._native_search(searcher, record)
        want = oracle_search(read, [40] * len(read), params, fmd)
        assert len(got) == len(want), (read[:16], len(got), len(want))
        for g, w in zip(got, want):
            assert g.interval == w.interval, read[:16]
            assert np.float32(g.alignment_score) == np.float32(w.alignment_score)
            assert g.edit_operations == w.edit_operations, (
                read[:16], g.edit_operations, w.edit_operations)


@pytest.mark.skipif(not native_search.available(), reason="no native toolchain")
def test_nohit_probe_equivalence():
    """The depth-first exhaustion probe must never change results: for
    hitless reads it proves emptiness (identical empty answer), for reads
    with hits it must bail and defer to the exact search (identical
    hits)."""
    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)),
        penalty_gap_extend=repr_mm,
        chunk_size=100, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    from mapad_tpu.ops.engine import DeviceSearchEngine

    engine = DeviceSearchEngine(fmd, params, lanes=8)
    searcher = native_search.NativeSearcher(fmd)

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(30):  # exogenous: mostly hitless, must exhaust
        ln = int(rng.integers(24, 90))
        reads.append(bytes(rng.choice(bases, ln)))
    for _ in range(30):  # genomic with damage: mostly hit-ful -> probe bails
        ln = int(rng.integers(24, 90))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 5))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))

    n_empty = 0
    for read in reads:
        record = Record(sequence=read, base_qualities=bytes([37] * len(read)))
        plain = engine._native_search(searcher, record, nohit=False)
        hinted = engine._native_search(searcher, record, nohit=True)
        assert len(plain) == len(hinted), read[:16]
        n_empty += not plain
        for g, w in zip(hinted, plain):
            assert g.interval == w.interval
            assert np.float32(g.alignment_score) == np.float32(w.alignment_score)
            assert g.edit_operations == w.edit_operations
    # the read mix must exercise BOTH probe outcomes
    assert 5 < n_empty < len(reads) - 5, n_empty
