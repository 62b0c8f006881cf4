"""Device-vs-oracle equivalence across model/bound configurations.

The main device tests run the production config (ss library + Discrete);
these sweeps cover the remaining observable configuration axes: Continuous
bound encoding, double-stranded library, ignore_base_quality, and gap
parameter variations.
"""

import os

import numpy as np
import pytest

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.oracle import k_mismatch_search as oracle_search
from mapad_tpu.map.record import Record
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.search_pool import PoolConfig
from mapad_tpu.models import Continuous, Discrete, SimpleAncientDnaModel

HERE = os.path.dirname(os.path.abspath(__file__))


def _reads(ref, n_reads, seed):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(n_reads):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        r = rng.random()
        if r < 0.15 and ln > 20:
            del seq[int(rng.integers(8, ln - 8))]
        elif r < 0.3 and ln > 20:
            seq.insert(int(rng.integers(8, ln - 8)), int(rng.choice(bases)))
        reads.append(bytes(seq))
    return reads


def _check(fmd, params, reads, qual=40):
    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384,
                     read_step_cap=4096, max_chains=2048,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    records = [
        Record(sequence=bytes(s), base_qualities=bytes([qual] * len(s)))
        for s in reads
    ]
    results = engine.search_chunk(records)
    for (hits, _), read in zip(results, reads):
        want = oracle_search(read, [qual] * len(read), params, fmd)
        assert len(hits) == len(want), (read[:16], len(hits), len(want))
        for g, w in zip(hits, want):
            assert g.interval == w.interval, read[:16]
            assert np.float32(g.alignment_score) == np.float32(
                w.alignment_score
            ), read[:16]
            assert g.edit_operations == w.edit_operations, read[:16]


@pytest.fixture(scope="module")
def ref_fmd():
    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    return ref, fmd


def test_continuous_bound(ref_fmd):
    ref, fmd = ref_fmd
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    # -c 0.15 -e 1.0 style continuous cutoff (main.rs:456-475)
    mb = Continuous(-np.float32(0.15), 1.0, repr_mm)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mb,
        penalty_gap_open=np.log2(np.float32(0.0001)), penalty_gap_extend=repr_mm,
        chunk_size=64, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    _check(fmd, params, _reads(ref, 32, 1))


def test_double_stranded_library(ref_fmd):
    ref, fmd = ref_fmd
    dm = SimpleAncientDnaModel(
        ("double_stranded", 0.475), 0.01, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)), penalty_gap_extend=repr_mm,
        chunk_size=64, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    _check(fmd, params, _reads(ref, 32, 2))


def test_ignore_base_quality(ref_fmd):
    ref, fmd = ref_fmd
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.6, 0.55), 0.01, 1.0,
        np.float32(0.02) / np.float32(3.0), True,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=64, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    _check(fmd, params, _reads(ref, 24, 3), qual=11)


def test_gap_parameter_variants(ref_fmd):
    ref, fmd = ref_fmd
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    for gap_dist_ends, max_gaps in ((0, 1), (10, 3)):
        params = AlignmentParameters(
            difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
            penalty_gap_open=np.log2(np.float32(0.001)),
            penalty_gap_extend=repr_mm * np.float32(0.5),
            chunk_size=64, gap_dist_ends=gap_dist_ends,
            stack_limit_abort=False, max_num_gaps_open=max_gaps,
        )
        _check(fmd, params, _reads(ref, 20, 4 + gap_dist_ends))


def test_pool_ring_wraparound_equals_oracle(ref_fmd):
    """Force the pop ring to wrap (steps >> RB) and groups to straddle the
    wrap: tiny read_step_cap with few lanes runs thousands of steps over a
    49-slot ring.  Also exercises abandon-escalation under wrap."""
    from tests.test_device_search import _adna_params

    ref, fmd = ref_fmd
    params = _adna_params()
    reads = _reads(ref, 48, 77)

    for cap in (48, 80, 200):  # RB 49 (G=1), 81 (G=2), 201 (G=4)
        cfg = PoolConfig(max_len=128, lanes=8, total_steps=16384,
                         max_chains=2048, compute_forward_part=False,
                         read_step_cap=cap)
        engine = DeviceSearchEngine(fmd, params, mode="pool",
                                    pool_config=cfg)
        records = [
            Record(sequence=bytes(s), base_qualities=bytes([40] * len(s)))
            for s in reads
        ]
        results = engine.search_chunk(records)
        for (hits, _dur), read in zip(results, reads):
            want = oracle_search(read, [40] * len(read), params, fmd)
            assert len(hits) == len(want), (cap, read[:12])
            for g, w in zip(hits, want):
                assert g.interval == w.interval, (cap, read[:12])
                assert np.float32(g.alignment_score) == np.float32(
                    w.alignment_score
                ), (cap, read[:12])
                assert g.edit_operations == w.edit_operations, (cap, read[:12])
