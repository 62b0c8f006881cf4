"""Bi-D array tests: port of bi_d_array.rs:242-309 + host/device equivalence."""

import numpy as np

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.bi_d_array import BiDArray
from mapad_tpu.models import TestBound, TestDifferenceModel


def _setup():
    fmd, _ = build_auxiliary_structures(b"GATTACA", b"ACGT")
    dm = TestDifferenceModel(deam_score=-1.0, mm_score=-1.0, match_score=0.0)
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm,
        mismatch_bound=TestBound(threshold=0.0, representative_mm_bound=repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)),
        penalty_gap_extend=repr_mm,
        chunk_size=1, gap_dist_ends=0, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    return fmd, dm, params


def test_d():
    fmd, dm, params = _setup()
    pattern = b"CCCCCCC"
    quals = bytes([10, 40, 40, 40, 40, 10, 40])
    bd = BiDArray(
        np.frombuffer(pattern, np.uint8), np.frombuffer(quals, np.uint8),
        len(pattern) // 2, params, fmd, dm,
    )
    assert list(bd.d_composite) == [0.0, 0.0, -1.0, 0.0, 0.0, -1.0, -1.0]
    assert bd.get(1, 4) == bd.d_composite[1] + bd.d_composite[bd.split + 2]
    assert bd.get(2, 3) == bd.d_composite[2] + bd.d_composite[bd.split + 3]
    assert bd.get(0, 6) == bd.d_composite[0] + bd.d_composite[bd.split]
    assert bd.get(2, 3) == -2.0
    assert bd.get(0, len(pattern) - 1) == 0.0


def test_device_bi_d_matches_host():
    import jax.numpy as jnp

    from mapad_tpu.ops.bi_d import compute_bi_d
    from mapad_tpu.ops.engine import _RANK_TABLE
    from mapad_tpu.ops.fm import DeviceFmIndex

    fmd, dm, params = _setup()
    dev = DeviceFmIndex.from_host(fmd)
    rng = np.random.default_rng(5)
    M = 16
    patterns = [b"CCCCCCC", b"GATTACA", b"TGTAATC", b"ACATTAG"]
    quals = bytes([10, 40, 40, 40, 40, 10, 40])
    L = len(patterns)

    for split_frac in (0.5, 1.0):
        rank = np.zeros((L, M), np.int32)
        pen = np.zeros((L, M), np.float32)
        n = np.zeros(L, np.int32)
        split = np.zeros(L, np.int32)
        hosts = []
        for i, p in enumerate(patterns):
            seq = np.frombuffer(p, np.uint8)
            q = np.frombuffer(quals, np.uint8)
            ln = len(seq)
            n[i] = ln
            split[i] = int(ln * split_frac)
            rank[i, :ln] = _RANK_TABLE[seq]
            best_mm = dm.min_penalties_mm_only(seq, q)
            opt = dm.optimal_penalties(seq, q)
            mm_retval = np.float32(best_mm - opt)
            idx = np.arange(ln)
            ga = np.minimum(idx, ln - idx - 1) >= params.gap_dist_ends
            pen[i, :ln] = np.where(
                ga, np.maximum(mm_retval, params.penalty_gap_extend), mm_retval
            )
            hosts.append(BiDArray(seq, q, split[i], params, fmd, dm))
        comp = np.asarray(
            compute_bi_d(
                dev, jnp.asarray(rank), jnp.asarray(pen), jnp.asarray(n),
                jnp.asarray(split), compute_forward_part=True,
            )
        )
        for i, host_bd in enumerate(hosts):
            ln = n[i]
            assert np.array_equal(comp[i, :ln], host_bd.d_composite), (
                i, split_frac, comp[i, :ln], host_bd.d_composite)


def test_native_bid_batch_matches_host():
    """C++ compute_bid_batch (threaded host Bi-D for the slut_packed path)
    vs the Python BiDArray port, bit-exact, fuzzed over random reads."""
    import pytest

    from mapad_tpu.map import native_search
    from mapad_tpu.ops.engine import _RANK_TABLE

    if not native_search.available():
        pytest.skip("native searcher unavailable")

    rng = np.random.default_rng(17)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=4096))
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    dm = TestDifferenceModel(deam_score=-1.0, mm_score=-1.0, match_score=0.0)
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm,
        mismatch_bound=TestBound(threshold=0.0, representative_mm_bound=repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)),
        penalty_gap_extend=repr_mm,
        chunk_size=1, gap_dist_ends=2, stack_limit_abort=False,
        max_num_gaps_open=2,
    )

    R, M = 24, 48
    rank = np.zeros((R, M), np.uint8)
    pen = np.zeros((R, M), np.float32)
    ns = np.zeros(R, np.int32)
    splits = np.zeros(R, np.int32)
    hosts = []
    for i in range(R):
        ln = int(rng.integers(20, M + 1))
        if i % 5 == 0:
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ln)
        else:
            start = int(rng.integers(0, len(ref) - ln))
            seq = np.frombuffer(ref[start:start + ln], np.uint8).copy()
            for _ in range(3):  # mutations force walk failures
                seq[int(rng.integers(0, ln))] = rng.choice(
                    np.frombuffer(b"ACGT", np.uint8)
                )
        q = rng.integers(10, 41, size=ln).astype(np.uint8)
        ns[i] = ln
        splits[i] = ln if i % 2 == 0 else ln // 2  # backward-only + split
        rank[i, :ln] = _RANK_TABLE[seq]
        best_mm = dm.min_penalties_mm_only(seq, q)
        opt = dm.optimal_penalties(seq, q)
        mm_retval = np.float32(best_mm - opt)
        idx = np.arange(ln)
        ga = np.minimum(idx, ln - idx - 1) >= params.gap_dist_ends
        pen[i, :ln] = np.where(
            ga, np.maximum(mm_retval, params.penalty_gap_extend), mm_retval
        )
        hosts.append(BiDArray(seq, q, splits[i], params, fmd, dm))

    nb = native_search.NativeBiD(fmd)
    for threads in (1, 3):
        out = nb.compute(rank, pen, ns, splits, threads=threads)
        for i, host_bd in enumerate(hosts):
            ln = ns[i]
            assert np.array_equal(out[i, :ln], host_bd.d_composite), (
                threads, i, out[i, :ln], host_bd.d_composite)
            assert not out[i, ln:].any()
