"""Device (JAX) search vs host oracle equivalence tests.

The batched device engine must produce identical hit sets (scores, intervals,
edit-operation tracks, completion order) to the exact host oracle for every
non-escalated lane.
"""

import os

import numpy as np
import pytest

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.oracle import k_mismatch_search as oracle_search
from mapad_tpu.map.record import Record
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.models import Discrete, SimpleAncientDnaModel, TestBound, TestDifferenceModel

HERE = os.path.dirname(os.path.abspath(__file__))


def _adna_params():
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    mmb = Discrete(0.04, 0.02, repr_mm)
    return AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb,
        penalty_gap_open=np.log2(np.float32(0.00001)), penalty_gap_extend=repr_mm,
        chunk_size=1000, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )


def _records(seqs, qual=40):
    return [
        Record(sequence=bytes(s), base_qualities=bytes([qual] * len(s)))
        for s in seqs
    ]


def assert_hits_equal(device_hits, oracle_hits, ctx=""):
    assert len(device_hits) == len(oracle_hits), (
        ctx, len(device_hits), len(oracle_hits))
    for d, o in zip(device_hits, oracle_hits):
        assert d.interval == o.interval, (ctx, d.interval, o.interval)
        assert np.float32(d.alignment_score) == np.float32(o.alignment_score), (
            ctx, d.alignment_score, o.alignment_score)
        assert d.edit_operations == o.edit_operations, (
            ctx, d.edit_operations, o.edit_operations)


@pytest.fixture(scope="module")
def bench_fixture():
    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    fmd, sa = build_auxiliary_structures(ref, b"ACGT")
    return ref, fmd, sa


def test_bench_reads_device_equals_oracle(bench_fixture):
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    engine = DeviceSearchEngine(fmd, params, lanes=56, tiers=((2048, None),))
    results = engine.search_chunk(_records(reads))
    # one deep read exceeds the default read_step_cap (1024) and escalates
    # to the exact fallback; output equality below covers it either way
    assert engine._stats["oracle"] <= 1
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_random_reads_device_equals_oracle(bench_fixture):
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(99)
    reads = []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(48):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        # random strand
        if rng.random() < 0.5:
            from mapad_tpu.utils.seq import revcomp

            seq = bytearray(revcomp(seq))
        # mutations
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, ln))
            seq[p] = int(rng.choice(bases))
        # occasional indel
        r = rng.random()
        if r < 0.15 and ln > 20:
            p = int(rng.integers(8, ln - 8))
            del seq[p]
        elif r < 0.3 and ln > 20:
            p = int(rng.integers(8, ln - 8))
            seq.insert(p, int(rng.choice(bases)))
        reads.append(bytes(seq))
    # some exogenous reads too
    for _ in range(8):
        ln = int(rng.integers(30, 80))
        reads.append(bytes(rng.choice(bases, size=ln)))

    engine = DeviceSearchEngine(fmd, params, lanes=56, tiers=((2048, None),))
    results = engine.search_chunk(_records(reads))
    n_escalated = engine._stats["escalated"]
    assert n_escalated <= 4, n_escalated  # device handles nearly everything
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_test_model_device_equals_oracle():
    # TestDifferenceModel uses a center alignment start (both Bi-D halves)
    dm = TestDifferenceModel(deam_score=-0.5, mm_score=-1.0, match_score=0.0)
    mmb = TestBound(threshold=-2.0, representative_mm_bound=-1.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    ref = b"ACGTACGTACGTACGTGGGCCCTTTAAACCCGGGATCGATCG"
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    reads = [b"GTTC", b"ACGTACGT", b"GGGCCC", b"TTTAAA", b"GATCGA", b"CCCGGGAT"]
    engine = DeviceSearchEngine(fmd, params, lanes=56, tiers=((2048, None),))
    results = engine.search_chunk(_records(reads, qual=0))
    for (hits, _), read in zip(results, reads):
        oracle_hits = oracle_search(read, [0] * len(read), params, fmd, dm, mmb)
        assert_hits_equal(hits, oracle_hits, read)


def test_pool_engine_equals_oracle(bench_fixture):
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(123)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    for _ in range(60):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))
    reads.append(b"")  # empty read edge case

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384, max_chains=512,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    results = engine.search_chunk(_records(reads))
    assert engine._stats["oracle"] <= 2
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_pool_engine_packed_hits_equals_oracle(bench_fixture):
    # packed_hits=True: the engine emits flat PackedHits (native-postprocess
    # input format) instead of decoded HitInterval lists; decode() must
    # reproduce the oracle exactly, including via the escalation fallback.
    from mapad_tpu.map.native_post import PackedHits
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    reads.append(ref[1000:1200])  # overlong -> native/oracle fallback path
    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384, max_chains=512,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg,
                                packed_hits=True)
    results = engine.search_chunk(_records(reads))
    n_nonempty = 0
    for (hits, _dur), read in zip(results, reads):
        assert isinstance(hits, PackedHits)
        n_nonempty += bool(hits)
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits.decode(), oracle_hits, read[:16])
    assert n_nonempty > 0


def test_pool_per_read_xd_timing_default(bench_fixture):
    # Device-mode XD must be per-read by default (reference emits per-read
    # wall time unconditionally, mapping.rs:912-918): the kernel's per-read
    # step counts convert to distinct durations, not one batch average.
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(9)
    reads = []
    for _ in range(24):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        reads.append(bytes(ref[start : start + ln]))
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=16384, max_chains=512,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    results = engine.search_chunk(_records(reads))
    durations = [dur for _hits, dur in results]
    assert all(d > 0 for d in durations)
    # different-length reads take different step counts; a batch average
    # would make every duration identical
    assert len(set(durations)) > 1


def test_pool_abandon_escalates_to_exact_fallback(bench_fixture):
    # A tiny per-read step cap forces abandon markers; those reads must be
    # re-run exactly (native/oracle), not silently truncated.
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=4096, read_step_cap=64,
                     max_chains=256, compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    results = engine.search_chunk(_records(reads))
    assert engine._stats["oracle"] > 0  # some reads were abandoned
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_retry_tier_resolves_budget_starved_reads(bench_fixture, monkeypatch):
    """Reads that merely exhaust the SHARED L*S step budget re-run in a
    device retry block (each gets a much larger budget share) instead of
    the exact host fallback; output must stay oracle-identical and the
    host-fallback count ("oracle" stat) must shrink vs total escalations."""
    from mapad_tpu.ops.search_pool import PoolConfig

    monkeypatch.setenv("MAPAD_RETRY_TIER", "1")  # default-on only for big
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ] * 3
    # starve the shared budget: many reads stay unfinished/undispatched in
    # the primary block, but a retry block (same shapes) finishes them
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=192,
                     read_step_cap=192, max_chains=1024,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    engine.block_reads = 64
    results = engine.search_chunk(_records(reads))
    assert engine._stats["escalated"] > 0
    assert engine._stats.get("retried", 0) > 0
    # at least some escalatees were resolved on device (host fallbacks <
    # total first-pass escalations); deep reads (consumed most of their
    # per-read cap) intentionally DO take the host fallback
    ew = engine._stats["esc_why"]
    assert engine._stats["oracle"] < (
        ew["unfinished"] + ew["undispatched"] + ew["abandon"]
    )
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_deep_tier_resolves_abandons_on_device(bench_fixture, monkeypatch):
    """With the deep tier on, per-read-cap abandons re-run in a deep block
    whose config removes the cap (cap = whole budget) instead of taking
    the host fallback; output stays oracle-identical."""
    from mapad_tpu.ops.search_pool import PoolConfig

    monkeypatch.setenv("MAPAD_RETRY_TIER", "1")
    monkeypatch.setenv("MAPAD_DEEP_TIER", "1")
    # exercise the tier itself: keep no-hit escalatees in the deep path
    # (production routes them host-ward, ops/engine.py deep_nohit_host)
    monkeypatch.setenv("MAPAD_DEEP_NOHIT_HOST", "0")
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    # tiny per-read cap: the deep read(s) abandon in the primary block
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=4096,
                     read_step_cap=64, max_chains=1024,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    engine.block_reads = 64
    results = engine.search_chunk(_records(reads))
    assert engine._stats.get("deep_retried", 0) > 0
    # the deep config (cap=4096) finishes what the primary cap=64 abandons
    assert engine._stats["oracle"] < engine._stats["esc_why"]["abandon"]
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_narrow_deep_tier_oracle_equal(bench_fixture, monkeypatch):
    """The narrow-deep tier (fewer lanes x more steps, larger per-read
    cap) compiles a differently-shaped kernel; its results must stay
    oracle-identical and it must resolve primary-cap abandons on device."""
    from mapad_tpu.ops.search_pool import PoolConfig

    monkeypatch.setenv("MAPAD_RETRY_TIER", "1")
    monkeypatch.setenv("MAPAD_DEEP_TIER", "1")
    monkeypatch.setenv("MAPAD_DEEP_NOHIT_HOST", "0")
    monkeypatch.setenv("MAPAD_DEEP_LANES", "4")
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=2048,
                     read_step_cap=64, max_chains=1024,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    # default derivation: lanes 8 -> 4, steps 2048 -> 4096, cap = L*CAP
    # budget over the narrow lanes = 8*64/4 = 128 (< steps) -> but the
    # floor is the primary total_steps, so 2048
    deep = engine._deep_config()
    assert deep.lanes == 4
    assert deep.total_steps == 4096
    assert deep.read_step_cap == 2048
    engine.block_reads = 64
    results = engine.search_chunk(_records(reads))
    assert engine._stats.get("deep_retried", 0) > 0
    assert engine._stats["oracle"] < engine._stats["esc_why"]["abandon"]
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_overlong_reads_escalate(bench_fixture):
    # reads longer than max_len cannot enter the lanes; they must still be
    # mapped exactly via the native/host fallback
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    long_read = ref[1000:1200]  # 200bp > max_len 128
    reads = [long_read, ref[0:50]]
    engine = DeviceSearchEngine(fmd, params, lanes=8)
    results = engine.search_chunk(_records(reads))
    for (hits, _), read in zip(results, reads):
        want = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, want, read[:16])


def test_pool_determinism(bench_fixture):
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(5)
    reads = []
    for _ in range(40):
        ln = int(rng.integers(30, 90))
        start = int(rng.integers(0, len(ref) - ln))
        reads.append(bytes(ref[start : start + ln]))
    engine = DeviceSearchEngine(fmd, params, lanes=16,
                                tiers=((2048, None),))
    a = engine.search_chunk(_records(reads))
    b = engine.search_chunk(_records(reads))
    for (ha, _), (hb, _) in zip(a, b):
        assert len(ha) == len(hb)
        for x, y in zip(ha, hb):
            assert x.interval == y.interval
            assert np.float32(x.alignment_score) == np.float32(y.alignment_score)
            assert x.edit_operations == y.edit_operations


def test_hybrid_engine_equals_oracle(bench_fixture):
    from mapad_tpu.map import native_search
    from mapad_tpu.ops.engine import HybridSearchEngine
    from mapad_tpu.ops.search_pool import PoolConfig

    if not native_search.available():
        pytest.skip("native searcher unavailable")
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(300):  # >256 so the chunk actually splits
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384, max_chains=512,
                     compute_forward_part=False)
    engine = HybridSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    results = engine.search_chunk(_records(reads))
    assert len(results) == len(reads)
    assert 0.05 <= engine._p <= 0.95
    for (hits, _dur), read in zip(results, reads):
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])


def test_pool_host_bid_equals_device_bid(bench_fixture, monkeypatch):
    """The host-C++ Bi-D + prepacked-LUT dispatch path (slut_packed) must be
    output-identical to the on-device Bi-D path."""
    from mapad_tpu.map import native_search
    from mapad_tpu.ops.search_pool import PoolConfig

    if not native_search.available():
        pytest.skip("native searcher unavailable")

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(321)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(40):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384,
                     max_chains=512, compute_forward_part=False)

    def run(flag):
        monkeypatch.setenv("MAPAD_HOST_BID", flag)
        engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
        assert engine._host_bid_active() == (flag == "1")
        return engine.search_chunk(_records(reads))

    res_dev = run("0")
    res_host = run("1")
    for (dh, _), (hh, _) in zip(res_dev, res_host):
        assert_hits_equal(hh, dh)


def test_lut_cache_bitexact_vs_batch_luts():
    """The per-length LUT table cache must reproduce _batch_luts bitwise
    (same f32 op order on the same scalar inputs; engine.py _LutCache)."""
    from mapad_tpu.ops.engine import _LutCache, _batch_luts

    params = _adna_params()
    sdm = params.difference_model
    assert _LutCache.usable(sdm)
    rng = np.random.default_rng(11)
    L, M = 64, 96
    seqs = np.zeros((L, M), dtype=np.uint8)
    quals = np.zeros((L, M), dtype=np.uint8)
    n = np.zeros(L, dtype=np.int32)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for i in range(L):
        ln = int(rng.integers(17, M + 1))
        n[i] = ln
        seqs[i, :ln] = bases[rng.integers(0, 5, size=ln)]
        quals[i, :ln] = rng.integers(2, 60, size=ln)
    ref_lut, ref_pen = _batch_luts(sdm, params, seqs, quals, n, threads=1)

    cache = _LutCache(sdm, params)
    got_lut = np.zeros((L, M, 4), dtype=np.float32)
    got_pen = np.zeros((L, M), dtype=np.float32)
    cache.fill(seqs, quals, n, got_lut, got_pen)
    np.testing.assert_array_equal(got_lut.view(np.uint32), ref_lut.view(np.uint32))
    np.testing.assert_array_equal(got_pen.view(np.uint32), ref_pen.view(np.uint32))

    # second fill reuses the cached tables; also exercise a qual above the
    # first build's Q ceiling (forces a table rebuild)
    quals[0, 0] = 93
    ref_lut2, ref_pen2 = _batch_luts(sdm, params, seqs, quals, n, threads=1)
    got_lut[:] = 0
    got_pen[:] = 0
    cache.fill(seqs, quals, n, got_lut, got_pen)
    np.testing.assert_array_equal(got_lut.view(np.uint32), ref_lut2.view(np.uint32))
    np.testing.assert_array_equal(got_pen.view(np.uint32), ref_pen2.view(np.uint32))


def test_device_lut_table_bitexact():
    """_build_all_lut's flat all-lengths table must reproduce _batch_luts
    score cells bitwise: the device-gather prep path (_unpack_prep_lut)
    ships no score columns, only (class, qual) indices into this table."""
    from mapad_tpu.ops.engine import (
        _CLS_TABLE, _DEV_LUT_Q, _batch_luts, _build_all_lut,
    )

    params = _adna_params()
    sdm = params.difference_model
    table, pen_tab, off = _build_all_lut(sdm, params, 96)
    rng = np.random.default_rng(5)
    L, M = 48, 96
    seqs = np.zeros((L, M), dtype=np.uint8)
    quals = np.zeros((L, M), dtype=np.uint8)
    n = np.zeros(L, dtype=np.int32)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for i in range(L):
        ln = int(rng.integers(17, M + 1))
        n[i] = ln
        seqs[i, :ln] = bases[rng.integers(0, 5, size=ln)]
        quals[i, :ln] = rng.integers(2, 60, size=ln)
    ref_lut, ref_pen = _batch_luts(sdm, params, seqs, quals, n, threads=1)

    cls = _CLS_TABLE[seqs].astype(np.int64)
    j = np.arange(M, dtype=np.int64)[None, :]
    idx = np.where(
        j < n[:, None],
        off[n.astype(np.int64)][:, None]
        + (j * 5 + cls) * _DEV_LUT_Q + quals,
        table.shape[0] - 1,
    )
    got = table[idx]  # (L, M, 4)
    np.testing.assert_array_equal(
        got.view(np.uint32), ref_lut.view(np.uint32)
    )
    np.testing.assert_array_equal(
        pen_tab[idx].view(np.uint32), ref_pen.view(np.uint32)
    )


def test_dev_lut_prep_matches_legacy(bench_fixture, monkeypatch):
    """The small-blob device-LUT prep (_unpack_prep_lut) must hand the
    kernel a bit-identical slut_packed table vs the legacy full upload."""
    from mapad_tpu.map import native_search
    from mapad_tpu.ops.search_pool import PoolConfig

    if not native_search.available():
        pytest.skip("native searcher unavailable")
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    reads = []
    for _ in range(24):
        ln = int(rng.integers(17, 101))
        reads.append(bytes(bases[rng.integers(0, 5, size=ln)]))
    recs = _records(reads)

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=4096,
                     max_chains=512, compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    monkeypatch.setenv("MAPAD_HOST_BID", "1")

    monkeypatch.setenv("MAPAD_DEV_LUT", "0")
    legacy = engine._prepare(recs, 128, 32, host_bid=True)
    monkeypatch.setenv("MAPAD_DEV_LUT", "1")
    dev = engine._prepare(recs, 128, 32, host_bid=True)

    a = np.asarray(legacy["slut_packed"]).view(np.uint32)
    b = np.asarray(dev["slut_packed"]).view(np.uint32)
    np.testing.assert_array_equal(a, b)
    for k in ("n", "split", "cutoff_scale", "cutoff_thresh", "repr_mm"):
        np.testing.assert_array_equal(
            np.asarray(legacy[k]), np.asarray(dev[k])
        )

    # device-Bi-D small-blob path (big-genome mode): the reconstructed
    # dense kernel inputs must equal the legacy full upload bitwise
    monkeypatch.setenv("MAPAD_DEV_LUT", "0")
    legacy_f = engine._prepare(recs, 128, 32, host_bid=False)
    monkeypatch.setenv("MAPAD_DEV_LUT", "1")
    dev_f = engine._prepare(recs, 128, 32, host_bid=False, dev_full=True)
    assert dev_f.get("dev_prep")
    thr = np.asarray(legacy_f["cutoff_thresh"]).copy()
    thr[np.asarray(legacy_f["n"]) == 0] = np.float32(np.inf)
    np.testing.assert_array_equal(thr, np.asarray(dev_f["cutoff_thresh"]))
    for k in ("pattern_rank", "pattern_code", "n", "split",
              "cutoff_scale", "repr_mm"):
        np.testing.assert_array_equal(
            np.asarray(legacy_f[k]), np.asarray(dev_f[k]), err_msg=k
        )
    for k in ("score_lut", "pen"):
        np.testing.assert_array_equal(
            np.asarray(legacy_f[k]).view(np.uint32),
            np.asarray(dev_f[k]).view(np.uint32), err_msg=k,
        )


def test_hybrid_stream_equals_oracle(bench_fixture):
    """The hybrid engine's streaming path (device stream + native tail per
    block) must yield blocks in order with oracle-exact combined results."""
    from mapad_tpu.map import native_search
    from mapad_tpu.ops.engine import HybridSearchEngine
    from mapad_tpu.ops.search_pool import PoolConfig

    if not native_search.available():
        pytest.skip("native searcher unavailable")
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(600):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))
    records = _records(reads)

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384, max_chains=512,
                     compute_forward_part=False)
    engine = HybridSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    R = 300
    engine.device.block_reads = R
    blocks = [
        (("key", base), records[base : base + R])
        for base in range(0, len(records), R)
    ]
    got = list(engine.search_stream(iter(blocks), lazy_fallback=True))
    assert [k for k, _ in got] == [k for k, _ in blocks]
    from concurrent.futures import Future

    for (key, out), (_, blk) in zip(got, blocks):
        assert len(out) == len(blk)
        for res, record in zip(out, blk):
            if isinstance(res, Future):
                res = res.result()
            hits, _dur = res
            oracle_hits = oracle_search(
                record.sequence, record.base_qualities, params, fmd
            )
            assert_hits_equal(hits, oracle_hits, record.sequence[:16])


def test_pool_generations_resume_budget_starved_reads(bench_fixture):
    """In-kernel store generations (PoolConfig.generations > 1): when the
    store fills with lanes still live, the kernel compacts it in place and
    keeps stepping, so budget-starved reads RESUME with their frontier
    intact instead of escalating.  Results must be oracle-identical
    (including per-read hit completion order across the boundary), and the
    host-fallback count must shrink vs the gens=1 run of the same starved
    config."""
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ] * 2
    for _ in range(40):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(bytes(seq))
    # starved shared budget: 8 lanes x 640 steps cannot finish the pool in
    # one store generation (the gens=1 run escalates a large tail)
    base_cfg = dict(max_len=128, lanes=8, total_steps=640,
                    read_step_cap=512, max_chains=1024,
                    compute_forward_part=False)
    esc = {}
    for gens, spill in ((1, 0), (4, 0), (4, 96)):
        cfg = PoolConfig(generations=gens, min_live=1, spill_steps=spill,
                         **base_cfg)
        engine = DeviceSearchEngine(fmd, params, mode="pool",
                                    pool_config=cfg)
        results = engine.search_chunk(_records(reads))
        esc[gens, spill] = engine._stats["oracle"]
        for (hits, _dur), read in zip(results, reads):
            oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
            assert_hits_equal(hits, oracle_hits, (gens, spill, read[:16]))
    assert esc[1, 0] > 0, "starved config should escalate without generations"
    assert esc[4, 0] < esc[1, 0], esc
    # a capped spill resolves at least part of the starved tail
    assert esc[4, 96] <= esc[1, 0], esc


def test_pool_generations_noop_when_budget_suffices(bench_fixture):
    """With a budget large enough to finish in generation 0, the gens>1
    kernel must produce bit-identical results to gens=1 (the boundary
    branch never fires)."""
    from mapad_tpu.ops.search_pool import PoolConfig

    ref, fmd, _ = bench_fixture
    params = _adna_params()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    base_cfg = dict(max_len=128, lanes=16, total_steps=16384,
                    max_chains=512, compute_forward_part=False)
    outs = []
    for gens in (1, 3):
        cfg = PoolConfig(generations=gens, **base_cfg)
        engine = DeviceSearchEngine(fmd, params, mode="pool",
                                    pool_config=cfg)
        outs.append(engine.search_chunk(_records(reads)))
    for (ha, _), (hb, _) in zip(*outs):
        assert_hits_equal(ha, hb, "gens=3 vs gens=1")


def test_batched_nohit_probe_oracle_equal(bench_fixture, monkeypatch):
    """MAPAD_NOHIT_PROBE=1: no-hit escalatees run through the K-way
    interleaved exhaustion-probe batch (native exhaust_probe_batch);
    results must stay oracle-identical for every read -- including
    misrouted ones (exogenous-looking reads that DO have deep hits fall
    through to the exact search inside the probe task)."""
    from mapad_tpu.map import native_search
    from mapad_tpu.ops.search_pool import PoolConfig

    if not native_search.available():
        pytest.skip("no native toolchain")
    monkeypatch.setenv("MAPAD_NOHIT_PROBE", "1")
    monkeypatch.setenv("MAPAD_PROBE_BATCH", "5")  # force multiple batches
    ref, fmd, _ = bench_fixture
    params = _adna_params()
    rng = np.random.default_rng(41)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    # chimeric reads (two distant genome fragments): both halves extend
    # far so the search wanders past the tiny cap, but no full alignment
    # exists -- they escalate flagged no-hit and must exhaust to prove
    # unmapped
    for _ in range(24):
        ln = int(rng.integers(48, 90))
        h = ln // 2
        a = int(rng.integers(0, len(ref) - h))
        b = int(rng.integers(0, len(ref) - h))
        reads.append(ref[a : a + h] + ref[b : b + ln - h])
    cfg = PoolConfig(max_len=128, lanes=8, total_steps=4096,
                     read_step_cap=16, max_chains=256,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg)
    results = engine.search_chunk(_records(reads), lazy_fallback=True)
    assert engine._stats["oracle"] > 0
    for res, read in zip(results, reads):
        hits, _dur = res.result() if hasattr(res, "result") else res
        oracle_hits = oracle_search(read, [40] * len(read), params, fmd)
        assert_hits_equal(hits, oracle_hits, read[:16])
    # the probe batch proved at least one read hitless (checked AFTER
    # resolving every future: the stat is written by fallback-pool
    # tasks, so reading it before resolution races on a loaded host)
    assert engine._stats.get("probe_empty", 0) > 0
