"""int64 ("big") device-index mode: lo/hi packed checkpoints, 64-bit
interval arithmetic, pool-kernel equivalence.

A >=2^31-symbol genome cannot be built in CI, so coverage is split:
  * full search equivalence against the oracle with big=True forced on a
    small genome (identical semantics, exercises every big code path)
  * a unit test that shifts checkpoint/less values beyond 2^32 and checks
    the packed 64-bit rank arithmetic reproduces the shifted results
    exactly (this is the part that actually differs at human-genome scale)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map.oracle import k_mismatch_search as oracle_search
from mapad_tpu.map.record import Record
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.fm import DeviceFmIndex, extend_batch
from mapad_tpu.ops.search_pool import PoolConfig

from test_device_search import _adna_params  # noqa: E402


@pytest.fixture(scope="module")
def small_fmd():
    rng = np.random.default_rng(77)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 60000))
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    return ref, fmd


def test_big_index_layout(small_fmd):
    _, fmd = small_fmd
    small = DeviceFmIndex.from_host(fmd, big=False)
    big = DeviceFmIndex.from_host(fmd, big=True)
    assert not small.big and big.big
    # both modes use exactly-128-int32 (512 B) fused rows; big mode trades
    # symbols per block for the extra 6 checkpoint-hi words
    assert big.rows.shape[1] == 128 and small.rows.shape[1] == 128
    assert big.occ_k == (128 - 12) * 8 and small.occ_k == (128 - 6) * 8
    assert big.less.dtype == jnp.int64
    # same extension results, wider dtype
    lower = jnp.asarray([0, 5, 100], jnp.int64)
    lrev = jnp.asarray([0, 5, 100], jnp.int64)
    size = jnp.asarray([big.text_len, 1000, 17], jnp.int64)
    bl, br, bs = extend_batch(big, lower, lrev, size)
    sl, sr, ss = extend_batch(
        small, lower.astype(jnp.int32), lrev.astype(jnp.int32),
        size.astype(jnp.int32),
    )
    assert bl.dtype == jnp.int64
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(sl))
    np.testing.assert_array_equal(np.asarray(br), np.asarray(sr))
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(ss))


def test_beyond_int32_rank_arithmetic(small_fmd):
    """Shift all absolute counts past 2^32: occ and less gain a constant
    offset, so child lower bounds shift by exactly OFF_OCC + OFF_LESS while
    sizes and reverse bounds are unchanged.  Exercises the lo/hi packed
    checkpoint decode with nonzero high words."""
    _, fmd = small_fmd
    OFF_OCC = (3 << 32) + 12345
    OFF_LESS = (5 << 32) + 999

    big = DeviceFmIndex.from_host(fmd, big=True)
    k = big.occ_k
    nb = big.rows.shape[0]
    rows = np.asarray(big.rows).copy()
    cp_lo = rows[:, 0:6].view(np.int32).astype(np.int64) & 0xFFFFFFFF
    cp_hi = rows[:, 6:12].astype(np.int64) << 32
    cp = cp_lo | cp_hi
    cp += OFF_OCC
    rows[:, 0:6] = (cp & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    rows[:, 6:12] = (cp >> 32).astype(np.int32)
    less = np.asarray(big.less) + OFF_LESS
    shifted = DeviceFmIndex(
        rows=jnp.asarray(rows), less=jnp.asarray(less),
        sentinels=big.sentinels, occ_k=big.occ_k,
        text_len=big.text_len, big=True,
    )

    lower = jnp.asarray([64, 130, 4096, 777], jnp.int64)
    lrev = jnp.asarray([1, 2, 3, 4], jnp.int64)
    size = jnp.asarray([100, 55, 1, 12], jnp.int64)
    bl, br, bs = extend_batch(big, lower, lrev, size)
    xl, xr, xs = extend_batch(shifted, lower, lrev, size)
    np.testing.assert_array_equal(
        np.asarray(xl), np.asarray(bl) + OFF_OCC + OFF_LESS
    )
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(br))
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(bs))
    assert int(np.asarray(xl).min()) > 2**32


def test_big_pool_engine_equals_oracle(small_fmd):
    ref, fmd = small_fmd
    params = _adna_params()
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for _ in range(40):
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

    cfg = PoolConfig(max_len=128, lanes=16, total_steps=16384,
                     read_step_cap=4096, max_chains=2048,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(fmd, params, mode="pool", pool_config=cfg,
                                big=True)
    assert engine.device_index.big
    results = engine.search_chunk(
        [Record(sequence=r, base_qualities=bytes([40] * len(r)))
         for r in reads]
    )
    for (hits, _), read in zip(results, reads):
        want = oracle_search(read, [40] * len(read), params, fmd)
        assert len(hits) == len(want), read[:16]
        for g, w in zip(hits, want):
            assert g.interval == w.interval, read[:16]
            assert np.float32(g.alignment_score) == np.float32(
                w.alignment_score
            ), read[:16]
            assert g.edit_operations == w.edit_operations, read[:16]


def test_big_mode_rejects_batch_engine(small_fmd):
    _, fmd = small_fmd
    with pytest.raises(ValueError, match="pool"):
        DeviceSearchEngine(fmd, _adna_params(), mode="batch", big=True)


def test_auto_big_threshold(small_fmd):
    _, fmd = small_fmd
    assert not DeviceFmIndex.from_host(fmd).big  # auto: small text
