"""Device search engine: batches reads onto the TPU and reconstructs hits.

Drop-in replacement for map.pipeline.OracleSearchEngine.  Per chunk:
1. host: pad reads to the lane grid, build f32-exact score LUTs / Bi-D
   penalty elements / bound thresholds (numpy, same op order as reference)
2. device: one jitted `k_mismatch_search_batch` call over all lanes
3. host: decode the device-walked hit op-word chains into edit tracks

Escalation tiers: reads whose lanes exhaust the step budget (or hit slots)
re-run with a larger-budget device config; anything still flagged falls back
to the exact host oracle.  Every tier produces oracle-identical hit sets for
its non-escalated lanes.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import numpy as np

from ..index.fmd import BiInterval
from ..map import EditOperation, HitInterval
from ..map.oracle import k_mismatch_search as oracle_search
from ..models.bounds import Continuous, TestBound
from ..utils.seq import BASE_TO_CODE, CODE_TO_BASE
from .fm import DeviceFmIndex
from .search_pool import PoolConfig
from .search_pool2 import k_mismatch_search_pool2
from .search import (
    OP_DELETION,
    OP_MISMATCH,
    SearchConfig,
    SearchParams,
    k_mismatch_search_batch,
)

logger = logging.getLogger(__name__)


def _pool_impl():
    """The production pool kernel (gen-2).  Kept as a function so the
    measurement tools under tools/ have one stable import point."""
    return k_mismatch_search_pool2

def _wire_opbits(MW):
    """Wire width for one c_ops word in the packed result transfer.

    A masked op word is base[0:2] | pos[2:17] | kind[17:19] | VALID[20]
    (ops/search.py pack_op) and pos < max_len < MW, so on the wire an op
    needs 2 + ceil(log2(MW)) + 2 + 1 bits.  Derived from the array shape
    alone so _pack_result (device) and _unpack_result (host) agree
    without a side channel.  Returns (opbits, ops_per_int64, pos_bits).
    """
    pb = max(1, (MW - 1).bit_length())
    opbits = pb + 5
    return opbits, 64 // opbits, pb


@functools.partial(jax.jit, static_argnames=("R", "M"))
def _unpack_prep(blob, R, M):
    """Split the one-transfer prep blob back into kernel inputs."""
    import jax.numpy as jnp

    def f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    n = blob[:R]
    split = blob[R : 2 * R]
    scale = f32(blob[2 * R : 3 * R])
    thresh = f32(blob[3 * R : 4 * R])
    repr_mm = f32(blob[4 * R : 5 * R])
    slut = f32(blob[5 * R :].reshape(R * M, 6))
    return n, split, scale, thresh, repr_mm, slut


# SAM quality ceiling ('~' - 33).  Blocks containing higher (malformed)
# base qualities take the legacy full-LUT upload path instead.
_DEV_LUT_Q = 94
_DEV_LUT_MEMO: dict = {}


def _build_all_lut(sdm, params, max_n: int, Q: int = _DEV_LUT_Q):
    """Flat score-LUT + gap-penalty tables over EVERY read length 1..max_n.

    Row `off[n] + (j*5 + cls)*Q + q` holds the 4 from-base scores (and the
    Bi-D penalty element) for position j of an n-long read whose base
    class is cls (A/C/G/T/other) at quality q -- the same pure-function
    cells `_LutCache._build` produces per length (elementwise raw_grid on
    the same scalar inputs, so identical f32 bits; asserted by
    tests/test_device_search.py), all lengths in one vectorized sweep.
    The last row is the all-zero padding row.  Returns
    (table (TOT+1, 4) f32, pen (TOT+1,) f32, off (max_n+1,) i32)."""
    lens = np.arange(1, max_n + 1, dtype=np.int64)
    jflat = np.concatenate([np.arange(nn, dtype=np.int64) for nn in lens])
    nflat = np.repeat(lens, lens)
    shape = (len(jflat), 5, Q)
    j = np.broadcast_to(jflat[:, None, None], shape)
    nl = np.broadcast_to(nflat[:, None, None], shape)
    to = np.broadcast_to(_CLS_REPR[None, :, None], shape)
    qual = np.broadcast_to(
        np.arange(Q, dtype=np.uint8)[None, None, :], shape
    )
    raw = sdm.raw_grid(j, nl, to, qual)  # (TOTJ, 5, Q, 4)
    is_acgt = np.isin(_CLS_REPR, _ACGT)[None, :, None]
    opt = np.where(is_acgt, raw.max(axis=3), np.float32(0.0)).astype(
        np.float32
    )
    score = np.float32(raw - opt[..., None]).reshape(-1, 4)
    table = np.vstack([score, np.zeros((1, 4), np.float32)])
    # mismatch-only minimum penalties (same op order as _batch_luts)
    eq = _CLS_REPR[None, :, None, None] == _ACGT[None, None, None, :]
    mm_raw = np.where(eq, _F32_MIN, raw).max(axis=3)
    mm_retval = np.float32(mm_raw - opt)
    gaps_allowed = (
        np.minimum(jflat, nflat - 1 - jflat) >= params.gap_dist_ends
    )[:, None, None]
    pen = np.where(
        gaps_allowed,
        np.maximum(mm_retval, params.penalty_gap_extend),
        mm_retval,
    ).astype(np.float32).reshape(-1)
    pen = np.concatenate([pen, np.zeros(1, np.float32)])
    base = np.zeros(max_n + 1, dtype=np.int64)
    base[1:] = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return table, pen, (base * (5 * Q)).astype(np.int32)


def _pack_cq10(seqs, quals):
    """Host side of the 10-bit (class, qual) wire cell: cls<<7|qual needs
    3+7 bits (cls <= 4, qual < _DEV_LUT_Q = 94 < 128), so three cells ride
    one int32 instead of the two a u16 layout allows -- the upload blob is
    the other transport-weather-sensitive payload (ROADMAP round 5)."""
    cq = (_CLS_TABLE[seqs].astype(np.int32) << 7) | quals
    cq = np.ascontiguousarray(cq).reshape(-1)
    RM = cq.size
    RM3 = -(-RM // 3) * 3
    if RM3 != RM:
        cq = np.concatenate([cq, np.zeros(RM3 - RM, np.int32)])
    return cq[0::3] | (cq[1::3] << 10) | (cq[2::3] << 20)


def _cq_words(RM):
    """int32 word count of the 10-bit cq segment for RM cells."""
    return -(-RM // 3)


# RLE segments per read (_BID_SEG - 1 u8 breaks padded to _BID_SEG bytes,
# plus _BID_SEG f32 values).  32 covers the worst measured case: run count
# grows as read_len / log4(genome) -- a 10 kb test genome with 100 bp reads
# peaks at 29 runs, while production genomes (>= Mbp) stay under ~12.
_BID_SEG = 32


def _inject_pre_escalate(stash, n, escalated, abandoned_out, nohit_out):
    """Route reads the prep stage neutralized on device (Bi-D RLE
    overflow, `_pack_bid_rle`) to the host fallback: they produced no
    device hits by construction, so they join the escalated set as
    no-hit abandons (never retried/deep-tiered -- the next prep would
    overflow again).  Returns the number of newly escalated reads."""
    pre = None if stash is None else stash.get("pre_escalate")
    if pre is None:
        return 0
    added = 0
    for i in pre:
        i = int(i)
        if i >= n:
            continue
        if i not in escalated:
            added += 1
        escalated.add(i)
        if abandoned_out is not None:
            abandoned_out.add(i)
        if nohit_out is not None:
            nohit_out.add(i)
    return added


def _pack_bid_rle(bid):
    """Run-length encode the Bi-D composite for the upload blob.

    Each read's d_composite is a step function over positions with few
    value changes (increments at extension-failure points, min-reduced
    over 15 offset walks, map/bi_d_array.py) -- typically < 12 runs per
    75 bp read at production genome sizes.  Wire layout per read:
    _BID_SEG - 1 u8 break positions (sentinel 255 = unused; positions
    < max_len <= 128 fit u8) packed 4/int32, then _BID_SEG f32 segment
    values; cell j reconstructs as vals[count(breaks <= j)].  Cuts the
    bid segment from M to _BID_SEG * 1.25 words per read.  Reads with
    more runs than segments cannot be represented: their break table is
    truncated, so the caller MUST route them to the host fallback
    (returned as the third element) and neutralize them on device.

    Returns (breaks (L * _BID_SEG/4,) i32, vals (L * _BID_SEG,) i32
    bit-view, overflow_row_indices)."""
    bid = np.ascontiguousarray(bid, dtype=np.float32)
    L, M = bid.shape
    change = bid[:, 1:] != bid[:, :-1]
    nseg = 1 + change.sum(axis=1)
    overflow = np.flatnonzero(nseg > _BID_SEG)
    rows, cols = np.nonzero(change)
    # rank of each change within its row (rows ascending from nonzero)
    k = np.arange(rows.size) - np.searchsorted(rows, rows)
    keep = k < _BID_SEG - 1
    r, kk, c = rows[keep], k[keep], cols[keep] + 1
    breaks = np.full((L, _BID_SEG), 255, dtype=np.uint8)
    vals = np.zeros((L, _BID_SEG), dtype=np.float32)
    vals[:, 0] = bid[:, 0]
    breaks[r, kk] = c.astype(np.uint8)
    vals[r, kk + 1] = bid[r, c]
    return (
        breaks.reshape(-1).view(np.int32),
        vals.reshape(-1).view(np.int32),
        overflow,
    )


def _unpack_cq10(w, RM):
    """Device side of `_pack_cq10`: (ceil(RM/3),) i32 -> (RM,) cq cells."""
    import jax.numpy as jnp

    cq = jnp.stack(
        [w & 0x3FF, (w >> 10) & 0x3FF, (w >> 20) & 0x3FF], axis=1
    ).reshape(-1)
    return cq[:RM]


@functools.partial(jax.jit, static_argnames=("R", "M", "Q", "rle"))
def _unpack_prep_lut(blob, tab, off, R, M, Q, rle=False):
    """Small-blob variant of `_unpack_prep`: the 4 score columns and the
    pattern code are reconstructed ON DEVICE -- scores gathered from the
    one-time `_build_all_lut` table, code == base class -- so the
    per-invocation upload carries only consts + Bi-D + packed
    (class, qual) cells.  With rle the Bi-D travels as a 16-segment
    run-length code (`_pack_bid_rle`, 20 words/read instead of M).  The
    axon tunnel's host<->device bandwidth is the volatile resource (it
    swings ~20x, ROADMAP round 4); a small blob keeps e2e throughput
    stable through the bad-weather windows."""
    import jax.numpy as jnp

    def f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    n = blob[:R]
    split = blob[R : 2 * R]
    scale = f32(blob[2 * R : 3 * R])
    thresh = f32(blob[3 * R : 4 * R])
    repr_mm = f32(blob[4 * R : 5 * R])
    RM = R * M
    if rle:
        BW = _BID_SEG // 4
        w4 = blob[5 * R : (5 + BW) * R].reshape(R, BW)
        b = jnp.stack(
            [w4 & 0xFF, (w4 >> 8) & 0xFF, (w4 >> 16) & 0xFF,
             (w4 >> 24) & 0xFF],
            axis=2,
        ).reshape(R, _BID_SEG)[:, : _BID_SEG - 1]
        vals = f32(
            blob[(5 + BW) * R : (5 + BW + _BID_SEG) * R]
        ).reshape(R, _BID_SEG)
        j = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
        seg = jnp.sum(
            j[:, :, None] >= b[:, None, :], axis=2, dtype=jnp.int32
        )
        bid = jnp.take_along_axis(vals, seg, axis=1).reshape(RM)
        cqseg = blob[(5 + BW + _BID_SEG) * R :]
    else:
        bid = f32(blob[5 * R : 5 * R + RM])
        cqseg = blob[5 * R + RM :]
    cq = _unpack_cq10(cqseg, RM)
    cls = cq >> 7
    q = cq & 0x7F
    j = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1).reshape(RM)
    n_rows = jnp.repeat(n, M)
    # padding cells (j >= read length) read the table's zero row, matching
    # the host builder's masked-to-zero padding
    idx = jnp.where(
        j < n_rows,
        off[n_rows] + (j * 5 + cls) * Q + q,
        tab.shape[0] - 1,
    )
    score4 = tab[idx]
    slut = jnp.concatenate(
        [score4, cls.astype(jnp.float32)[:, None], bid[:, None]], axis=1
    )
    return n, split, scale, thresh, repr_mm, slut


@functools.partial(jax.jit, static_argnames=("R", "M", "Q"))
def _unpack_prep_full(blob, tab, pen_tab, off, R, M, Q):
    """Device-Bi-D variant of `_unpack_prep_lut` for the big-genome path:
    reconstructs the kernel's dense pattern_rank / pattern_code /
    score_lut / pen inputs on device from consts + packed (class, qual)
    u16s.  Cuts the per-invocation upload from 7 arrays (~7 words/cell +
    a ~34 ms tunnel round trip each) to ONE blob of 0.5 words/cell."""
    import jax.numpy as jnp

    def f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    n = blob[:R]
    split = blob[R : 2 * R]
    scale = f32(blob[2 * R : 3 * R])
    thresh = f32(blob[3 * R : 4 * R])
    repr_mm = f32(blob[4 * R : 5 * R])
    RM = R * M
    cq = _unpack_cq10(blob[5 * R :], RM)
    cls = cq >> 7
    q = cq & 0x7F
    j = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1).reshape(RM)
    n_rows = jnp.repeat(n, M)
    idx = jnp.where(
        j < n_rows,
        off[n_rows] + (j * 5 + cls) * Q + q,
        tab.shape[0] - 1,
    )
    score_lut = tab[idx].reshape(R, M, 4)
    pen = pen_tab[idx].reshape(R, M)
    code = cls.reshape(R, M)
    rank = jnp.where(cls < 4, cls + 1, 0).reshape(R, M)
    return rank, code, n, score_lut, pen, split, scale, thresh, repr_mm


_RANK_TABLE = np.zeros(256, dtype=np.int32)
for _i, _c in enumerate(b"ACGT"):
    _RANK_TABLE[_c] = _i + 1

# read-base equivalence classes for the score LUT: the per-cell score is a
# pure function of (position, read_len, to-class, qual) where to-class is
# A/C/G/T/other (raw_grid compares the exact byte against ACGT; every
# non-ACGT byte yields the same independent-error column)
_CLS_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _CLS_TABLE[_c] = _i
_CLS_REPR = np.frombuffer(b"ACGTN", dtype=np.uint8)

DEFAULT_TIERS = ((2048, None),)


class _Empty:
    sequence = b""
    base_qualities = b""


_EMPTY = _Empty()

_F32_MIN = np.float32(-3.4028235e38)
_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _batch_luts(sdm, params, seqs, quals, n, threads: int = 0):
    """Vectorized score LUT + Bi-D penalty elements for a whole lane grid.

    Same f32 op order as the per-read builders (models/adna.py); computed on
    (L, M) grids in one sweep so host preparation is not per-read-bound.
    Rows are independent, so big grids split across a small thread pool
    (numpy releases the GIL in the grid kernels)."""
    L, M = seqs.shape
    if not threads:
        import os

        threads = max(1, (os.cpu_count() or 2) - 1)
    if threads > 1 and L >= 2048:
        from concurrent.futures import ThreadPoolExecutor

        blocks = [
            (i, min(i + -(-L // threads), L))
            for i in range(0, L, -(-L // threads))
        ]
        with ThreadPoolExecutor(max_workers=threads) as pool:
            parts = list(
                pool.map(
                    lambda b: _batch_luts(
                        sdm, params, seqs[b[0]:b[1]], quals[b[0]:b[1]],
                        n[b[0]:b[1]], threads=1,
                    ),
                    blocks,
                )
            )
        return (
            np.concatenate([p[0] for p in parts], axis=0),
            np.concatenate([p[1] for p in parts], axis=0),
        )
    j = np.broadcast_to(np.arange(M, dtype=np.int64), (L, M))
    n_grid = np.broadcast_to(n[:, None].astype(np.int64), (L, M))
    valid = j < n_grid
    n_safe = np.maximum(n_grid, j + 1)  # keep tp_dist >= 0 on padding

    raw = sdm.raw_grid(j, n_safe, seqs, quals)  # (L, M, 4)

    is_acgt = np.isin(seqs, _ACGT)
    opt = np.where(is_acgt, raw.max(axis=2), np.float32(0.0)).astype(np.float32)
    score_lut = np.float32(raw - opt[:, :, None])

    # mismatch-only minimum penalties (from != to)
    eq = seqs[:, :, None] == _ACGT[None, None, :]
    mm_raw = np.where(eq, _F32_MIN, raw).max(axis=2)
    mm_retval = np.float32(mm_raw - opt)
    gaps_allowed = np.minimum(j, n_grid - j - 1) >= params.gap_dist_ends
    pen = np.where(
        gaps_allowed,
        np.maximum(mm_retval, params.penalty_gap_extend),
        mm_retval,
    ).astype(np.float32)

    score_lut = np.where(valid[:, :, None], score_lut, np.float32(0.0))
    pen = np.where(valid, pen, np.float32(0.0)).astype(np.float32)
    return score_lut.astype(np.float32), pen


class _LutCache:
    """Per-read-length score-LUT / penalty tables.

    The (score_lut, pen) cell values from `_batch_luts` are pure functions
    of (position j, read_len n, read-base class, qual): all f32 math in
    raw_grid is elementwise, the from-base max runs over the same 4
    candidates, and gaps_allowed depends only on (j, n).  Caching one
    (n, 5, Q, 4) table per distinct read length turns the per-block LUT
    build into a gather -- bit-identical to recomputing (same op order on
    the same scalar inputs), asserted by tests/test_device_search.py.
    """

    def __init__(self, sdm, params):
        self.sdm = sdm
        self.params = params
        self.tables: dict[int, tuple] = {}

    @staticmethod
    def usable(sdm) -> bool:
        from ..models.adna import SequenceDifferenceModel

        # the generic raw_grid falls back to scalar get() per cell -- a
        # (n, 5, Q) table build would be slower than the direct grid
        return type(sdm).raw_grid is not SequenceDifferenceModel.raw_grid

    def _build(self, n: int, qmax: int):
        Q = max(qmax + 1, 46)
        j = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None, None], (n, 5, Q))
        to = np.broadcast_to(_CLS_REPR[None, :, None], (n, 5, Q))
        qual = np.broadcast_to(
            np.arange(Q, dtype=np.uint8)[None, None, :], (n, 5, Q)
        )
        raw = self.sdm.raw_grid(j, np.int64(n), to, qual)  # (n, 5, Q, 4)
        is_acgt = np.isin(_CLS_REPR, _ACGT)[None, :, None]
        opt = np.where(is_acgt, raw.max(axis=3), np.float32(0.0)).astype(
            np.float32
        )
        score = np.float32(raw - opt[..., None])
        eq = _CLS_REPR[None, :, None, None] == _ACGT[None, None, None, :]
        mm_raw = np.where(eq, _F32_MIN, raw).max(axis=3)
        mm_retval = np.float32(mm_raw - opt)
        jj = np.arange(n, dtype=np.int64)
        gaps_allowed = (
            np.minimum(jj, n - 1 - jj) >= self.params.gap_dist_ends
        )[:, None, None]
        pen = np.where(
            gaps_allowed,
            np.maximum(mm_retval, self.params.penalty_gap_extend),
            mm_retval,
        ).astype(np.float32)
        return Q, np.ascontiguousarray(score), np.ascontiguousarray(pen)

    def fill(self, seqs, quals, n_arr, score_out, pen_out):
        """Gather (score_lut, pen) rows for a padded (L, M) read grid into
        the given output arrays (rows beyond each read's length stay 0)."""
        for ln in np.unique(n_arr):
            ln = int(ln)
            if ln == 0:
                continue
            rows = np.flatnonzero(n_arr == ln)
            q = quals[rows][:, :ln]
            ent = self.tables.get(ln)
            if ent is None or ent[0] <= int(q.max(initial=0)):
                ent = self.tables[ln] = self._build(ln, int(q.max(initial=0)))
            _Q, t_score, t_pen = ent
            cls = _CLS_TABLE[seqs[rows][:, :ln]]
            j = np.arange(ln)[None, :]
            score_out[rows[:, None], j] = t_score[j, cls, q]
            pen_out[rows[:, None], j] = t_pen[j, cls, q]


class DeviceSearchEngine:
    def __init__(self, fmd_index, parameters, lanes: int = 2048,
                 config: SearchConfig | None = None,
                 tiers: tuple = DEFAULT_TIERS, mode: str = "pool",
                 pool_config: "PoolConfig | None" = None,
                 big: bool | None = None, packed_hits: bool = False,
                 threads: int | None = None):
        import jax.numpy as jnp

        self.fmd = fmd_index
        self.parameters = parameters
        self.lanes = lanes
        self.mode = mode
        # --threads parity (reference sizes its whole rayon pool,
        # main.rs:57-302): when given, bounds the exact-fallback worker
        # pool; MAPAD_FB_THREADS still overrides either way
        self.threads = threads
        # packed_hits: return hits as PackedHits (flat op-word arrays for
        # the native postprocess path) instead of decoded HitInterval lists
        self.packed_hits = packed_hits
        self.device_index = DeviceFmIndex.from_host(fmd_index, big=big)
        if self.device_index.big and mode != "pool":
            raise ValueError(
                "int64 (big-genome) device mode is implemented for the "
                "pool kernel only; use mode='pool'"
            )
        sdm = parameters.difference_model
        self._is_backward_only = sdm.find_alignment_start(100) == 100
        if config is None:
            config = SearchConfig(compute_forward_part=not self._is_backward_only)
        self.config = config
        if pool_config is None:
            import os as _os

            # L=512 is empirically optimal on the v5e bench; wider pools
            # slow down superlinearly (HBM-bound step ops), narrower ones
            # underutilize (see ROADMAP "lane scaling")
            pool_lanes = max(8, min(lanes, 512))
            # keep lanes*steps (and so the frame store) constant: the store
            # is the HBM budget (L * S rows of 512 B) and the engine keeps
            # up to two invocations in flight alongside the occ rows.  8192
            # steps is ~1.4x the measured budget for a 4096-read chunk.
            pool_steps = max(2048, (512 * 8192) // pool_lanes)
            if _os.environ.get("MAPAD_POOL_STEPS"):
                pool_steps = int(_os.environ["MAPAD_POOL_STEPS"])
            cap_env = int(_os.environ.get("MAPAD_POOL_CAP", 0))
            pool_config = PoolConfig(
                max_len=config.max_len,
                lanes=pool_lanes,
                total_steps=pool_steps,
                # 8192-read invocations: hard workloads log ~1.1 chains
                # per read plus abandon markers; 8192 overflowed (-> full
                # chunk escalation), 2 per read leaves headroom
                max_chains=16384,
                # A read kept on device to CAP pops costs CAP/L whole-pool
                # steps (~100 us/1024 pops at 48 us/step) vs ~2-5 ms in the
                # host fallback, so the cap is set high and abandons are
                # reserved for the truly pathological tail (e2e bench:
                # 12% escalations at CAP=1024 made the 4-core host the
                # bottleneck while the chip sat idle)
                # CAP=8192 regressed e2e 3.3k -> 2.1k: the dense pop scans
                # are O(L*CAP) per step and dominate past ~4096.  3072
                # beat 4096 at BOTH scales (same-window chip sweeps,
                # round 5): 10,080 vs 9,710 reads/s at 4 Mbp and 1,851
                # vs 1,740 at hg19 -- the cheaper per-step scan wins more
                # than the extra abandons cost, earlier monster abandons
                # free lanes for pool reads, and at hg19 the cap converts
                # budget-starved "unfinished" escalatees (8.3k -> 4.0k)
                # into abandons that reach the host sooner.
                read_step_cap=min(cap_env or 3072, pool_steps),
                compute_forward_part=config.compute_forward_part,
                backward_only=self._is_backward_only,
                # in-kernel store generations: unfinished/undispatched
                # reads RESUME with their frontier intact after an
                # in-place store compaction (~10 ms) instead of
                # escalating to a fresh retry invocation or the host
                # fallback (ops/search_pool.py PoolConfig.generations)
                # default 1 until the capped-spill sweep lands on chip:
                # uncapped spill measured 5.2k vs 8.8k reads/s at 4 Mbp
                # (ROADMAP round 5); the deep tier keeps its own
                # generations either way
                generations=int(_os.environ.get("MAPAD_KGENS", "1")),
                # below this many live lanes another spill generation
                # costs more device time than the host fallback pool
                # clearing the stragglers (a step is L-wide whatever the
                # occupancy)
                min_live=int(_os.environ.get("MAPAD_KGENS_MIN_LIVE", "32")),
                # capped spill: clear the budget-starved tail without
                # letting cap-bound monsters burn whole-pool steps
                # (uncapped spill measured 5.2k vs 8.8k reads/s at 4 Mbp,
                # ROADMAP round 5)
                spill_steps=int(_os.environ.get("MAPAD_SPILL", "768")),
            )
        elif pool_config.backward_only and not self._is_backward_only:
            pool_config = pool_config._replace(backward_only=False)
        if (pool_config.generations > 1
                and pool_config.read_step_cap + 4 > pool_config.total_steps):
            # compaction frees delta >= S - cap - 2 steps per boundary;
            # without margin a boundary could free nothing
            pool_config = pool_config._replace(generations=1)
        self.pool_config = pool_config
        self.tiers = tiers
        self._stats = {"device_lanes": 0, "escalated": 0, "oracle": 0,
                       "batches": 0, "fb_secs": 0.0}
        self._params_cache = None
        # single-process multi-chip: when more than one device is visible
        # the pool path shards reads over a data mesh (shard_map, index
        # replicated, per-shard persistent loops -- parallel/pool_sharded)
        # so one `cli map` saturates the host's chips like the reference's
        # rayon loop saturates a node (mapping.rs:146-296).  The
        # escalation/retry/deep tiers run unchanged on the merged result.
        self.mesh = None
        self._mesh_index = None
        self.n_shards = 1
        import os as _os

        shard_env = _os.environ.get("MAPAD_SHARD")
        # default ON for real accelerators; the 8-device VIRTUAL cpu mesh
        # (tests, dryrun) gives no speedup, so there it is opt-in
        # (MAPAD_SHARD=1) to keep single-device test traces small
        want_shard = shard_env == "1" or (
            shard_env is None and jax.default_backend() != "cpu"
        )
        if mode == "pool" and want_shard:
            try:
                n_dev = len(jax.devices())
            except Exception:  # pragma: no cover - backend init failure
                n_dev = 1
            if n_dev > 1:
                from ..parallel.sharding import make_mesh, replicate

                self.n_shards = n_dev
                self.mesh = make_mesh(n_dev)
                self._mesh_index = replicate(self.mesh, self.device_index)

    # --- host-side per-read preparation (exact f32 paths) ---

    def _prepare(self, records, max_len: int, lanes: int | None = None,
                 host_bid: bool = False, dev_full: bool = False):
        """host_bid: compute the Bi-D arrays on host C++ cores and return a
        prepacked score-LUT/Bi-D table ("slut_packed", the gen-2 kernel's
        512 B-row layout) instead of uploading the per-read LUT arrays --
        skips the ~150 ms on-device Bi-D prologue per invocation and
        overlaps Bi-D with device search via the 2-in-flight pipeline."""
        import jax.numpy as jnp

        L = lanes if lanes is not None else self.lanes
        sdm = self.parameters.difference_model
        mb = self.parameters.mismatch_bound

        seqs = np.zeros((L, max_len), dtype=np.uint8)
        quals = np.zeros((L, max_len), dtype=np.uint8)
        n = np.zeros(L, dtype=np.int32)
        split = np.zeros(L, dtype=np.int32)
        cutoff_scale = np.ones(L, dtype=np.float32)
        cutoff_thresh = np.full(L, np.float32(-np.inf), dtype=np.float32)
        repr_mm = np.full(L, np.float32(-np.inf), dtype=np.float32)

        # per-length parameter cache: the chunk has ~100 distinct read
        # lengths but thousands of records; the model/bound lookups are
        # pure functions of the length
        by_len: dict[int, tuple] = getattr(self, "_len_params", None)
        if by_len is None:
            by_len = self._len_params = {}

        def len_params(ln):
            v = by_len.get(ln)
            if v is None:
                s = sdm.find_alignment_start(ln)
                # bound encoding: reject(v) == (v / scale) < thresh
                if isinstance(mb, Continuous):
                    sc, th = mb._scale_read_length(ln), mb.cutoff
                else:  # Discrete / TestBound: absolute threshold
                    sc, th = np.float32(1.0), mb.threshold_for_length(ln)
                rm = (
                    np.float32(-np.inf) if isinstance(mb, TestBound)
                    else mb.representative_mismatch_penalty
                )
                v = by_len[ln] = (s, sc, th, rm)
            return v

        for i, record in enumerate(records):
            seq = np.frombuffer(bytes(record.sequence), dtype=np.uint8)
            ln = len(seq)
            n[i] = ln
            if ln == 0:
                continue
            seqs[i, :ln] = seq
            quals[i, :ln] = np.frombuffer(
                bytes(record.base_qualities), dtype=np.uint8
            )
            split[i], cutoff_scale[i], cutoff_thresh[i], repr_mm[i] = (
                len_params(ln)
            )

        t_lut = time.perf_counter()
        pattern_rank = np.where(n[:, None] > 0, _RANK_TABLE[seqs], 0)
        pattern_rank[seqs == 0] = 0
        pattern_code = BASE_TO_CODE[seqs].astype(np.int32)
        # LUT math only over real rows; padding rows are all-zero anyway
        n_real = min(len(records), L)
        pen = np.zeros((L, max_len), dtype=np.float32)
        import os as _os

        # device-LUT mode: ship only consts + Bi-D + (class, qual) u16s and
        # gather the score columns on device from the one-time
        # _build_all_lut table -- 4x less tunnel traffic per invocation
        dev_ok = (
            self._lut_cache() is not None
            and _os.environ.get("MAPAD_DEV_LUT", "1") != "0"
            and max_len % 2 == 0
            and max_len <= self.config.max_len
            and int(quals.max(initial=0)) < _DEV_LUT_Q
        )
        dev_lut = host_bid and dev_ok
        # Bi-D as a 16-segment RLE (20 words/read vs M): reads whose
        # composite has more runs than the code can carry are neutralized
        # on device (thresh = +inf, like padding lanes) and routed to the
        # host fallback at collect time (stash["pre_escalate"])
        bid_rle = dev_lut and _os.environ.get("MAPAD_BID_RLE", "1") != "0"
        RM = L * max_len
        bid_words = (_BID_SEG // 4 + _BID_SEG) * L if bid_rle else RM
        if host_bid and not dev_lut:
            # allocate the one-transfer upload blob up front and fill the
            # score columns in place (saves a 16 MB array + 16 MB copy per
            # block vs building score_lut separately and packing it)
            blob = np.zeros(5 * L + RM * 6, dtype=np.int32)
            packed3 = blob[5 * L :].view(np.float32).reshape(L, max_len, 6)
            score_lut = packed3[:, :, :4]
        elif host_bid:
            blob = np.zeros(5 * L + bid_words + _cq_words(RM),
                            dtype=np.int32)
            packed3 = None
            score_lut = np.zeros((L, max_len, 4), dtype=np.float32)
        else:
            blob = packed3 = None
            score_lut = np.zeros((L, max_len, 4), dtype=np.float32)
        if n_real:
            cache = self._lut_cache()
            if cache is not None:
                cache.fill(
                    seqs[:n_real], quals[:n_real], n[:n_real],
                    score_lut[:n_real], pen[:n_real],
                )
            else:
                sl, pe = _batch_luts(
                    sdm, self.parameters, seqs[:n_real], quals[:n_real],
                    n[:n_real],
                )
                score_lut[:n_real] = sl
                pen[:n_real] = pe
        t_lut = time.perf_counter() - t_lut

        # host-side views kept for escalated-read fallback: the native
        # searcher takes the SAME per-read LUT/penalty rows, so the
        # fallback path must not rebuild them (it used to re-run the
        # whole per-read LUT pipeline per escalated read)
        stash = dict(
            pattern_rank=pattern_rank, pattern_code=pattern_code, n=n,
            score_lut=score_lut, pen=pen, split=split,
            scale=cutoff_scale, thresh=cutoff_thresh, repr_mm=repr_mm,
            max_len=max_len,
        )
        if host_bid:
            import os

            # Bi-D (threaded C++, GIL-released) overlaps the 33 MB blob
            # packing below instead of serializing ahead of it
            t_bid = time.perf_counter()
            bid_fut = self._bid_exec().submit(
                self._native_bid().compute,
                pattern_rank.astype(np.uint8), pen, n, split,
                max(1, (os.cpu_count() or 2) - 2),
            )
            t_blob = time.perf_counter()
            # padded/empty reads must reject everything immediately (the
            # non-packed path applies this in _dispatch_pool)
            thresh = cutoff_thresh.copy()
            thresh[n == 0] = np.float32(np.inf)
            # ONE host->device transfer (the axon transport charges ~34 ms
            # per round trip) then an on-device unpack; the packed LUT rows
            # were written straight into the blob by the fill above
            blob[:L] = n.view(np.int32)
            blob[L : 2 * L] = split.view(np.int32)
            blob[2 * L : 3 * L] = cutoff_scale.view(np.int32)
            blob[3 * L : 4 * L] = thresh.view(np.int32)
            blob[4 * L : 5 * L] = repr_mm.view(np.int32)
            if dev_lut:
                blob[5 * L + bid_words :] = _pack_cq10(seqs, quals)
            else:
                packed3[:, :, 4] = pattern_code
            bid = bid_fut.result()
            if dev_lut and bid_rle:
                br, vv, ovf = _pack_bid_rle(bid)
                bw = _BID_SEG // 4
                blob[5 * L : (5 + bw) * L] = br
                blob[(5 + bw) * L : (5 + bw) * L + _BID_SEG * L] = vv
                if ovf.size:
                    # unrepresentable reads finish instantly with no hits
                    # (same mechanism as n == 0 padding) and escalate
                    blob[3 * L + ovf] = (
                        np.float32(np.inf).view(np.int32)
                    )
                    stash["pre_escalate"] = ovf
            elif dev_lut:
                blob[5 * L : 5 * L + RM] = (
                    np.ascontiguousarray(bid, dtype=np.float32)
                    .reshape(-1).view(np.int32)
                )
            else:
                packed3[:, :, 5] = bid
            stash["bid"] = bid  # cost-model input for balanced sharding
            t_bid = time.perf_counter() - t_bid
            t_blob = time.perf_counter() - t_blob
            t_up = time.perf_counter()
            if dev_lut:
                tab, _pen_tab, off = self._device_lut()
                parts = _unpack_prep_lut(
                    jnp.asarray(blob), tab, off, L, max_len, _DEV_LUT_Q,
                    rle=bid_rle,
                )
            else:
                parts = _unpack_prep(jnp.asarray(blob), L, max_len)
            logger.debug(
                "prep split: lut %.0fms bid %.0fms blob %.0fms upload %.0fms",
                t_lut * 1e3, t_bid * 1e3, t_blob * 1e3,
                (time.perf_counter() - t_up) * 1e3,
            )
            empty2 = jnp.zeros((L, 0), jnp.int32)
            return dict(
                pattern_rank=empty2,
                pattern_code=empty2,
                n=parts[0],
                score_lut=jnp.zeros((L, 0, 4), jnp.float32),
                pen=jnp.zeros((L, 0), jnp.float32),
                split=parts[1],
                cutoff_scale=parts[2],
                cutoff_thresh=parts[3],
                repr_mm=parts[4],
                slut_packed=parts[5],
                _stash=stash,
            )
        if dev_full and dev_ok:
            # device-Bi-D (big-genome) small-blob path: ship consts +
            # packed (class, qual) u16s only; the kernel's dense inputs
            # are reconstructed on device (_unpack_prep_full)
            thresh = cutoff_thresh.copy()
            thresh[n == 0] = np.float32(np.inf)
            blob = np.zeros(5 * L + _cq_words(RM), dtype=np.int32)
            blob[:L] = n.view(np.int32)
            blob[L : 2 * L] = split.view(np.int32)
            blob[2 * L : 3 * L] = cutoff_scale.view(np.int32)
            blob[3 * L : 4 * L] = thresh.view(np.int32)
            blob[4 * L : 5 * L] = repr_mm.view(np.int32)
            blob[5 * L :] = _pack_cq10(seqs, quals)
            tab, pen_tab, off = self._device_lut()
            parts = _unpack_prep_full(
                jnp.asarray(blob), tab, pen_tab, off, L, max_len,
                _DEV_LUT_Q,
            )
            return dict(
                _stash=stash, dev_prep=True,
                pattern_rank=parts[0], pattern_code=parts[1],
                n=parts[2], score_lut=parts[3], pen=parts[4],
                split=parts[5], cutoff_scale=parts[6],
                cutoff_thresh=parts[7], repr_mm=parts[8],
            )
        return dict(
            _stash=stash,
            pattern_rank=jnp.asarray(pattern_rank),
            pattern_code=jnp.asarray(pattern_code),
            n=jnp.asarray(n),
            score_lut=jnp.asarray(score_lut),
            pen=jnp.asarray(pen),
            split=jnp.asarray(split),
            cutoff_scale=jnp.asarray(cutoff_scale),
            cutoff_thresh=jnp.asarray(cutoff_thresh),
            repr_mm=jnp.asarray(repr_mm),
        )

    def _params(self) -> SearchParams:
        import jax.numpy as jnp

        if self._params_cache is None:
            p = self.parameters
            self._params_cache = SearchParams(
                pgo_pge=jnp.float32(
                    np.float32(p.penalty_gap_open + p.penalty_gap_extend)
                ),
                pge=jnp.float32(p.penalty_gap_extend),
                gap_dist_ends=jnp.int32(p.gap_dist_ends),
                max_gaps=jnp.int32(p.max_num_gaps_open),
                stack_limit_abort=jnp.bool_(p.stack_limit_abort),
            )
        return self._params_cache

    # --- hit reconstruction from device-walked op chains ---

    def _extract_hits(self, result, lane: int, split: int):
        if self.packed_hits:
            return self._packed_lane_hits(result, lane, split)
        hcount = int(result.hcount[lane])
        hits = []
        for h in range(hcount):
            words = result.h_ops[lane, h]
            buckets: dict[int, list] = {}
            for w in words:
                w = int(w)
                if w == 0:
                    break
                kind = (w >> 17) & 7
                pos = (w >> 2) & 0x7FFF
                base = (
                    int(CODE_TO_BASE[w & 3])
                    if kind in (OP_MISMATCH, OP_DELETION)
                    else 0
                )
                buckets.setdefault(pos, []).append(EditOperation(kind, pos, base))
            track = []
            for pos in sorted(buckets):
                ops = buckets[pos]
                if pos < split:
                    track.extend(ops)
                else:
                    track.extend(reversed(ops))
            hits.append(
                HitInterval(
                    BiInterval(
                        int(result.h_lower[lane, h]),
                        int(result.h_lrev[lane, h]),
                        int(result.h_size[lane, h]),
                    ),
                    np.float32(result.h_score[lane, h]),
                    track,
                )
            )
        return hits

    # --- public API ---

    def search_chunk(self, records, lazy_fallback: bool = False):
        """lazy_fallback: escalated entries come back as
        concurrent.futures.Future objects still running on the engine's
        fallback pool, so the (expensive, deep-read) exact host searches
        overlap the caller's next chunk instead of gating this one; the
        pipeline resolves them in its postprocess thread."""
        if self.mode == "pool":
            return self._search_chunk_pool(records, lazy_fallback)
        return self._search_chunk_batch(records)

    def _fallback_pool(self):
        import os
        from concurrent.futures import ThreadPoolExecutor

        n = int(os.environ.get("MAPAD_FB_THREADS", "0")) or (
            getattr(self, "threads", None)
            or max(1, (os.cpu_count() or 2) - 1)
        )
        if getattr(self, "_fb_pool", None) is None or (
            getattr(self, "_fb_threads", 0) != n
        ):
            self._fb_threads = n
            self._fb_pool = ThreadPoolExecutor(max_workers=n)
        return self._fb_pool

    # --- persistent-pool path ---

    @property
    def block_reads(self) -> int:
        """Device invocation size: 8192-read invocations amortize the
        ~74 ms fixed overhead (20.8k vs 15.8k reads/s at 4096 on chip,
        tools/sweep_lanes.py).  Big (int64) mode halves this: genome-scale
        texts need ~1.5 steps/read (vs ~0.7 at 4 Mbp), so 8192 reads
        starve the S=8192 step budget and escalate >50% of the block to
        the host (hg19 e2e measured 269 reads/s that way); 4096-read
        invocations give each read twice the budget.  Assignable (tests,
        tuning)."""
        import os

        override = getattr(self, "_block_reads", None) or int(
            os.environ.get("MAPAD_BLOCK_READS", 0)
        )
        D = self.n_shards
        if override:
            r = max(self.pool_config.lanes * D, override)
        else:
            # per-shard invocation size scales with the mesh: each shard
            # runs its own persistent loop over R/D reads
            r = max(self.pool_config.lanes,
                    4096 if self.device_index.big else 8192) * D
        return -(-r // D) * D  # shard_map needs R divisible by the mesh

    @block_reads.setter
    def block_reads(self, value: int):
        self._block_reads = value

    def _search_chunk_pool(self, records, lazy_fallback: bool = False):
        from concurrent.futures import Future

        R = self.block_reads
        out = [None] * len(records)
        blocks = (
            (base, records[base : base + R])
            for base in range(0, len(records), R)
        )
        # always stream lazily so the retry tier can resolve escalated
        # reads in later device invocations; once the stream is exhausted
        # every future is resolved or running on the fallback pool
        for base, block_out in self.search_stream(
            blocks, lazy_fallback=True
        ):
            out[base : base + len(block_out)] = block_out
        if not lazy_fallback:
            out = [o.result() if isinstance(o, Future) else o for o in out]
        return out

    def search_stream(self, blocks, lazy_fallback: bool = False,
                      max_in_flight: int = 2):
        """Pipelined block search: yields (key, results) per input block in
        submission order.

        `blocks` is an iterable of (key, records) with len(records) <=
        block_reads.  A dedicated prep thread builds the next block's LUT
        grids / Bi-D / upload blob while up to `max_in_flight` pool
        invocations run on the device (each holds a multi-GB frame store,
        hence the cap); the result pack + host transfer of invocation k is
        enqueued at launch time so it lands on the device queue BEFORE
        kernel k+1 and the D2H copy overlaps k+1's compute.  Escalated
        entries come back as concurrent.futures.Future objects when
        lazy_fallback (resolved on the engine's fallback pool).

        Escalated reads first re-run as device RETRY blocks (same compiled
        shapes, so no recompile): a read that merely exhausted the shared
        L*S step budget in a full block gets ~R/|retry| times more budget
        in a batch of escalatees, which is orders of magnitude cheaper
        than the exact host fallback (~ms/read; at genome scale ~24
        ms/read).  Only reads still escalating after `retry_gens`
        device passes -- or too few to fill a worthwhile invocation --
        take the host fallback.  Retry needs lazy_fallback (results
        resolve when the retry invocation lands).

        This is the TPU-side analogue of the reference's always-busy rayon
        loop (mapping.rs:146-296): every host core works on prep/collect/
        fallback for neighbouring blocks while the chip runs the current
        one.
        """
        import os
        from collections import deque
        from concurrent.futures import Future, ThreadPoolExecutor

        cfg = self.pool_config
        R = self.block_reads
        params = self._params()
        self._ensure_native()
        fb_pool = self._fallback_pool()
        # MAPAD_INFLIGHT: device invocations in flight (each holds a
        # multi-GB frame store); MAPAD_PREP_THREADS: concurrent block
        # preps (the LUT/Bi-D/blob stage can become the pipeline limit
        # when the host is otherwise idle)
        max_in_flight = int(
            os.environ.get("MAPAD_INFLIGHT", str(max_in_flight))
        )
        prep_threads = int(os.environ.get("MAPAD_PREP_THREADS", "1"))
        if getattr(self, "_prep_exec", None) is None or (
            getattr(self, "_prep_threads", 1) != prep_threads
        ):
            self._prep_threads = prep_threads
            self._prep_exec = ThreadPoolExecutor(
                max_workers=prep_threads, thread_name_prefix="pool-prep"
            )
        it = iter(blocks)
        prep_q: deque = deque()  # (key, records, Future[prepped])
        run_q: deque = deque()   # (key, records, launched, t0)
        exhausted = False

        # retry/deep tiers default ON only for big (genome-scale) indexes:
        # the 4 Mbp chip sweep (tools/retry_sweep.py, ROADMAP round 4)
        # showed every retry variant LOSES there -- the device is the
        # scarce resource and retry invocations cost more device time than
        # the host cores they free -- while at hg19 scale the host
        # fallback is ~24 ms/read and the tiers win by an order of
        # magnitude.  MAPAD_RETRY_TIER=1/0 forces.
        # default OFF everywhere since round 5: with the 17% faster host
        # fallback, retry invocations cost more device time than the host
        # cores they free even at hg19 (v3 sweep: retry tiers 754-765 vs
        # 1,576-1,615 reads/s without; ROADMAP).  MAPAD_RETRY_TIER=1
        # forces on.
        env_retry = os.environ.get("MAPAD_RETRY_TIER")
        retry_enabled = lazy_fallback and env_retry == "1"
        retry_gens = int(os.environ.get("MAPAD_RETRY_GENS", "2"))
        # below this, one more device invocation costs more than the host
        # fallback pool clearing the stragglers
        retry_min = int(
            os.environ.get("MAPAD_RETRY_MIN", str(self.pool_config.lanes // 4))
        )
        # mid-stream trigger: launch a retry block once this many
        # escalatees accumulated.  Must be SMALL relative to R: the
        # pipeline's postprocess waits on each block's escalatee futures,
        # so retries have to resolve shortly after their block or the
        # whole conversion stage backs up into a serial tail.  Small
        # retry blocks are also cheap -- the pool loop stops early once
        # its few reads finish.
        retry_block = int(os.environ.get("MAPAD_RETRY_BLOCK", str(R // 8)))
        retry_buf: list = []  # (Future, record, gen)
        _RETRY = object()  # sentinel key: internal block, never yielded

        # deep tier: a second device tier with a narrow-deep config
        # (L/4 lanes x 4x steps at the same frame store; per-read cap
        # raised to the L*CAP VMEM budget / lanes, floored at
        # total_steps -- see _deep_config), so deep reads (primary-cap
        # abandons and heavy unfinished) stay on device.  At
        # genome scale the exact host fallback costs ~24 ms/read against
        # the multi-GB FMD (hg19 e2e measured 269 reads/s that way), so
        # big (int64) mode enables this by default; MAPAD_DEEP_TIER=1/0
        # forces.  Deep blocks are kept partially filled (R//4 by
        # default) so each deep read gets a large budget share.
        deep_tier = lazy_fallback and self.deep_tier_enabled()
        cfg_deep = self._deep_config(cfg)
        # hg19 sweep (ROADMAP round 4): deep_block=R//8 (512 at the big-mode
        # R=4096) beat R//4 -- smaller deep blocks give each deep read a
        # larger budget share, resolving more of them on device
        deep_take = int(
            os.environ.get(
                "MAPAD_DEEP_BLOCK", str(max(retry_min, R // 8))
            )
        )
        # hg19 sweep: 2 deep passes beat 1 (resolves ~6% more on device)
        # and 3 (a third pass re-runs monsters from scratch for nothing):
        # 886 vs 786 vs 708 reads/s (ROADMAP round 4)
        # one outer pass: in-kernel spill generations RESUME survivors
        # within the deep invocation, which beat outer re-entry (775 vs
        # 527-721 in the v2 hg19 sweep) -- re-entry pays prep + dispatch
        # + a from-scratch re-run
        deep_gens = int(os.environ.get("MAPAD_DEEP_GENS", "1"))
        deep_buf: list = []  # (Future, record, gen)
        _DEEP = object()  # sentinel key: internal deep block
        # route no-hit escalatees straight to the host instead of the
        # deep tier (default on with the tier; MAPAD_DEEP_NOHIT_HOST=0
        # restores unconditional deep routing)
        deep_nohit_host = deep_tier and (
            os.environ.get("MAPAD_DEEP_NOHIT_HOST", "1") == "1"
        )
        nohit_probe = os.environ.get("MAPAD_NOHIT_PROBE", "0") == "1"

        def fb_submit(rec, stash_i, stash, fut=None):
            f = fb_pool.submit(self._fallback_value, [rec], 0,
                               self._stash_row(stash, stash_i))
            if fut is None:
                return f
            # chain the fallback result into the caller-visible future
            def _done(src, dst=fut):
                exc = src.exception()
                if exc is not None:
                    dst.set_exception(exc)
                else:
                    dst.set_result(src.result())
            f.add_done_callback(_done)
            return fut

        def refill_prep():
            nonlocal exhausted
            # 1 prep running + 1 queued behind it keeps the prep thread busy
            while len(prep_q) < prep_threads + 1:
                # an accumulated retry/deep block is ready work: prefer it
                # over new input, and flush stragglers when the input and
                # pipeline have drained
                drained = exhausted and not prep_q and not run_q
                if retry_enabled and retry_buf and (
                    len(retry_buf) >= retry_block
                    or (drained and len(retry_buf) >= retry_min)
                ):
                    take = retry_buf[:R]
                    del retry_buf[:R]
                    recs = [t[1] for t in take]
                    prep_q.append(
                        ((_RETRY, take), recs,
                         self._prep_exec.submit(
                             self._prep_block, recs, R, cfg))
                    )
                    self._stats["retried"] = (
                        self._stats.get("retried", 0) + len(take)
                    )
                    continue
                if deep_tier and deep_buf and (
                    len(deep_buf) >= deep_take
                    or (drained and len(deep_buf) >= retry_min)
                ):
                    take = deep_buf[:deep_take]
                    del deep_buf[:deep_take]
                    recs = [t[1] for t in take]
                    prep_q.append(
                        ((_DEEP, take), recs,
                         self._prep_exec.submit(
                             self._prep_block, recs, R, cfg_deep))
                    )
                    self._stats["deep_retried"] = (
                        self._stats.get("deep_retried", 0) + len(take)
                    )
                    continue
                if exhausted:
                    break
                nxt = next(it, None)
                if nxt is None:
                    exhausted = True
                    continue
                key, recs = nxt
                prep_q.append(
                    (key, recs,
                     self._prep_exec.submit(self._prep_block, recs, R, cfg))
                )

        while True:
            refill_prep()
            while prep_q and len(run_q) < max_in_flight:
                key, recs, fut = prep_q.popleft()
                launched = self._launch_block(fut.result(), params)
                run_q.append((key, recs, launched))
                refill_prep()
            if not run_q:
                # too few for another device block: host fallback
                for fut, rec, _gen in retry_buf:
                    self._stats["oracle"] += 1
                    fb_submit(rec, None, None, fut)
                retry_buf.clear()
                for fut, rec, _gen in deep_buf:
                    self._stats["oracle"] += 1
                    fb_submit(rec, None, None, fut)
                deep_buf.clear()
                break
            key, recs, launched = run_q.popleft()
            out = [None] * len(recs)
            abandoned: set = set()
            deep: set = set()
            nohits: set = set()
            nohit_pend: list = []  # (fut, rec, i) for the batched probe
            tier = (
                key[0] if isinstance(key, tuple) and key
                and key[0] in (_RETRY, _DEEP) else None
            )
            escalated = self._collect_pool(
                recs, launched, out, 0, launched[2], abandoned, deep,
                count_stats=tier is None, nohit_out=nohits,
            )
            stash = launched[3]

            def retryable(i, rec, gen):
                # abandons exhausted their PER-READ step cap (the same
                # config would abandon them again) and deep reads already
                # consumed most of it (retry would mostly re-spend it);
                # both go to the deep tier (uncapped per-read budget) when
                # enabled, else to the host fallback NOW so the work
                # overlaps the stream.  Only budget-starved reads
                # (unfinished early / undispatched / chain overflow)
                # re-run on the primary-config retry tier.
                return (
                    retry_enabled and gen < retry_gens
                    and i not in abandoned and i not in deep
                    and 0 < len(rec.sequence) <= cfg.max_len
                )

            def route(i, rec, gen, fut=None):
                """Send one escalated read to retry/deep/host; returns the
                future resolving to its (hits, duration)."""
                if retryable(i, rec, gen):
                    fut = fut or Future()
                    retry_buf.append((fut, rec, gen + 1))
                    return fut
                # deep blocks may re-enter the deep tier up to deep_gens
                # passes: each pass carries fewer survivors, so the budget
                # share per read grows geometrically and only the true
                # monster tail reaches the host.  NO-HIT escalatees skip
                # the tier when nohit-to-host routing is on: they are
                # mostly exogenous searches past the deep cap
                # (monster_profile: no-hit p50 ~15k pops) that would
                # abandon after burning the whole deep budget
                if deep_tier and gen < deep_gens and (
                    not (deep_nohit_host and i is not None and i in nohits)
                ) and (
                    0 < len(rec.sequence) <= cfg.max_len
                ):
                    fut = fut or Future()
                    deep_buf.append((fut, rec, gen + 1))
                    return fut
                nohit = i is not None and i in nohits
                if deep_nohit_host and nohit:
                    self._stats["nohit_host"] = (
                        self._stats.get("nohit_host", 0) + 1
                    )
                self._stats["oracle"] += 1
                if nohit and nohit_probe and lazy_fallback:
                    # no-hit escalatees batch into K-way interleaved
                    # exhaustion probes at block flush: most are proven
                    # hitless at a fraction of the exact search's DRAM
                    # stalls, the rest (device-flagged no-hits that DO
                    # have deep hits) fall through to the exact search
                    # inside the same fallback task
                    fut = fut or Future()
                    nohit_pend.append((fut, rec, i))
                    return fut
                return fb_submit(rec, i, stash, fut)

            def flush_nohit():
                # one fallback-pool task per probe batch; each task runs
                # the interleaved probes then the exact search for bails
                pb = int(os.environ.get("MAPAD_PROBE_BATCH", "16"))
                while nohit_pend:
                    chunk = nohit_pend[:pb]
                    del nohit_pend[:pb]
                    fb_pool.submit(self._probe_batch_entries, chunk, stash)

            if tier is not None:
                # retry/deep block: resolve the placeholder futures
                take = key[1]
                for j, (fut, rec, gen) in enumerate(take):
                    if j in escalated:
                        route(j, rec, gen, fut)
                    else:
                        fut.set_result(out[j])
                flush_nohit()
                continue
            for i in escalated:
                fut = route(i, recs[i], 0)
                out[i] = fut if lazy_fallback else fut.result()
            flush_nohit()
            yield key, out

    def deep_tier_enabled(self) -> bool:
        """Deep tier default: ON for big (int64 / genome-scale) indexes,
        where the host fallback walks a multi-GB FMD at ~24 ms/read; OFF
        for small indexes where the host pool clears the deep tail more
        cheaply than extra device invocations.  MAPAD_DEEP_TIER=1/0
        forces either way."""
        import os

        env = os.environ.get("MAPAD_DEEP_TIER")
        if env is not None:
            return env == "1"
        return bool(getattr(self.device_index, "big", False))

    def _deep_config(self, cfg: "PoolConfig | None" = None) -> "PoolConfig":
        """Deep-tier pool config: a larger per-read pop ceiling for
        escalated reads that showed hits (no-hit escalatees route to the
        host instead, search_stream).  Default shape after the round-5
        hg19 sweeps: FULL width (same lanes/steps as primary, cap = the
        8192-pop L*CAP budget share, single generation) -- wider pools
        kept occupancy through the monster tail and beat every narrow
        variant in-window (ROADMAP round 5).  Narrowing via
        MAPAD_DEEP_LANES trades width for a higher per-read cap at the
        same frame store (L/2 lanes -> 2x steps) and enables the
        in-kernel spill generations (MAPAD_DEEP_KGENS) so survivors
        resume across store fills; MAPAD_DEEP_STEPS / MAPAD_DEEP_CAP
        override directly."""
        import os

        cfg = cfg or self.pool_config
        # FULL-width deep: the v4/v5 hg19 sweeps ordered L=512 > 256 >
        # 128 within every sweep window (wider pools keep occupancy
        # through the monster tail); at full width the derived cap is
        # the 8192 budget share, which covers the with-hit escalatee
        # pop distribution (hit-read p95 ~7k pops,
        # tools/monster_profile.py) now that no-hit reads route to the
        # host instead
        lanes = int(os.environ.get(
            "MAPAD_DEEP_LANES", str(max(32, cfg.lanes))
        ))
        # clamp env overrides: lanes=0 would divide by zero below, and
        # lanes > cfg.lanes would silently grow the L*S frame store past
        # the stated HBM budget (the steps multiplier floors at 1)
        lanes = max(1, min(lanes, cfg.lanes))
        steps = int(os.environ.get(
            "MAPAD_DEEP_STEPS",
            str(cfg.total_steps * max(1, cfg.lanes // lanes)),
        ))
        cap_budget = cfg.lanes * cfg.read_step_cap  # known-VMEM-resident
        cap = int(os.environ.get(
            "MAPAD_DEEP_CAP",
            str(min(steps, max(cfg.total_steps, cap_budget // lanes))),
        ))
        # deep blocks carry few, heavy reads: give the kernel more spill
        # generations (in-place store compaction, search_pool.py) so a
        # monster read keeps its frontier across store fills up to the
        # per-read cap instead of re-entering the tier from scratch
        kgens = int(os.environ.get("MAPAD_DEEP_KGENS", "4"))
        if cap + 4 > steps:
            kgens = 1
        return cfg._replace(
            lanes=lanes, total_steps=steps, read_step_cap=cap,
            generations=kgens,
            min_live=int(os.environ.get("MAPAD_KGENS_MIN_LIVE", "32")),
            # deep spills run UNCAPPED (each boundary frees S - cap
            # steps): monsters here have already shown they need large
            # budgets, unlike the primary config's bounded spill that
            # only mops up the budget-starved tail
            spill_steps=int(os.environ.get("MAPAD_DEEP_SPILL", "0")),
        )

    def warm(self, records):
        """Compile-warm every config a production run can hit: the primary
        pool config via a normal chunk, and the deep tier's (different
        lanes/total_steps/read_step_cap => different compiled kernel) when
        it is enabled, so the first real deep block does not pay a compile
        mid-stream."""
        self.search_chunk(records)
        if self.mode == "pool" and self.deep_tier_enabled():
            prepped = self._prep_block(
                records[: self.block_reads], self.block_reads,
                self._deep_config(),
            )
            launched = self._launch_block(prepped, self._params())
            sub = records[: self.block_reads]
            out = [None] * len(sub)
            self._collect_pool(sub, launched, out, 0, launched[2],
                               count_stats=False)

    @staticmethod
    def _stash_row(stash, i):
        """Single-read view of a block prep stash (index 0) for the
        fallback path, so fallbacks reuse the block's LUT/penalty rows."""
        if stash is None or i is None:
            return None
        if "_inv" in stash:
            i = int(stash["_inv"][i])  # original -> dealt row (sharded)
        return dict(
            pattern_rank=stash["pattern_rank"][i : i + 1],
            pattern_code=stash["pattern_code"][i : i + 1],
            n=stash["n"][i : i + 1],
            score_lut=stash["score_lut"][i : i + 1],
            pen=stash["pen"][i : i + 1],
            split=stash["split"][i : i + 1],
            scale=stash["scale"][i : i + 1],
            thresh=stash["thresh"][i : i + 1],
            repr_mm=stash["repr_mm"][i : i + 1],
            max_len=stash["max_len"],
        )

    def _fallback_value(self, records, i, stash=None):
        return self._fallback_one(records, i, stash)[1]

    def _probe_batch_entries(self, entries, stash):
        """Fallback-pool task: K-way interleaved no-hit exhaustion probes
        over one block's no-hit escalatees (native exhaust_probe_batch),
        then the exact search for every read the probe could not prove
        hitless.  entries: [(Future, record, block_index)]."""
        import os

        t0 = time.perf_counter()
        try:
            searcher = self._ensure_native()

            def row_of(i):
                return int(stash["_inv"][i]) if "_inv" in stash else i

            batch = []
            singles = []
            for e in entries:
                _, rec, i = e
                ln = len(rec.sequence)
                if (
                    searcher is not None
                    and stash is not None
                    and 0 < ln <= stash["max_len"]
                    and row_of(i) < len(stash["n"])
                    and int(stash["n"][row_of(i)]) == ln
                ):
                    batch.append(e)
                else:
                    singles.append(e)
            verdicts = []
            if batch:
                rows = [row_of(i) for _, _, i in batch]
                verdicts = searcher.probe_batch(
                    stash["pattern_rank"][rows],
                    stash["pattern_code"][rows],
                    stash["n"][rows], stash["score_lut"][rows],
                    stash["pen"][rows], stash["split"][rows],
                    stash["scale"][rows], stash["thresh"][rows],
                    self.parameters,
                    interleave=int(os.environ.get("MAPAD_PROBE_K", "4")),
                )
                probe_dt = time.perf_counter() - t0
                self._stats["fb_secs"] += probe_dt
                share = probe_dt / len(batch)
                if self.packed_hits:
                    from ..map.native_post import _EMPTY_PACKED

                    empty = _EMPTY_PACKED
                else:
                    empty = []
                for (fut, rec, i), v in zip(batch, verdicts):
                    if v == 0:
                        self._stats["probe_empty"] = (
                            self._stats.get("probe_empty", 0) + 1
                        )
                        fut.set_result((empty, share))
                    else:
                        fut.set_result(
                            self._fallback_one(
                                [rec], 0, self._stash_row(stash, i)
                            )[1]
                        )
            for fut, rec, i in singles:
                fut.set_result(
                    self._fallback_one(
                        [rec], 0, self._stash_row(stash, i)
                    )[1]
                )
        except BaseException as e:  # a hung future would stall the stream
            for fut, _, _ in entries:
                if not fut.done():
                    fut.set_exception(e)

    def _prep_block(self, chunk, R, cfg):
        """Host-side preparation of one pool invocation (runs on the prep
        thread): LUT grids, Bi-D, bound thresholds, device upload."""
        t0 = time.perf_counter()
        # size the pattern axis to the chunk's real max read length (round
        # up to 16 to bound recompiles); cuts LUT prep + per-step gather
        # bandwidth for short-read workloads
        import os

        if self.mesh is not None:
            # deal reads round-robin into the mesh's contiguous shard
            # slices (pool_sharded.round_robin_permutation: positional
            # correlation makes a contiguous split ~14% step-imbalanced,
            # round-robin ~12%); _collect_pool recomputes the same
            # deterministic permutation to un-deal results
            from ..parallel.pool_sharded import round_robin_permutation

            perm = round_robin_permutation(R, self.n_shards)
            ext = list(chunk) + [_EMPTY] * (R - len(chunk))
            chunk = [ext[int(p)] for p in perm]

        mlen = max((len(r.sequence) for r in chunk), default=1)
        m_fit = min(cfg.max_len, max(16, -(-mlen // 16) * 16))
        cfg = cfg._replace(max_len=m_fit)
        # true per-read XD timing by default: the kernel logs per-read step
        # counts, reduced on device to an (R,) array so the fetch overhead
        # is negligible (reference measures per-read wall time,
        # mapping.rs:912-918; the device-native analogue is steps x
        # step-time).  MAPAD_XD_STEPS=0 restores the batch-average tag.
        cfg = cfg._replace(
            track_read_steps=os.environ.get("MAPAD_XD_STEPS", "1") != "0"
        )
        host_bid = self._host_bid_active()
        prep = self._prepare(
            [r if len(r.sequence) <= cfg.max_len else _EMPTY for r in chunk],
            cfg.max_len, R, host_bid=host_bid, dev_full=not host_bid,
        )
        if self.mesh is not None and isinstance(prep.get("_stash"), dict):
            # stash rows are in dealt order; _stash_row maps through _inv
            prep["_stash"]["_inv"] = np.argsort(perm)
        logger.debug(
            "pool prep: %.0fms for %d reads (host_bid=%s)",
            (time.perf_counter() - t0) * 1e3, len(chunk), host_bid,
        )
        if not host_bid and not prep.get("dev_prep"):
            # padded/empty reads must reject everything and finish
            # immediately (the packed path applies this before upload)
            n_host = np.asarray(prep["n"])
            thresh = np.asarray(prep["cutoff_thresh"]).copy()
            thresh[n_host == 0] = np.float32(np.inf)
            import jax.numpy as jnp

            prep["cutoff_thresh"] = jnp.asarray(thresh)
        return cfg, prep, host_bid, t0

    def _launch_block(self, prepped, params):
        """Dispatch one prepared pool invocation plus its result pack and
        async D2H copy, so the transfer overlaps the NEXT invocation's
        compute instead of queueing behind it."""
        cfg, prep, host_bid, t0 = prepped
        stash = prep.pop("_stash", None)
        prep.pop("dev_prep", None)
        if self.mesh is not None:
            from ..parallel.pool_sharded import (
                pool_search_sharded,
                shard_reads,
            )

            handle = pool_search_sharded(
                self.mesh, self._mesh_index,
                shard_reads(self.mesh, prep), params, cfg,
            )
        else:
            kw = (
                {"slut_packed": prep["slut_packed"]} if host_bid else {}
            )
            handle = k_mismatch_search_pool2(
                self.device_index, prep["pattern_rank"],
                prep["pattern_code"], prep["n"], prep["score_lut"],
                prep["pen"], prep["split"], prep["cutoff_scale"],
                prep["cutoff_thresh"], prep["repr_mm"], params, cfg, **kw,
            )
        packed = self._pack_result(handle)
        try:
            packed.copy_to_host_async()
        except Exception:  # pragma: no cover - CPU backend has no async copy
            pass
        return handle, packed, t0, stash

    def _dispatch_pool(self, chunk, params, R, cfg):
        """Back-compat single-call prep+launch (tools/ scripts)."""
        launched = self._launch_block(self._prep_block(chunk, R, cfg), params)
        return launched, launched[2]

    @staticmethod
    @jax.jit
    def _pack_result(res):
        """Flatten every PoolResult field into ONE int32 buffer: the axon
        transport charges a ~34 ms round trip per fetched array, so 15
        per-field np.asarray calls cost ~0.5 s/chunk while one packed
        transfer costs one round trip.  c_ops (the bulk of the payload)
        travels as NARROW wire ops: every consumer reads bits 0..20 only
        (base[0:2] | pos[2:17] | kind[17:19] | VALID[20], ops/search.py
        pack_op), and pos < max_len < MW, so pos needs only
        ceil(log2(MW)) wire bits -- at production M<=128 that is a
        12-bit op, 5 per int64 (12.8 bits/op vs the 21.33 of the older
        3-into-64 scheme; the fetch is the transport-weather-sensitive
        stage, ROADMAP round 5)."""
        import jax.numpy as jnp

        parts = []
        for name, a in zip(res._fields, res):
            if a is None:
                continue
            a = jnp.asarray(a)
            if name == "c_ops":
                MW = a.shape[-1]  # may carry a leading mesh-device axis
                Cn = int(np.prod(a.shape[:-1]))
                a = a.reshape(Cn, MW)
                opbits, K, pb = _wire_opbits(MW)
                w = a & 0x1FFFFF
                narrow = (
                    (w & 3)
                    | (((w >> 2) & ((1 << pb) - 1)) << 2)
                    | (((w >> 17) & 3) << (2 + pb))
                    | (((w >> 20) & 1) << (4 + pb))
                )
                MWK = -(-MW // K) * K
                g = jnp.pad(narrow, ((0, 0), (0, MWK - MW)))
                g = g.reshape(Cn, MWK // K, K).astype(jnp.int64)
                w64 = g[..., 0]
                for k in range(1, K):
                    w64 = w64 | (g[..., k] << (k * opbits))
                a = jax.lax.bitcast_convert_type(w64, jnp.int32)
            elif a.dtype in (jnp.int64, jnp.float32):
                a = jax.lax.bitcast_convert_type(a, jnp.int32)
            elif a.dtype == jnp.bool_:
                a = a.astype(jnp.int32)
            parts.append(a.reshape(-1))
        return jnp.concatenate(parts)

    def _fetch_result(self, handle):
        """One-round-trip fetch of a PoolResult -> numpy PoolResult."""
        return self._unpack_result(handle, np.asarray(self._pack_result(handle)))

    @staticmethod
    def _unpack_result(handle, flat):
        """Rebuild a numpy PoolResult from the packed transfer buffer."""
        out = []
        off = 0
        for name, leaf in zip(handle._fields, handle):
            if leaf is None:
                out.append(None)
                continue
            dt = np.dtype(leaf.dtype)
            if name == "c_ops":
                MW = leaf.shape[-1]
                Cn = int(np.prod(leaf.shape[:-1]))
                opbits, K, pb = _wire_opbits(MW)
                MWK = -(-MW // K) * K
                n_i32 = Cn * (MWK // K) * 2
                w = flat[off : off + n_i32].view(np.int64).reshape(
                    Cn, MWK // K
                )
                v = np.empty((Cn, MWK), dtype=np.int64)
                for k in range(K):
                    v[:, k::K] = (w >> (k * opbits)) & ((1 << opbits) - 1)
                arr = (
                    (v & 3)
                    | (((v >> 2) & ((1 << pb) - 1)) << 2)
                    | (((v >> (2 + pb)) & 3) << 17)
                    | (((v >> (4 + pb)) & 1) << 20)
                )
                arr = arr[:, :MW].astype(dt).reshape(leaf.shape)
            elif dt == np.bool_:
                n_i32 = int(np.prod(leaf.shape))  # packed as int32
            else:
                n_i32 = int(np.prod(leaf.shape)) * dt.itemsize // 4
            if name != "c_ops":
                seg = flat[off : off + n_i32]
                if dt == np.bool_:
                    arr = seg.astype(np.bool_).reshape(leaf.shape)
                else:
                    arr = seg.view(dt).reshape(leaf.shape)
            off += n_i32
            out.append(arr)
        assert off == flat.size
        return type(handle)(*out)

    def _collect_pool(self, chunk, handle, out, base, t0,
                      abandoned_out: set | None = None,
                      deep_out: set | None = None,
                      count_stats: bool = True,
                      nohit_out: set | None = None):
        t_fetch = time.perf_counter()
        stash = None
        if isinstance(handle, tuple) and not hasattr(handle, "_fields"):
            # launched tuple from _launch_block: the pack was dispatched at
            # launch time and its D2H copy already runs in the background
            h, packed = handle[0], handle[1]
            stash = handle[3] if len(handle) > 3 else None
            result = self._unpack_result(h, np.asarray(packed))
        elif isinstance(jax.tree.leaves(handle)[0], jax.Array):
            result = self._fetch_result(handle)
        else:  # already host-side (e.g. the sharded collector's per-shard
            # slices, which fetch the full mesh result in one transfer)
            result = jax.tree.map(np.asarray, handle)
        elapsed = time.perf_counter() - t0
        logger.debug(
            "pool collect: device+fetch %.0fms (of %.0fms since dispatch)",
            (time.perf_counter() - t_fetch) * 1e3, elapsed * 1e3,
        )
        if result.c_read.ndim == 2:
            # mesh-sharded result (leading device axis): collect per shard
            # and un-deal back to input order
            esc = self._collect_pool_sharded(
                chunk, result, out, base, t0, abandoned_out, deep_out,
                count_stats, nohit_out,
            )
            _inject_pre_escalate(
                stash, len(chunk), esc, abandoned_out, nohit_out
            )
            return esc
        t_dec = time.perf_counter()
        per_read = elapsed / max(len(chunk), 1)
        read_time = None
        if result.read_steps is not None and result.read_steps.size:
            rs = np.asarray(result.read_steps)
            if (rs >= 0).any():
                step_time = elapsed / max(int(result.steps), 1)
                read_time = np.where(rs >= 0, rs * step_time, per_read)
        splits = [
            self.parameters.difference_model.find_alignment_start(
                len(r.sequence)
            )
            for r in chunk
        ]

        escalated = set(
            i for i in range(len(chunk))
            if len(chunk[i].sequence) > self.pool_config.max_len
        )
        esc_why = self._stats.setdefault(
            "esc_why", {"overlong": 0, "overflow": 0, "unfinished": 0,
                        "undispatched": 0, "abandon": 0}
        ) if count_stats else {
            "overlong": 0, "overflow": 0, "unfinished": 0,
            "undispatched": 0, "abandon": 0,
        }
        esc_why["overlong"] += len(escalated)
        esc_why["bid_rle"] = esc_why.get("bid_rle", 0) + _inject_pre_escalate(
            stash, len(chunk), escalated, abandoned_out, nohit_out
        )
        n_chains = int(result.n_chains)
        if n_chains > result.c_read.shape[0]:
            # chain log overflow: cannot attribute hits safely
            escalated.update(
                i for i in range(len(chunk)) if len(chunk[i].sequence) > 0
            )
            esc_why["overflow"] += len(escalated)
            logger.warning("pool chain log overflow (%d chains)", n_chains)
        else:
            pre = len(escalated)
            for rid in result.lane_read[result.lane_unfinished]:
                if rid < len(chunk):
                    escalated.add(int(rid))
            esc_why["unfinished"] += len(escalated) - pre
            pre = len(escalated)
            for rid in range(int(result.next_read), len(chunk)):
                escalated.add(rid)
            esc_why["undispatched"] += len(escalated) - pre

            # group chains by read (descending slot == completion order);
            # abandon markers escalate their read.  Vectorized: a python
            # per-chain loop cost ~160 ms per 8192-read chunk on the
            # collect critical path.
            cr = result.c_read[:n_chains]
            valid = (cr >= 0) & (cr < len(chunk))
            ab = result.c_abandon[:n_chains] & valid
            pre = len(escalated)
            ab_reads = np.unique(cr[ab]).tolist()
            escalated.update(ab_reads)
            esc_why["abandon"] += len(escalated) - pre
            if abandoned_out is not None:
                # per-read step-cap exhaustion: a same-config retry would
                # hit the same cap, so these go straight to host fallback
                abandoned_out.update(int(r) for r in ab_reads)
            idx = np.flatnonzero(valid & ~result.c_abandon[:n_chains])
            ordk = idx[np.lexsort((-result.c_slot[idx], cr[idx]))]
            crs = cr[ordk]
            rid_range = np.arange(len(chunk))
            starts = np.searchsorted(crs, rid_range)
            ends = np.searchsorted(crs, rid_range, side="right")
            if nohit_out is not None:
                # escalated reads with ZERO hits recorded so far: at
                # genome scale 66% of deep (monster) reads are no-hit
                # exogenous searches with median ~15k pops
                # (tools/monster_profile.py) -- the deep tier's cap
                # abandons them after burning its whole per-read budget
                # and they land on the host anyway, so the router sends
                # them straight there
                nohit_out.update(
                    i for i in escalated if starts[i] == ends[i]
                )
            if self.packed_hits:
                from ..map.native_post import _EMPTY_PACKED, PackedHits

                ivals_all = np.stack(
                    [
                        result.c_lower[ordk].astype(np.int64),
                        result.c_lrev[ordk].astype(np.int64),
                        result.c_size[ordk].astype(np.int64),
                    ],
                    axis=1,
                )
                scores_all = result.c_score[ordk].astype(np.float32)
                ops_all = result.c_ops[ordk].astype(np.uint32, copy=False)
            for i, record in enumerate(chunk):
                if i in escalated:
                    continue
                s, e = starts[i], ends[i]
                if self.packed_hits:
                    hits = (
                        PackedHits(ivals_all[s:e], scores_all[s:e],
                                   ops_all[s:e], splits[i])
                        if e > s else _EMPTY_PACKED
                    )
                else:
                    hits = [
                        self._decode_chain(result, int(k), splits[i])
                        for k in ordk[s:e]
                    ]
                out[base + i] = (
                    hits,
                    float(read_time[i]) if read_time is not None
                    else per_read,
                )

        logger.debug(
            "pool decode: %.0fms for %d chains",
            (time.perf_counter() - t_dec) * 1e3, n_chains,
        )
        if deep_out is not None:
            import os

            # escalated reads that already consumed most of their per-read
            # step cap are DEEP: a same-config retry would spend a full cap
            # again, and the host fallback redoes them from scratch either
            # way, so submitting them to the fallback pool NOW keeps that
            # work overlapped with the stream instead of a serial tail
            frac = float(os.environ.get("MAPAD_RETRY_DEEP_FRAC", "0.5"))
            thr = max(1, int(self.pool_config.read_step_cap * frac))
            if result.read_steps is not None and result.read_steps.size:
                rs_a = np.asarray(result.read_steps)
                deep_out.update(
                    i for i in escalated
                    if i < rs_a.shape[0] and int(rs_a[i]) >= thr
                )
            else:
                # no per-read step counts: treat actively-unfinished lanes
                # as deep (they ran the whole invocation)
                deep_out.update(
                    int(rid)
                    for rid in result.lane_read[result.lane_unfinished]
                    if rid < len(chunk)
                )
        if count_stats:
            self._stats["device_lanes"] += len(chunk)
            self._stats["escalated"] += len(escalated)
            self._stats["batches"] += 1
        return escalated

    def _collect_pool_sharded(self, chunk, result, out, base, t0,
                              abandoned_out=None, deep_out=None,
                              count_stats: bool = True, nohit_out=None):
        """Collect a mesh-sharded PoolResult (leading device axis).

        Shard d owns dealt slots [d*R/D, (d+1)*R/D) of the block's
        round-robin deal (_prep_block); each shard collects through the
        normal single-device path with re-based read ids, then results,
        escalation and abandon/deep sets un-deal back to input order.
        Per-cause escalation census is not split in this mode (the shard
        sub-calls run with count_stats=False)."""
        from ..parallel.pool_sharded import round_robin_permutation

        D = result.c_read.shape[0]
        R = self.block_reads
        perm = round_robin_permutation(R, D)
        ext = list(chunk) + [_EMPTY] * (R - len(chunk))
        dealt = [ext[int(p)] for p in perm]
        R_local = R // D
        out_d = [None] * R
        esc_d: set = set()
        ab_d: set = set()
        deep_d: set = set()
        nh_d: set = set()
        for d in range(D):
            shard_res = jax.tree.map(lambda x, d=d: x[d], result)
            lo = d * R_local
            sub = dealt[lo : lo + R_local]
            shard_res = shard_res._replace(
                c_read=np.where(
                    shard_res.c_read >= 0, shard_res.c_read - lo, -1
                ),
                lane_read=np.where(
                    shard_res.lane_read < R, shard_res.lane_read - lo,
                    len(sub),
                ),
                next_read=min(
                    max(int(shard_res.next_read) - lo, 0), len(sub)
                ),
            )
            ab_l: set = set()
            deep_l: set = set()
            nh_l: set = set()
            esc = self._collect_pool(
                sub, shard_res, out_d, lo, t0, ab_l, deep_l,
                count_stats=False, nohit_out=nh_l,
            )
            esc_d.update(lo + i for i in esc)
            ab_d.update(lo + i for i in ab_l)
            deep_d.update(lo + i for i in deep_l)
            nh_d.update(lo + i for i in nh_l)

        n = len(chunk)
        escalated = set()
        for j in range(R):
            oi = int(perm[j])
            if oi >= n:
                continue
            out[base + oi] = out_d[j]
            if j in esc_d:
                escalated.add(oi)
            if abandoned_out is not None and j in ab_d:
                abandoned_out.add(oi)
            if deep_out is not None and j in deep_d:
                deep_out.add(oi)
            if nohit_out is not None and j in nh_d:
                nohit_out.add(oi)
        if count_stats:
            self._stats["device_lanes"] += n
            self._stats["escalated"] += len(escalated)
            self._stats["batches"] += 1
        # per-shard step telemetry: total work / (D x slowest shard) is the
        # static-split efficiency proxy reported by dryrun_multichip
        steps = np.asarray(result.steps).reshape(-1).tolist()
        acc = self._stats.setdefault("shard_steps", [0] * len(steps))
        for d, s in enumerate(steps):
            acc[d] += int(s)
        return escalated

    def _packed_lane_hits(self, result, lane, split):
        from ..map.native_post import _EMPTY_PACKED, PackedHits

        hcount = int(result.hcount[lane])
        if hcount == 0:
            return _EMPTY_PACKED
        ivals = np.stack(
            [
                np.asarray(result.h_lower[lane, :hcount], dtype=np.int64),
                np.asarray(result.h_lrev[lane, :hcount], dtype=np.int64),
                np.asarray(result.h_size[lane, :hcount], dtype=np.int64),
            ],
            axis=1,
        )
        return PackedHits(
            ivals,
            np.asarray(result.h_score[lane, :hcount], dtype=np.float32),
            np.asarray(result.h_ops[lane, :hcount]).astype(np.uint32, copy=False),
            int(split),
        )

    def _packed_chains(self, result, ks, split):
        from ..map.native_post import _EMPTY_PACKED, PackedHits

        if not ks:
            return _EMPTY_PACKED
        ks = np.asarray(ks, dtype=np.int64)
        ivals = np.stack(
            [
                np.asarray(result.c_lower[ks], dtype=np.int64),
                np.asarray(result.c_lrev[ks], dtype=np.int64),
                np.asarray(result.c_size[ks], dtype=np.int64),
            ],
            axis=1,
        )
        return PackedHits(
            ivals,
            np.asarray(result.c_score[ks], dtype=np.float32),
            np.asarray(result.c_ops[ks]).astype(np.uint32, copy=False),
            int(split),
        )

    def _decode_chain(self, result, k, split):
        buckets: dict[int, list] = {}
        for w in result.c_ops[k]:
            w = int(w)
            if w == 0:
                break
            kind = (w >> 17) & 7
            pos = (w >> 2) & 0x7FFF
            base = (
                int(CODE_TO_BASE[w & 3])
                if kind in (OP_MISMATCH, OP_DELETION)
                else 0
            )
            buckets.setdefault(pos, []).append(EditOperation(kind, pos, base))
        track = []
        for pos in sorted(buckets):
            ops = buckets[pos]
            if pos < split:
                track.extend(ops)
            else:
                track.extend(reversed(ops))
        return HitInterval(
            BiInterval(int(result.c_lower[k]), int(result.c_lrev[k]),
                       int(result.c_size[k])),
            np.float32(result.c_score[k]),
            track,
        )

    # --- fixed-batch tiered path ---

    def _search_chunk_batch(self, records):
        import os
        from concurrent.futures import ThreadPoolExecutor

        out = [None] * len(records)
        params = self._params()

        # Fallback pool runs CONCURRENTLY with device collection: escalated
        # reads are submitted the moment their batch result is fetched
        # (ctypes releases the GIL during the native search call).
        workers = max(1, (os.cpu_count() or 2) - 1)
        fallback_futures = []
        self._ensure_native()
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = list(range(len(records)))
            for tier_i, (max_steps, tier_lanes) in enumerate(self.tiers):
                if not pending:
                    break
                tier_t0 = time.perf_counter()
                tier_count = len(pending)
                lanes = tier_lanes if tier_lanes is not None else self.lanes
                config = self.config._replace(max_steps=max_steps)
                still_pending = []
                # Pipeline: dispatch every batch asynchronously, then fetch
                # and extract in order; host work overlaps device compute.
                in_flight = []
                for base in range(0, len(pending), lanes):
                    idxs = pending[base : base + lanes]
                    batch = [records[i] for i in idxs]
                    in_flight.append(
                        (idxs, batch,
                         *self._dispatch_batch(batch, params, config, lanes))
                    )
                last_tier = tier_i == len(self.tiers) - 1
                for idxs, batch, handle, split_arr, overlong, t0 in in_flight:
                    results, escalated = self._collect_batch(
                        batch, handle, split_arr, overlong, t0
                    )
                    for k, i in enumerate(idxs):
                        if k in escalated:
                            if last_tier:
                                fallback_futures.append(
                                    pool.submit(self._fallback_one, records, i)
                                )
                            else:
                                still_pending.append(i)
                        else:
                            out[i] = results[k]
                pending = still_pending
                logger.info(
                    "tier %d (S=%d): %d reads in %.1fs, %d escalated",
                    tier_i, max_steps, tier_count,
                    time.perf_counter() - tier_t0,
                    len(still_pending) + (len(fallback_futures) if last_tier else 0),
                )
            for i in pending:  # only when the tier list is empty
                fallback_futures.append(
                    pool.submit(self._fallback_one, records, i)
                )
            for fut in fallback_futures:
                i, result = fut.result()
                out[i] = result
        self._stats["oracle"] += len(fallback_futures)
        return out

    def _ensure_native(self):
        from ..map import native_search

        if getattr(self, "_native_searcher", None) is None:
            self._native_searcher = (
                native_search.NativeSearcher(self.fmd)
                if native_search.available()
                else None
            )
        return self._native_searcher

    def _native_bid(self):
        from ..map import native_search

        if getattr(self, "_native_bid_cache", None) is None:
            self._native_bid_cache = native_search.NativeBiD(self.fmd)
        return self._native_bid_cache

    def _bid_exec(self):
        from concurrent.futures import ThreadPoolExecutor

        if getattr(self, "_bid_exec_cache", None) is None:
            self._bid_exec_cache = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="bid"
            )
        return self._bid_exec_cache

    def _lut_cache(self):
        """Per-length LUT table cache (None when the model has no
        vectorized raw_grid -- then the direct grid build is faster)."""
        cache = getattr(self, "_lut_cache_obj", False)
        if cache is False:
            cache = self._lut_cache_obj = (
                _LutCache(self.parameters.difference_model, self.parameters)
                if _LutCache.usable(self.parameters.difference_model)
                else None
            )
        return cache

    def _device_lut(self):
        """One-time device score-LUT table + per-length offsets for the
        small-blob prep path (`_unpack_prep_lut`).  The host build is
        memoized across engines on the model's self-description string
        (the table is a pure function of the difference model and the
        length/quality ceilings)."""
        ent = getattr(self, "_dev_lut_obj", None)
        if ent is None:
            import jax.numpy as jnp

            sdm = self.parameters.difference_model
            # key on the model's scalar parameters (str(np.float32) is the
            # shortest uniquely-identifying repr); arrays/None are skipped
            attrs = tuple(
                (k, str(v))
                for k, v in sorted(vars(sdm).items())
                if isinstance(
                    v, (str, bool, int, float, tuple,
                        np.floating, np.integer)
                )
            )
            p = self.parameters
            key = (
                type(sdm).__name__, attrs,
                str(np.float32(p.penalty_gap_extend)),
                int(p.gap_dist_ends), self.config.max_len, _DEV_LUT_Q,
            )
            host = _DEV_LUT_MEMO.get(key)
            if host is None:
                t0 = time.perf_counter()
                host = _DEV_LUT_MEMO[key] = _build_all_lut(
                    sdm, p, self.config.max_len
                )
                logger.debug(
                    "device LUT table: %d rows built in %.1fs",
                    host[0].shape[0], time.perf_counter() - t0,
                )
            ent = self._dev_lut_obj = (
                jnp.asarray(host[0]), jnp.asarray(host[1]),
                jnp.asarray(host[2]),
            )
        return ent

    def _host_bid_active(self) -> bool:
        """Host-C++ Bi-D + prepacked LUT table.

        Defaults OFF in big (int64) mode: the C++ Bi-D walks the
        multi-GB BWT at DRAM-miss speed (~24 ms core per read measured
        at 3.1 Gbp -- 12.4 s per 1024 reads), while the kernel's device
        prologue gathers the same occ rows from HBM at ~151 ms per
        invocation.  MAPAD_HOST_BID=1/0 forces either way.
        """
        import os

        from ..map import native_search

        env = os.environ.get("MAPAD_HOST_BID")
        if env == "0":
            return False
        if env is None and getattr(self.device_index, "big", False):
            return False
        return native_search.available()

    def _fallback_one(self, records, i, stash=None):
        searcher = self._ensure_native()
        t1 = time.perf_counter()
        record = records[i]
        ln = len(record.sequence)
        if searcher is not None and ln > 0:
            if (
                stash is not None
                and ln <= stash["max_len"]
                and i < len(stash["n"])
                and int(stash["n"][i]) == ln
            ):
                # reuse the block's prepped LUT/penalty rows (identical
                # f32 values; rebuilding them per escalated read cost more
                # than the native search itself for shallow escalations)
                hits = searcher.search(
                    stash["pattern_rank"][i], stash["pattern_code"][i], ln,
                    stash["score_lut"][i], stash["pen"][i],
                    int(stash["split"][i]), stash["scale"][i],
                    stash["thresh"][i], stash["repr_mm"][i],
                    self.parameters, packed=self.packed_hits,
                )
            else:
                hits = self._native_search(searcher, record)
        else:
            hits = oracle_search(
                record.sequence, record.base_qualities,
                self.parameters, self.fmd,
            )
        dt = time.perf_counter() - t1
        self._stats["fb_secs"] += dt  # total exact-fallback core-seconds
        return i, (hits, dt)

    def _native_search(self, searcher, record, nohit=False):
        sdm = self.parameters.difference_model
        mb = self.parameters.mismatch_bound
        seq = np.frombuffer(bytes(record.sequence), dtype=np.uint8)
        quals = np.frombuffer(bytes(record.base_qualities), dtype=np.uint8)
        ln = len(seq)
        seqs = seq[None, :]
        score_lut, pen = _batch_luts(
            sdm, self.parameters, seqs, quals[None, :],
            np.asarray([ln], dtype=np.int32),
        )
        if isinstance(mb, Continuous):
            scale, thresh = mb._scale_read_length(ln), mb.cutoff
        else:
            scale, thresh = np.float32(1.0), mb.threshold_for_length(ln)
        repr_mm = (
            np.float32(-np.inf) if isinstance(mb, TestBound)
            else mb.representative_mismatch_penalty
        )
        return searcher.search(
            _RANK_TABLE[seq].astype(np.uint8), BASE_TO_CODE[seq], ln,
            score_lut[0], pen[0], sdm.find_alignment_start(ln),
            scale, thresh, repr_mm, self.parameters,
            packed=self.packed_hits, nohit_hint=nohit,
        )

    def _dispatch_batch(self, batch, params, config, lanes=None):
        t0 = time.perf_counter()
        max_len = config.max_len
        overlong = {
            i for i, r in enumerate(batch) if len(r.sequence) > max_len
        }
        prep = self._prepare(
            [r if len(r.sequence) <= max_len else _EMPTY for r in batch],
            max_len, lanes,
        )
        handle = k_mismatch_search_batch(
            self.device_index, prep["pattern_rank"], prep["pattern_code"],
            prep["n"], prep["score_lut"], prep["pen"], prep["split"],
            prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
            params, config,
        )
        return handle, np.asarray(prep["split"]), overlong, t0

    def _collect_batch(self, batch, handle, split_arr, overlong, t0):
        result = jax.tree.map(np.asarray, handle)  # waits for the device
        elapsed = time.perf_counter() - t0
        per_read = elapsed / max(len(batch), 1)

        escalate = result.escalate
        results = []
        escalated = set()
        for i, record in enumerate(batch):
            if i in overlong or (len(record.sequence) > 0 and escalate[i]):
                escalated.add(i)
                results.append(None)
            else:
                hits = self._extract_hits(result, i, int(split_arr[i]))
                results.append((hits, per_read))
        self._stats["device_lanes"] += len(batch)
        self._stats["escalated"] += len(escalated)
        self._stats["batches"] += 1
        if escalated:
            logger.debug(
                "escalating %d/%d reads to the next tier", len(escalated),
                len(batch),
            )
        return results, escalated


class HybridSearchEngine:
    """Device pool + host native threads working each chunk concurrently.

    The reference saturates every CPU core via rayon (mapping.rs:155); the
    TPU-native analogue keeps the chip busy with the pool kernel while the
    host cores run the exact native searcher on the chunk's tail.  The
    split fraction adapts to the measured per-chunk throughputs, so the
    two sides finish together regardless of hardware balance.  Both sides
    are oracle-exact, so the merged output is too.
    """

    def __init__(self, fmd_index, parameters, lanes: int = 2048,
                 threads: int | None = None, device_fraction: float = 0.6,
                 packed_hits: bool = False, **device_kw):
        import os as _os

        from ..map import native_search

        self.device = DeviceSearchEngine(
            fmd_index, parameters, lanes=lanes, packed_hits=packed_hits,
            **device_kw
        )
        self.packed_hits = packed_hits
        self.native = None
        if native_search.available():
            # leave cores free for the device pipeline's host side (LUT
            # prep, result collection, escalation fallbacks) -- saturating
            # every core with native search starves the chip
            if threads is None:
                threads = max(1, (_os.cpu_count() or 2) - 2)
            self.native = native_search.NativeSearchEngine(
                fmd_index, parameters, threads=threads,
                packed_hits=packed_hits,
            )
        else:
            logger.warning(
                "native searcher unavailable; hybrid engine runs device-only"
            )
        self._p = device_fraction
        self._stats = self.device._stats

    @property
    def block_reads(self) -> int:
        return self.device.block_reads

    def warm(self, records):
        self.device.warm(records)

    def search_stream(self, blocks, lazy_fallback: bool = False):
        """Streaming hybrid: each block's tail (1-p fraction) runs on the
        native host engine concurrently with the device stream handling
        the head; p adapts to the MEASURED per-side throughputs: the
        device side runs the whole wall clock (cumulative device reads /
        wall seconds) while the native side's capacity is its completed
        reads over its busy seconds, so a poor initial device_fraction
        corrects toward the ratio that makes both sides finish together."""
        from concurrent.futures import ThreadPoolExecutor

        if self.native is None:
            yield from self.device.search_stream(
                blocks, lazy_fallback=lazy_fallback
            )
            return
        nat_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="hybrid-native"
        )
        pending: dict = {}
        done = {"dev": 0, "nat": 0}
        nat_busy = [0.0]
        t_start = time.perf_counter()

        def _hashable(k):
            try:
                hash(k)
                return True
            except TypeError:
                return False

        def nat_search(recs):
            t0 = time.perf_counter()
            out = self.native.search_chunk(recs)
            nat_busy[0] += time.perf_counter() - t0
            return out

        def split():
            for key, recs in blocks:
                n = len(recs)
                k = n if n < 256 else max(1, min(n, int(n * self._p)))
                fut = nat_pool.submit(nat_search, recs[k:]) if k < n else None
                pending[id(key) if not _hashable(key) else key] = (k, fut)
                yield key, recs[:k]

        try:
            for key, dev_out in self.device.search_stream(
                split(), lazy_fallback=lazy_fallback
            ):
                k, fut = pending.pop(
                    id(key) if not _hashable(key) else key
                )
                done["dev"] += k
                if fut is None:
                    yield key, dev_out
                    continue
                nres = fut.result()
                done["nat"] += len(nres)
                wall = time.perf_counter() - t_start
                if done["dev"] + done["nat"] >= 1024 and nat_busy[0] > 0.05:
                    rate_dev = done["dev"] / wall
                    rate_nat = done["nat"] / nat_busy[0]
                    p_obs = rate_dev / max(rate_dev + rate_nat, 1e-9)
                    self._p = min(0.95, max(0.05, 0.5 * self._p + 0.5 * p_obs))
                    logger.debug(
                        "hybrid stream: device %.0f r/s, native %.0f r/s "
                        "(busy %.1fs of %.1fs), p -> %.2f",
                        rate_dev, rate_nat, nat_busy[0], wall, self._p,
                    )
                yield key, list(dev_out) + list(nres)
        finally:
            nat_pool.shutdown(wait=False)

    def search_chunk(self, records, lazy_fallback: bool = False):
        import concurrent.futures

        n = len(records)
        if self.native is None or n < 256:
            return self.device.search_chunk(records, lazy_fallback)
        k = max(1, min(n - 1, int(n * self._p)))
        dev_part, nat_part = records[:k], records[k:]
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
            t0 = time.perf_counter()
            fut = ex.submit(self._timed, self.native.search_chunk, nat_part)
            dres = self.device.search_chunk(dev_part, lazy_fallback)
            dev_dt = time.perf_counter() - t0
            nres, nat_dt = fut.result()
        rd = k / max(dev_dt, 1e-6)
        rn = (n - k) / max(nat_dt, 1e-6)
        new_p = rd / (rd + rn)
        self._p = min(0.95, max(0.05, 0.5 * self._p + 0.5 * new_p))
        logger.debug(
            "hybrid split: device %d@%.0f r/s, native %d@%.0f r/s, p -> %.2f",
            k, rd, n - k, rn, self._p,
        )
        return list(dres) + list(nres)

    @staticmethod
    def _timed(fn, part):
        t0 = time.perf_counter()
        out = fn(part)
        return out, time.perf_counter() - t0
