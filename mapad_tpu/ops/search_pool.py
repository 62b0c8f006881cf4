"""Persistent-pool batched search: lanes refill from a read pool.

The fixed-batch kernel (ops/search.py) runs every lane until the slowest
lane's search ends, so most lanes idle through the tail.  This variant keeps
all lanes busy: the moment a lane finishes a read it synthesizes a fresh
root frame for the next read from the pool (SURVEY.md hard part #3,
"frontier compaction/rebatching across lanes").

Key structures:
- **Two-level ring-buffered block pop.**  Each step writes one
  9-candidate block into a *write-once* key ring `st_mono`; per
  (lane, ring-block) an int32 pair `bm = [max_key, (step+1)<<9 | mask]`
  tracks the block's max over unconsumed candidates, its writing step
  (the LIFO tie-break) and a 9-bit consumed-candidate mask -- so popping
  never scatters into the big ring (which would force XLA to copy all
  ~40 MB of it every step; profiled round 2), only into the small pair
  array.  A second level of per-superblock (`SB`=64 blocks) [key, step]
  pairs brings per-step pop reads down to one (L, RBS) scan plus one
  (L, SB, 2) windowed drill gather.  Maxima are maintained exactly:
  push updates ride the shared-offset column DUS plus a max-combine
  into the slot's superblock; pop recomputes the popped block's pair
  from the already-gathered candidate row and re-maxes the drilled
  superblock window.  Within one read's lifetime (<= CAP steps) no
  ring slot is written twice (ring period is CAP+1), and a finished
  read clears its lane's superblock row, so superblock keys never go
  stale-high.  Stale *block* entries from finished reads are filtered
  at drill time by a per-lane `lane_start` step watermark (frames older
  than the current read's first step are dead), which replaces the old
  full-ring invalidation pass.  Everything stays int32: int64 math is
  emulated on TPU and profiled 5-10x slower for these passes.
- **Per-read step cap.**  A lane abandons reads that exceed
  `read_step_cap` pops, writing an in-store abandon marker; the host
  escalates those reads to the exact native/host searcher.  No per-step
  scatters to per-read arrays anywhere.
- **Hits in the store.**  Completion entries carry the owning read id in
  the (otherwise unused) gaps field; one end-of-kernel compaction + chain
  walk returns only O(hits) data.

Step semantics (pop order, bounds, early stops) are identical to the
fixed-batch kernel and the host oracle; equivalence is property-tested.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bi_d import compute_bi_d
from .fm import DeviceFmIndex, extend_batch
from .search import (
    CANDS,
    F_GAPS,
    F_LOWER,
    F_LREV,
    F_OP,
    F_PARENT,
    F_SCOREBITS,
    F_SIZE,
    F_STARTLEN,
    GAP_CLOSED,
    GAP_DELETION,
    GAP_INSERTION,
    NEG_INF,
    NF,
    OP_COMP_BIT,
    OP_DELETION,
    OP_INSERTION,
    OP_MATCH,
    OP_MISMATCH,
    OP_VALID_BIT,
    pack_op,
)

OP_ABANDON_BIT = 1 << 22  # in-store marker: read hit the per-read step cap


class PoolConfig(NamedTuple):
    max_len: int = 128  # M
    lanes: int = 512  # L
    total_steps: int = 16384  # S: shared step budget == store rows / CANDS
    read_step_cap: int = 2048  # abandon a read after this many pops
    max_chains: int = 8192  # compacted hit-chain capacity
    compute_forward_part: bool = False
    # With backward-only models (find_alignment_start == len, the production
    # aDNA model) start+len == n is invariant, so the extension direction is
    # always Backward; setting this statically removes every direction
    # select from the step.
    backward_only: bool = True
    # Performance-ablation flags (tools/ablate_pool.py ONLY -- every flag
    # breaks search semantics; used to attribute per-step cost on real HW):
    #   "pop"    round-robin block selection instead of the two-level pop
    #   "extend" skip the occ-row gathers (synthesize child intervals)
    #   "lut"    skip the score/Bi-D row gather (constant scores)
    #   "frame"  skip the st_pack frame row gather
    #   "store"  skip the st_pack history column write
    #   "ring"   skip the st_mono/bm/sb pop-structure writes
    debug_ablate: tuple = ()
    # Per-read device step accounting for true per-read XD timing (gen-2
    # kernel): logs (read_id, steps consumed) at each lane refill; the
    # engine converts steps to seconds via the invocation's step time.
    track_read_steps: bool = False
    # Fixed step count for ablation timing (0 = normal termination)
    debug_fixed_steps: int = 0


class PoolResult(NamedTuple):
    c_read: jax.Array  # (C,) i32 read id (-1 = unused entry)
    c_slot: jax.Array  # (C,) i32 store slot (descending == completion order)
    c_abandon: jax.Array  # (C,) bool: abandon marker, not a hit
    c_lower: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_lrev: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_size: jax.Array  # (C,) i32 (i64 in big-index mode)
    c_score: jax.Array  # (C,) f32
    c_ops: jax.Array  # (C, MW) i32 op words, 0-terminated
    n_chains: jax.Array  # () i32 (may exceed C -> escalate everything)
    lane_read: jax.Array  # (L,) i32 read id still held per lane (R = none)
    lane_unfinished: jax.Array  # (L,) bool lane held an unfinished read
    next_read: jax.Array  # () i32 pool watermark (reads >= this never ran)
    steps: jax.Array  # () i32
    # (L, S) i32 finish log, rid * 4096 + min(steps, 4095) per refill event,
    # -1 empty; (L, 1) zeros when track_read_steps is off (gen-1: always)
    fin_log: jax.Array = None


@functools.partial(jax.jit, static_argnames=("config",))
def k_mismatch_search_pool(
    index: DeviceFmIndex,
    pattern_rank,  # (R, M) i32
    pattern_code,  # (R, M) i32
    n,  # (R,) i32
    score_lut,  # (R, M, 4) f32
    pen,  # (R, M) f32
    split,  # (R,) i32
    cutoff_scale,  # (R,) f32
    cutoff_thresh,  # (R,) f32
    repr_mm,  # (R,) f32
    params,  # SearchParams
    config: PoolConfig,
) -> PoolResult:
    R, M = pattern_rank.shape
    L = config.lanes
    S = config.total_steps
    # one step per block: every block holds exactly one lane-read's 9
    # candidates, so stale entries never share a block with fresh pushes and
    # all store accesses are contiguous rows
    SLOTS = S * CANDS + 1
    ROOT = SLOTS - 1
    C = config.max_chains
    CAP = config.read_step_cap
    # Live frames are at most CAP steps old (lanes abandon at age CAP and a
    # finished lane's pop row is invalidated), so the pop structures only
    # need a ring of the last CAP+1 step-blocks -- the full-history store
    # (st_pack, needed for chain walking) stays (L, SLOTS).  Each step
    # writes its full (L,) column, so ring reuse can never leak stale
    # entries.  This keeps the per-step pop reductions O(L * CAP) instead
    # of O(L * S).
    RB = min(S, CAP + 1)
    SB = 64  # ring blocks per superblock (pop level 2)
    RBS = (RB + SB - 1) // SB
    RBP = RBS * SB  # ring padded to whole superblocks (pad never written)
    # (key, step) pack: 21 low bits carry step+1 so equal keys resolve to
    # the newest writing step (LIFO); empty blocks are INT64_MIN which
    # sorts below every real pack ((-2^31 << 21) + 1 > INT64_MIN).
    assert S + 1 < (1 << 21), "step budget exceeds pack field"
    STEP_MASK = (1 << 21) - 1
    INT64_MIN = jnp.int64(-(2**63))

    def pack_ks(key, step):
        """i32 block max key + i32 writing step -> order-preserving i64."""
        return (key.astype(jnp.int64) << 21) + (step + 1).astype(jnp.int64)
    lanes = jnp.arange(L, dtype=jnp.int32)
    i32 = jnp.int32
    INT_MIN = jnp.int32(-2147483648)
    # int64 ("big") index mode: interval fields are stored as int32 lo/hi
    # pairs appended to the frame word (the store stays int32 throughout)
    BIG = index.big
    IDT = index.idx_dtype
    NFP = NF + 3 if BIG else NF

    def _pack64(v):  # (..., ) int64 -> lo, hi int32
        pair = jax.lax.bitcast_convert_type(v.astype(jnp.int64), i32)
        return pair[..., 0], pair[..., 1]

    def _unpack64(lo, hi):  # int32 pair -> int64
        return jax.lax.bitcast_convert_type(jnp.stack([lo, hi], axis=-1),
                                            jnp.int64)

    def mono(f):
        u = jax.lax.bitcast_convert_type(f, i32)
        return u ^ ((u >> 31) & 0x7FFFFFFF)

    def mono_inv(k):
        return jax.lax.bitcast_convert_type(
            k ^ ((k >> 31) & 0x7FFFFFFF), jnp.float32
        )

    bid = compute_bi_d(
        index, pattern_rank, pen, n, split,
        compute_forward_part=config.compute_forward_part,
    )
    # fuse the score LUT, base code AND the Bi-D array into ONE
    # row-gatherable table -- they share the rid*M+pos row space, so the
    # step's three table gathers collapse into a single (L, 3)-index one
    # (codes 0..4 are exact in f32)
    slut_flat = jnp.concatenate(
        [
            score_lut.reshape(R * M, 4),
            pattern_code.reshape(R * M, 1).astype(jnp.float32),
            bid.reshape(R * M, 1),
        ],
        axis=1,
    )
    # fuse per-read constants into one row-gatherable i32 table
    consts = jnp.stack(
        [
            n.astype(i32),
            split.astype(i32),
            jax.lax.bitcast_convert_type(cutoff_scale, i32),
            jax.lax.bitcast_convert_type(cutoff_thresh, i32),
            jax.lax.bitcast_convert_type(repr_mm, i32),
        ],
        axis=1,
    )  # (R, 5)

    st_mono = jnp.full((L, RBP, CANDS), INT_MIN, i32)
    # two-level pop index (see module docstring)
    bm_pack = jnp.full((L, RBP), INT64_MIN, jnp.int64)
    sb_pack = jnp.full((L, RBS), INT64_MIN, jnp.int64)
    lane_start = jnp.zeros((L,), i32)
    st_pack = jnp.zeros((L, SLOTS, NFP), i32)

    read_id = jnp.where(lanes < R, lanes, R)
    fresh = read_id < R
    next_read = jnp.int32(min(L, R))
    lane_done = read_id >= R
    lane_age = jnp.zeros((L,), i32)

    def fetch_consts(rid):
        rid_c = jnp.clip(rid, 0, R - 1)
        row = consts[rid_c]  # one (L, 5) row gather
        return (
            row[..., 0],
            row[..., 1],
            jax.lax.bitcast_convert_type(row[..., 2], jnp.float32),
            jax.lax.bitcast_convert_type(row[..., 3], jnp.float32),
            jax.lax.bitcast_convert_type(row[..., 4], jnp.float32),
        )

    c_n, c_split, c_scale, c_thresh, c_repr = fetch_consts(read_id)

    best_score = jnp.full((L,), NEG_INF, jnp.float32)
    best_size = jnp.zeros((L,), IDT)
    hcount = jnp.zeros((L,), i32)

    cand_iota = jax.lax.broadcasted_iota(i32, (L, CANDS), 1)

    state = (st_mono, bm_pack, sb_pack, lane_start, st_pack, read_id, fresh,
             lane_done, next_read, lane_age, c_n, c_split, c_scale, c_thresh,
             c_repr, best_score, best_size, hcount, jnp.int32(0))

    def cond(state):
        lane_done, step = state[7], state[18]
        if config.debug_fixed_steps:
            return step < min(S, config.debug_fixed_steps)
        return jnp.logical_and(step < S, ~jnp.all(lane_done))

    def body(state):
        (st_mono, bm_pack, sb_pack, lane_start, st_pack, read_id, fresh,
         lane_done, next_read, lane_age, c_n, c_split, c_scale, c_thresh,
         c_repr, best_score, best_size, hcount, step) = state

        active = ~lane_done

        # --- pop, level 1: best superblock (pack max == (key, step) lex
        # max == the old flat argmax with LIFO tie-break) ---
        if "pop" in config.debug_ablate:
            sel_block = jnp.broadcast_to(
                jnp.remainder(step, RB).astype(i32), (L,)
            )
            sel_sb = sel_block // SB
            sel_off = sel_block - sel_sb * SB
            mstep = jnp.broadcast_to(jnp.maximum(step - 1, 0), (L,))
            popped = jnp.broadcast_to(step > 0, (L,))
            drow = jnp.zeros((L, SB), jnp.int64)
        else:
            msb = jnp.max(sb_pack, axis=1)
            sel_sb = jnp.argmax(sb_pack == msb[:, None], axis=1).astype(i32)
            # --- level 2: drill into the superblock's 64 block packs; mask
            # out entries from previous (finished) reads of this lane ---
            drow = bm_pack.reshape(L, RBS, SB)[lanes, sel_sb]  # (L, SB)
            dstep = (drow & STEP_MASK).astype(i32) - 1
            drow = jnp.where(dstep >= lane_start[:, None], drow, INT64_MIN)
            mpack = jnp.max(drow, axis=1)
            popped = mpack > INT64_MIN
            sel_off = jnp.argmax(drow == mpack[:, None], axis=1).astype(i32)
            sel_block = sel_sb * SB + sel_off
            mstep = (mpack & STEP_MASK).astype(i32) - 1
        finish_empty = active & ~fresh & ~popped
        working = active & (fresh | popped)

        row = st_mono[lanes, sel_block]  # (L, CANDS) contiguous row gather
        off = jnp.argmax(row, axis=1).astype(i32)
        f_mono = jnp.max(row, axis=1)
        # full-store slot index of the popped frame (for st_pack/parents)
        blk_full = S - 1 - mstep
        sel = blk_full * CANDS + off

        do_pop = working & ~fresh
        if "ring" not in config.debug_ablate:
            row2 = jnp.where(
                (cand_iota == off[:, None]) & do_pop[:, None], INT_MIN, row
            )
            blk_eff = jnp.where(do_pop, sel_block, RBP)
            st_mono = st_mono.at[lanes, blk_eff].set(row2, mode="drop")
            # downdate the popped block's pack and re-max its superblock from
            # the already-gathered drill row
            nbkey = jnp.max(row2, axis=1)
            nbpack = jnp.where(
                nbkey > INT_MIN, pack_ks(nbkey, mstep), INT64_MIN
            )
            bm_pack = bm_pack.at[lanes, blk_eff].set(nbpack, mode="drop")
            sb_iota = jax.lax.broadcasted_iota(i32, (L, SB), 1)
            drow2 = jnp.where(
                sb_iota == sel_off[:, None], nbpack[:, None], drow
            )
            sb_eff = jnp.where(do_pop, sel_sb, RBS)
            sb_pack = sb_pack.at[lanes, sb_eff].set(
                jnp.max(drow2, axis=1), mode="drop"
            )

        if "frame" in config.debug_ablate:
            frame = jnp.zeros((L, NFP), i32)
        else:
            frame = st_pack[lanes, jnp.clip(sel, 0, SLOTS - 1)]
        f_score = jnp.where(fresh, jnp.float32(0.0), mono_inv(f_mono))
        if BIG:
            fr_lower = _unpack64(frame[:, F_LOWER], frame[:, NF + 0])
            fr_lrev = _unpack64(frame[:, F_LREV], frame[:, NF + 1])
            fr_size = _unpack64(frame[:, F_SIZE], frame[:, NF + 2])
        else:
            fr_lower = frame[:, F_LOWER]
            fr_lrev = frame[:, F_LREV]
            fr_size = frame[:, F_SIZE]
        f_lower = jnp.where(fresh, 0, fr_lower)
        f_lrev = jnp.where(fresh, 0, fr_lrev)
        f_size = jnp.where(fresh, jnp.asarray(index.text_len, IDT), fr_size)
        f_start = jnp.where(fresh, c_split, frame[:, F_STARTLEN] >> 16)
        f_len = jnp.where(fresh, 0, frame[:, F_STARTLEN] & 0xFFFF)
        gaps = jnp.where(fresh, 0, frame[:, F_GAPS])
        parent = jnp.where(fresh, ROOT, sel)
        f_gapb = gaps & 3
        f_gapf = (gaps >> 2) & 3
        f_ngaps = (gaps >> 4) & 0xFF
        fresh = jnp.zeros_like(fresh)

        nn = c_n
        if config.backward_only:
            fwd = jnp.zeros_like(lane_done)
            j = f_start - 1
            d_k = f_start - 1
            d_l = f_start + f_len - 1
            ext_lower, ext_lrev = f_lower, f_lrev
            gap_state = f_gapb

            def pick(fv, bv):
                return bv
        else:
            fwd = f_start <= nn - f_start - f_len
            j = jnp.where(fwd, f_start + f_len, f_start - 1)
            d_k = jnp.where(fwd, f_start, f_start - 1)
            d_l = jnp.where(fwd, f_start + f_len, f_start + f_len - 1)
            ext_lower = jnp.where(fwd, f_lrev, f_lower)
            ext_lrev = jnp.where(fwd, f_lower, f_lrev)
            gap_state = jnp.where(fwd, f_gapf, f_gapb)

            def pick(fv, bv):
                return jnp.where(fwd, fv, bv)

        ins_score = (
            jnp.where(gap_state == GAP_INSERTION, params.pge, params.pgo_pge)
            + f_score
        ).astype(jnp.float32)
        del_score = (
            jnp.where(gap_state == GAP_DELETION, params.pge, params.pgo_pge)
            + f_score
        ).astype(jnp.float32)
        ngaps_inc = jnp.where(gap_state == GAP_CLOSED, f_ngaps + 1, f_ngaps)

        rid_c = jnp.clip(read_id, 0, R - 1)
        j_c = jnp.clip(j, 0, M - 1)
        base = rid_c * M
        bk = jnp.clip(d_k, 0, M - 1)
        t = nn - (1 + d_l)
        ci = jnp.clip(t + c_split, 0, M - 1)
        if "lut" in config.debug_ablate:
            Sj = jnp.full((L, 4), -1.0, jnp.float32)
            pat_j = jnp.zeros((L,), i32)
            lb = jnp.zeros((L,), jnp.float32)
        else:
            rows3 = slut_flat[
                jnp.stack([base + j_c, base + bk, base + ci], axis=1)
            ]  # (L, 3, 6): one gather for scores+code+both Bi-D reads
            Sj = rows3[:, 0, :4]
            pat_j = rows3[:, 0, 4].astype(i32)
            d_rev = jnp.where(
                (d_k >= 0) & (d_k < nn), rows3[:, 1, 5], jnp.float32(0.0)
            )
            d_fwd = jnp.where(
                (t >= 0) & (t + c_split < nn), rows3[:, 2, 5], jnp.float32(0.0)
            )
            lb = (d_rev + d_fwd).astype(jnp.float32)

        def reject(v):
            return (v / c_scale) < c_thresh

        stop = (f_score + lb).astype(jnp.float32) < best_score + c_repr
        abandon = working & (lane_age >= CAP)
        finish_stop = working & stop & ~abandon
        still = working & ~stop & ~abandon

        if "extend" in config.debug_ablate:
            q = (f_size // 4).astype(IDT)
            ch_size = jnp.stack([q, q, q, f_size - 3 * q], axis=1)
            ch_lower = ext_lower[:, None] + ch_size
            ch_lrev = ext_lrev[:, None] + ch_size
        else:
            ch_lower, ch_lrev, ch_size = extend_batch(
                index, ext_lower, ext_lrev, f_size
            )
        if config.backward_only:
            out_lower, out_lrev = ch_lower, ch_lrev
        else:
            out_lower = jnp.where(fwd[:, None], ch_lrev, ch_lower)
            out_lrev = jnp.where(fwd[:, None], ch_lower, ch_lrev)

        ins_allowed = jnp.minimum(j, nn - j - 1) >= params.gap_dist_ends
        d5 = pick(j, j + 1)
        del_allowed = jnp.minimum(d5, nn - d5) >= params.gap_dist_ends
        next_start = pick(f_start, f_start - 1)
        del_rej = reject((del_score + lb).astype(jnp.float32))
        ins_rej = reject((ins_score + lb).astype(jnp.float32))

        c_ok, c_score = [], []
        cl_lower, cl_lrev, cl_size = [], [], []
        c_startlen, c_gaps, c_op = [], [], []

        def gaps_word(gb, gf, ng):
            return gb | (gf << 2) | (ng << 4)

        ok = still & ~ins_rej & ins_allowed & (ngaps_inc <= params.max_gaps)
        c_ok.append(ok)
        c_score.append(ins_score)
        cl_lower.append(f_lower)
        cl_lrev.append(f_lrev)
        cl_size.append(f_size)
        c_startlen.append((next_start << 16) | (f_len + 1))
        c_gaps.append(
            gaps_word(
                pick(f_gapb, GAP_INSERTION),
                pick(GAP_INSERTION, f_gapf),
                ngaps_inc,
            )
        )
        c_op.append(pack_op(OP_INSERTION, j_c, 0))

        for slot in range(4):
            s_lower = out_lower[:, slot]
            s_lrev = out_lrev[:, slot]
            s_size = ch_size[:, slot]
            nonzero = s_size >= 1
            code = pick(slot, 3 - slot)
            mm_score = (Sj[lanes, code] + f_score).astype(jnp.float32)

            ok = (
                still & nonzero & ~del_rej & del_allowed
                & (ngaps_inc <= params.max_gaps)
            )
            c_ok.append(ok)
            c_score.append(del_score)
            cl_lower.append(s_lower)
            cl_lrev.append(s_lrev)
            cl_size.append(s_size)
            c_startlen.append((f_start << 16) | f_len)
            c_gaps.append(
                gaps_word(
                    pick(f_gapb, GAP_DELETION),
                    pick(GAP_DELETION, f_gapf),
                    ngaps_inc,
                )
            )
            c_op.append(pack_op(OP_DELETION, j_c, code))

            ok = still & nonzero & ~reject((mm_score + lb).astype(jnp.float32))
            kind = jnp.where(code == pat_j, OP_MATCH, OP_MISMATCH)
            c_ok.append(ok)
            c_score.append(mm_score)
            cl_lower.append(s_lower)
            cl_lrev.append(s_lrev)
            cl_size.append(s_size)
            c_startlen.append((next_start << 16) | (f_len + 1))
            c_gaps.append(
                gaps_word(
                    pick(f_gapb, GAP_CLOSED),
                    pick(GAP_CLOSED, f_gapf),
                    f_ngaps,
                )
            )
            c_op.append(pack_op(kind, j_c, code))

        score9 = jnp.stack(c_score, axis=1)
        size9 = jnp.stack(cl_size, axis=1)
        len9 = jnp.stack(c_startlen, axis=1) & 0xFFFF
        ok_cols, comp_cols = [], []
        run_best, run_size = best_score, best_size
        for k in range(CANDS):
            ok_k = c_ok[k] & ~(score9[:, k] < run_best + c_repr)
            comp_k = ok_k & (len9[:, k] == nn)
            upd = comp_k & (score9[:, k] > run_best)
            run_size = jnp.where(upd, size9[:, k], run_size)
            run_best = jnp.where(upd, score9[:, k], run_best)
            ok_cols.append(ok_k)
            comp_cols.append(comp_k)
        best_score, best_size = run_best, run_size
        ok9 = jnp.stack(ok_cols, axis=1)
        comp9 = jnp.stack(comp_cols, axis=1)
        push9 = ok9 & ~comp9

        # completion/abandon entries carry the owning read id in gaps
        gaps9 = jnp.stack(c_gaps, axis=1)
        op9 = (
            jnp.stack(c_op, axis=1)
            | jnp.where(comp9, OP_COMP_BIT, 0).astype(i32)
        )
        # abandon marker rides candidate 0's slot
        op9 = op9.at[:, 0].set(
            jnp.where(abandon, OP_VALID_BIT | OP_ABANDON_BIT, op9[:, 0])
        )
        record9 = comp9.at[:, 0].set(comp9[:, 0] | abandon)
        gaps9 = jnp.where(record9, read_id[:, None], gaps9)
        lower9 = jnp.stack(cl_lower, axis=1)
        lrev9 = jnp.stack(cl_lrev, axis=1)
        if BIG:
            lower9_lo, lower9_hi = _pack64(lower9)
            lrev9_lo, lrev9_hi = _pack64(lrev9)
            size9_lo, size9_hi = _pack64(size9)
            extra = [lower9_hi, lrev9_hi, size9_hi]
        else:
            lower9_lo, lrev9_lo, size9_lo = lower9, lrev9, size9
            extra = []
        pack9 = jnp.stack(
            [
                lower9_lo,
                lrev9_lo,
                size9_lo,
                jnp.broadcast_to(parent[:, None], (L, CANDS)),
                jnp.stack(c_startlen, axis=1),
                gaps9,
                op9,
                jax.lax.bitcast_convert_type(score9, i32),
            ]
            + extra,
            axis=2,
        )
        # the full store still grows downward (block for step s is S-1-s);
        # the pop structures live at the same block index modulo the ring
        blk = S - 1 - step
        base_slot = blk * CANDS
        if "store" not in config.debug_ablate:
            st_pack = jax.lax.dynamic_update_slice(
                st_pack, pack9[:, ::-1, :],
                (jnp.int32(0), base_slot, jnp.int32(0)),
            )
        if "ring" not in config.debug_ablate:
            mono9 = jnp.where(push9, mono(score9), INT_MIN)[:, ::-1]
            ring_blk = jnp.remainder(blk, RB)
            st_mono = jax.lax.dynamic_update_slice(
                st_mono, mono9[:, None, :],
                (jnp.int32(0), ring_blk, jnp.int32(0)),
            )
            bkey = jnp.max(mono9, axis=1)
            bpack = jnp.where(bkey > INT_MIN, pack_ks(bkey, step), INT64_MIN)
            bm_pack = jax.lax.dynamic_update_slice(
                bm_pack, bpack[:, None], (jnp.int32(0), ring_blk)
            )
            # max-combine into the slot's superblock.  Within a read's
            # lifetime every ring slot is written at most once (CAP < RB), so
            # overwriting can only bury packs of already-finished reads whose
            # superblock entries were cleared at refill -- no stale-high risk.
            ring_sb = ring_blk // SB
            old_sb = jax.lax.dynamic_slice(
                sb_pack, (jnp.int32(0), ring_sb), (L, 1)
            )
            sb_pack = jax.lax.dynamic_update_slice(
                sb_pack, jnp.maximum(old_sb, bpack[:, None]),
                (jnp.int32(0), ring_sb),
            )

        hcount = hcount + jnp.sum(comp9, axis=1, dtype=i32)
        finish_hits = still & ((hcount > 9) | (best_size > 1))

        # --- refill finished lanes from the pool ---
        finish = finish_empty | finish_stop | finish_hits | abandon
        rank = jnp.cumsum(finish.astype(i32)) - finish.astype(i32)
        new_rid = next_read + rank
        read_id = jnp.where(finish, jnp.minimum(new_rid, R), read_id)
        next_read = jnp.minimum(next_read + jnp.sum(finish, dtype=i32), R)
        got_read = finish & (new_rid < R)
        fresh = got_read
        lane_done = lane_done | (finish & (new_rid >= R))
        # unreachable-ify the finished read's remaining frames: clear the
        # lane's superblock row (selection level) and advance the step
        # watermark (drill level filters by it); no full-ring pass needed
        sb_pack = jnp.where(finish[:, None], INT64_MIN, sb_pack)
        lane_start = jnp.where(finish, step + 1, lane_start)

        lane_age = jnp.where(finish, 0, lane_age + active.astype(i32))
        best_score = jnp.where(finish, NEG_INF, best_score)
        best_size = jnp.where(finish, 0, best_size)
        hcount = jnp.where(finish, 0, hcount)
        nc = fetch_consts(read_id)
        c_n = jnp.where(finish, nc[0], c_n)
        c_split = jnp.where(finish, nc[1], c_split)
        c_scale = jnp.where(finish, nc[2], c_scale)
        c_thresh = jnp.where(finish, nc[3], c_thresh)
        c_repr = jnp.where(finish, nc[4], c_repr)

        return (st_mono, bm_pack, sb_pack, lane_start, st_pack, read_id,
                fresh, lane_done, next_read, lane_age, c_n, c_split, c_scale,
                c_thresh, c_repr, best_score, best_size, hcount, step + 1)

    state = jax.lax.while_loop(cond, body, state)
    (st_mono, bm_pack, sb_pack, lane_start, st_pack, read_id, fresh,
     lane_done, next_read, lane_age, c_n, c_split, c_scale, c_thresh, c_repr,
     best_score, best_size, hcount, steps) = state

    lane_unfinished = ~lane_done & (read_id < R)

    # --- compact completion/abandon entries across the whole store ---
    slot_iota = jax.lax.broadcasted_iota(i32, (L, SLOTS), 1)
    op_col = st_pack[:, :, F_OP]
    comp_mask = (op_col & (OP_COMP_BIT | OP_ABANDON_BIT)) != 0
    flat_mask = comp_mask.reshape(L * SLOTS)
    rank = jnp.cumsum(flat_mask.astype(i32)) - flat_mask.astype(i32)
    n_chains = jnp.sum(flat_mask, dtype=i32)
    dst = jnp.where(flat_mask & (rank < C), rank, C)
    flat_lane = (
        jax.lax.broadcasted_iota(i32, (L, SLOTS), 0).reshape(L * SLOTS)
    )
    flat_slot = slot_iota.reshape(L * SLOTS)
    c_lane = jnp.zeros((C,), i32).at[dst].set(flat_lane, mode="drop")
    c_slot = jnp.zeros((C,), i32).at[dst].set(flat_slot, mode="drop")
    valid_chain = jnp.arange(C, dtype=i32) < jnp.minimum(n_chains, C)

    entry = st_pack[c_lane, c_slot]  # (C, NFP)
    c_abandon = (entry[:, F_OP] & OP_ABANDON_BIT) != 0
    c_read = jnp.where(valid_chain, entry[:, F_GAPS], -1)
    if BIG:
        c_lower = _unpack64(entry[:, F_LOWER], entry[:, NF + 0])
        c_lrev = _unpack64(entry[:, F_LREV], entry[:, NF + 1])
        c_size = _unpack64(entry[:, F_SIZE], entry[:, NF + 2])
    else:
        c_lower = entry[:, F_LOWER]
        c_lrev = entry[:, F_LREV]
        c_size = entry[:, F_SIZE]
    c_score = jax.lax.bitcast_convert_type(entry[:, F_SCOREBITS], jnp.float32)

    MW = M + 16
    walk_valid = valid_chain & ~c_abandon
    node0 = jnp.where(walk_valid, entry[:, F_PARENT], ROOT)
    op0 = jnp.where(walk_valid, entry[:, F_OP], 0)

    def walk(carry, _):
        node = carry
        e = st_pack[c_lane, node]
        at_root = node == ROOT
        word = jnp.where(at_root, 0, e[:, F_OP])
        nxt = jnp.where(at_root, ROOT, e[:, F_PARENT])
        return nxt, word

    _, words = jax.lax.scan(walk, node0, None, length=MW - 1)
    c_ops = jnp.concatenate([op0[None, :], words], axis=0).T  # (C, MW)

    return PoolResult(
        c_read=c_read, c_slot=c_slot, c_abandon=c_abandon & valid_chain,
        c_lower=c_lower, c_lrev=c_lrev, c_size=c_size, c_score=c_score,
        c_ops=c_ops, n_chains=n_chains,
        lane_read=read_id, lane_unfinished=lane_unfinished,
        next_read=next_read, steps=steps,
        fin_log=jnp.zeros((config.lanes, 1), jnp.int32),
    )
