"""Persistent-pool search, generation 2: scatter-free step.

Same semantics as ops/search_pool.py (strict best-first pop order with LIFO
tie-breaks, identical f32 score arithmetic, per-read step cap with abandon
markers, hits in the store) but the step is restructured around what the
round-2 on-chip profile showed actually costs time (tools/ablate_pool.py +
trace): per-lane scatters (~45 us each), the st_mono HBM<->VMEM round trip
they force (~100 us), and ~245 tiny-op launch overheads.

Key changes vs gen 1:

- **No st_mono score ring and no scatters.**  Candidate scores are
  re-derived from the frame store itself: each pushed candidate's op word
  carries OP_PUSHED_BIT, and the popped block's 9 records are fetched with
  one (L, 9, NF) gather; the monotone i32 pop keys are recomputed from the
  stored f32 score bits.  Pop bookkeeping is two small dense arrays --
  `consumed` (L, RB) 9-bit masks and `bm_key` (L, RB) per-block max keys --
  updated with masked elementwise passes (vectorizes on the VPU) and
  scalar-index column writes (cheap DUS), never scattered.
- **No packed (key, step) i64 and no superblock level.**  The LIFO
  tie-break uses ring geometry: the step that wrote ring slot s is
  T-1 - ((T-1-s) mod RB), so "latest step among equal keys" is "minimum
  age", a second small (L, RB) pass.  Everything stays int32.
- The ring is sized by the per-read step cap (RB = CAP+1): a live read's
  frames are at most CAP steps old, and a lane-start watermark filters
  dead blocks of earlier reads, exactly as in gen 1.

Reference semantics: src/map/mapping.rs:1012-1383 (k_mismatch_search),
src/map/fmd_index.rs:108-182 (extension sweep); equivalence to the host
oracle is property-tested in tests/test_device_search.py.

NOTE on the pop structure: a two-level group index over the ring (scan
(L, G=RB/64) group maxima instead of the dense (L, RB) arrays) was built in
round 2 to decouple pop cost from the step cap, but chip measurement in
round 3 showed it 6.5x SLOWER end to end (402 vs 62 us/step at CAP=1024,
tools/probe_ab.py: the per-step (L, 64) dynamic-offset gather used to
re-derive a group plus the extra carries cost far more than the dense
masked passes they replaced).  The dense single-level pop below is the
production design; pop cost is O(L*RB) HBM traffic per step, which stays
off the critical path through CAP=4096.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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
from .search_pool import OP_ABANDON_BIT, PoolConfig, PoolResult

OP_PUSHED_BIT = 1 << 23  # op word of a live (poppable) pushed frame


@functools.partial(jax.jit, static_argnames=("config",))
def k_mismatch_search_pool2(
    index: DeviceFmIndex,
    pattern_rank,  # (R, M) i32 ((R, 0) placeholder with slut_packed)
    pattern_code,  # (R, M) i32 (placeholder with slut_packed)
    n,  # (R,) i32
    score_lut,  # (R, M, 4) f32 (placeholder with slut_packed)
    pen,  # (R, M) f32 (placeholder with slut_packed)
    split,  # (R,) i32
    cutoff_scale,  # (R,) f32
    cutoff_thresh,  # (R,) f32
    repr_mm,  # (R,) f32
    params,  # SearchParams
    config: PoolConfig,
    slut_packed=None,  # (ceil(R*M/16), 128) f32 host-packed LUT+Bi-D table
) -> PoolResult:
    """With slut_packed (host C++ Bi-D + numpy packing, engine._prepare),
    the ~150 ms device Bi-D prologue and the LUT packing are skipped; the
    table layout must match the device packing below exactly."""
    R = n.shape[0]
    M = pattern_rank.shape[1] if pattern_rank.shape[1] else config.max_len
    L = config.lanes
    S = config.total_steps
    SLOTS = S * CANDS + 1
    ROOT = SLOTS - 1
    C = config.max_chains
    CAP = config.read_step_cap
    RB = min(S, CAP + 1)
    assert L * SLOTS < 2**31, "compaction keys exceed int32"
    i32 = jnp.int32
    INT_MIN = jnp.int32(-2147483648)
    lanes = jnp.arange(L, dtype=i32)
    cand_iota = jax.lax.broadcasted_iota(i32, (L, CANDS), 1)
    slot_iota = jax.lax.broadcasted_iota(i32, (L, RB), 1)

    BIG = index.big
    IDT = index.idx_dtype
    NFP = NF + 3 if BIG else NF
    # One 512 B store row per step-block: 9 candidate records of NFP words
    # (72 small / 99 big) padded to 128 int32.  A popped block is then ONE
    # aligned-granule row gather per lane (~2.6 ns/row measured) instead of
    # nine 32 B rows (~64 us/step in the round-2 trace).
    BW = 128
    assert CANDS * NFP <= BW

    def _pack64(v):
        pair = jax.lax.bitcast_convert_type(v.astype(jnp.int64), i32)
        return pair[..., 0], pair[..., 1]

    def _unpack64(lo, hi):
        return jax.lax.bitcast_convert_type(jnp.stack([lo, hi], axis=-1),
                                            jnp.int64)

    def mono(f):
        u = jax.lax.bitcast_convert_type(f, i32)
        return u ^ ((u >> 31) & 0x7FFFFFFF)

    def mono_bits(u):
        return u ^ ((u >> 31) & 0x7FFFFFFF)

    def mono_inv(k):
        return jax.lax.bitcast_convert_type(
            k ^ ((k >> 31) & 0x7FFFFFFF), jnp.float32
        )

    # One 512 B row per read-position (score4 | code | bid | 122 pad f32):
    # the per-step lookup is then a direct aligned-granule HBM row gather
    # with STATIC word extracts.  The 16-positions-per-row packing this
    # replaces measured 23 us/step of whole-table VMEM staging (XLA
    # prefetched the 16 MB table twice per step) plus 28 us/step of dynamic
    # sub-row selects (take_along_axis) on chip; at R*M rows the table
    # (~270 MB) cannot be VMEM-staged, forcing the fast direct-gather path
    # (same as the occ rows, ~2 us/step).  Built on device from the 32 B/row
    # payload so the host->device transfer stays small.
    if slut_packed is not None:
        # 6 f32 per row (score[4], code, bid): the upload payload; the two
        # always-zero pad words live only in the on-device padded rows
        assert slut_packed.shape == (R * M, 6), slut_packed.shape
        slut6 = slut_packed
    else:
        bid = compute_bi_d(
            index, pattern_rank, pen, n, split,
            compute_forward_part=config.compute_forward_part,
        )
        slut6 = jnp.concatenate(
            [
                score_lut.reshape(R * M, 4),
                pattern_code.reshape(R * M, 1).astype(jnp.float32),
                bid.reshape(R * M, 1),
            ],
            axis=1,
        )
    # the barrier forces the padded table to materialize in HBM -- XLA must
    # not fuse the pad into the per-step gathers (that re-reads the narrow
    # 24 B rows the layout exists to avoid)
    slut_rows = jax.lax.optimization_barrier(
        jnp.pad(slut6, ((0, 0), (0, 122)))
    )
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
    # refills assign read ids sequentially from next_read, so the consts
    # rows a step needs are one contiguous window: a dynamic slice plus an
    # integer one-hot select replaces a per-row gather (~35 us/step on v5e)
    consts_pad = jnp.pad(consts, ((0, L), (0, 0)))

    consumed = jnp.zeros((L, RB), i32)
    bm_key = jnp.full((L, RB), INT_MIN, i32)
    lane_start = jnp.zeros((L,), i32)
    st_pack = jnp.zeros((L, S + 1, BW), i32)  # block b = slots b*9..b*9+8

    read_id = jnp.where(lanes < R, lanes, R)
    fresh = read_id < R
    next_read = jnp.int32(min(L, R))
    lane_done = read_id >= R
    lane_age = jnp.zeros((L,), i32)

    def fetch_consts(rid):
        rid_c = jnp.clip(rid, 0, R - 1)
        row = consts[rid_c]
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

    fin_log = jnp.full(
        (L, S if config.track_read_steps else 1), -1, jnp.int32
    )
    state = (consumed, bm_key, lane_start, st_pack, read_id, fresh,
             lane_done, next_read, lane_age, c_n, c_split, c_scale, c_thresh,
             c_repr, best_score, best_size, hcount, fin_log, jnp.int32(0))

    def cond(state):
        lane_done, step = state[6], state[18]
        if config.debug_fixed_steps:
            return step < min(S, config.debug_fixed_steps)
        return jnp.logical_and(step < S, ~jnp.all(lane_done))

    def body(state):
        (consumed, bm_key, lane_start, st_pack, read_id, fresh,
         lane_done, next_read, lane_age, c_n, c_split, c_scale, c_thresh,
         c_repr, best_score, best_size, hcount, fin_log, step) = state

        active = ~lane_done

        # --- pop: dense block scan (key max, then LIFO = min ring age) ---
        age = jnp.remainder(step - 1 - slot_iota, RB)
        t_s = step - 1 - age
        keym = jnp.where(
            (t_s >= lane_start[:, None]) & (bm_key > INT_MIN),
            bm_key, INT_MIN,
        )
        kstar = jnp.max(keym, axis=1)
        popped = kstar > INT_MIN
        agem = jnp.where(keym == kstar[:, None], age, RB)
        astar = jnp.min(agem, axis=1)
        pstep = step - 1 - astar
        sel_slot = jnp.remainder(pstep, RB)
        sel_col = slot_iota == sel_slot[:, None]
        cword = jnp.sum(jnp.where(sel_col, consumed, 0), axis=1, dtype=i32)

        finish_empty = active & ~fresh & ~popped
        working = active & (fresh | popped)
        do_pop = working & ~fresh

        # --- fetch the popped block's 9 candidate records (one row/lane) ---
        blk_full = jnp.clip(S - 1 - pstep, 0, S - 1)
        brow = st_pack[lanes, blk_full]  # (L, BW)
        rows9 = brow[:, : CANDS * NFP].reshape(L, CANDS, NFP)
        op9s = rows9[:, :, F_OP]
        live9 = ((op9s & OP_PUSHED_BIT) != 0) & (
            ((cword[:, None] >> cand_iota) & 1) == 0
        )
        key9 = jnp.where(live9, mono_bits(rows9[:, :, F_SCOREBITS]), INT_MIN)
        off = jnp.argmax(key9, axis=1).astype(i32)
        f_mono = jnp.max(key9, axis=1)
        sel = blk_full * CANDS + off  # full-store slot of the popped frame

        # --- consume it: masked pass over the two small pop arrays ---
        newbit = jnp.where(do_pop, 1 << off, 0)
        cword2 = cword | newbit
        live9b = live9 & (cand_iota != off[:, None])
        newkey = jnp.max(
            jnp.where(live9b, key9, INT_MIN), axis=1
        )
        updm = sel_col & do_pop[:, None]
        consumed = jnp.where(updm, cword2[:, None], consumed)
        bm_key = jnp.where(updm, newkey[:, None], bm_key)

        frame = jnp.sum(
            jnp.where((cand_iota == off[:, None])[:, :, None], rows9, 0),
            axis=1, dtype=i32,
        )  # (L, NFP) masked reduce instead of a second gather
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
        if config.backward_only:
            # bk == j_c (d_k == j == f_start - 1) and split == n makes the
            # forward-D guard t + split < n statically false: ONE row
            # gather serves Sj, pat_j and d_rev; d_fwd is identically 0.
            row_j = slut_rows[base + j_c]  # (L, 128)
            d_rev = jnp.where(
                (d_k >= 0) & (d_k < nn), row_j[:, 5], jnp.float32(0.0)
            )
            d_fwd = jnp.float32(0.0)
        else:
            ci = jnp.clip(t + c_split, 0, M - 1)
            rows3 = slut_rows[
                jnp.stack([base + j_c, base + bk, base + ci], axis=1)
            ]  # (L, 3, 128)
            row_j = rows3[:, 0]
            d_rev = jnp.where(
                (d_k >= 0) & (d_k < nn), rows3[:, 1, 5], jnp.float32(0.0)
            )
            d_fwd = jnp.where(
                (t >= 0) & (t + c_split < nn), rows3[:, 2, 5],
                jnp.float32(0.0),
            )
        Sj = row_j[:, :4]  # (L, 4) static extracts
        pat_j = row_j[:, 4].astype(i32)
        lb = (d_rev + d_fwd).astype(jnp.float32)

        def reject(v):
            return (v / c_scale) < c_thresh

        stop = (f_score + lb).astype(jnp.float32) < best_score + c_repr
        abandon = working & (lane_age >= CAP)
        finish_stop = working & stop & ~abandon
        still = working & ~stop & ~abandon

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
            # arithmetic select of Sj[:, code] (code is per-lane only in
            # bidirectional mode; backward-only folds to a static column)
            if config.backward_only:
                sj_c = Sj[:, 3 - slot]
            else:
                sj_c = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(i32, (L, 4), 1)
                        == code[:, None],
                        Sj, jnp.float32(0.0),
                    ),
                    axis=1, dtype=jnp.float32,
                )
            mm_score = (sj_c + f_score).astype(jnp.float32)

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

        gaps9 = jnp.stack(c_gaps, axis=1)
        op9 = (
            jnp.stack(c_op, axis=1)
            | jnp.where(comp9, OP_COMP_BIT, 0).astype(i32)
            | jnp.where(push9, OP_PUSHED_BIT, 0).astype(i32)
        )
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
        # store block for step s lives at row S-1-s (store grows downward
        # so newest-first collector order is slot-descending)
        blk = S - 1 - step
        rowpack = jnp.concatenate(
            [
                pack9[:, ::-1, :].reshape(L, CANDS * NFP),
                jnp.zeros((L, BW - CANDS * NFP), i32),
            ],
            axis=1,
        )[:, None, :]
        st_pack = jax.lax.dynamic_update_slice(
            st_pack, rowpack, (jnp.int32(0), blk, jnp.int32(0))
        )
        # push column into the pop arrays at the (scalar) ring slot
        mono9 = jnp.where(push9, mono(score9), INT_MIN)[:, ::-1]
        ring_slot = jnp.remainder(step, RB)
        bm_key = jax.lax.dynamic_update_slice(
            bm_key, jnp.max(mono9, axis=1, keepdims=True),
            (jnp.int32(0), ring_slot),
        )
        consumed = jax.lax.dynamic_update_slice(
            consumed, jnp.zeros((L, 1), i32), (jnp.int32(0), ring_slot)
        )

        hcount = hcount + jnp.sum(comp9, axis=1, dtype=i32)
        finish_hits = still & ((hcount > 9) | (best_size > 1))

        # --- refill finished lanes from the pool ---
        finish = finish_empty | finish_stop | finish_hits | abandon
        rank = jnp.cumsum(finish.astype(i32)) - finish.astype(i32)
        new_rid = next_read + rank
        if config.track_read_steps:
            # log (read id, steps consumed incl. this one) per finish event
            ev = jnp.where(
                finish,
                jnp.clip(read_id, 0, R) * 4096
                + jnp.minimum(lane_age + active.astype(i32), 4095),
                -1,
            )
            fin_log = jax.lax.dynamic_update_slice(
                fin_log, ev[:, None], (jnp.int32(0), step)
            )
        read_id = jnp.where(finish, jnp.minimum(new_rid, R), read_id)
        win = jax.lax.dynamic_slice(
            consts_pad, (next_read, jnp.int32(0)), (L, 5)
        )  # rows for reads [next_read, next_read + L)
        next_read = jnp.minimum(next_read + jnp.sum(finish, dtype=i32), R)
        got_read = finish & (new_rid < R)
        fresh = got_read
        lane_done = lane_done | (finish & (new_rid >= R))
        # the watermark makes every old block of this lane ineligible
        lane_start = jnp.where(finish, step + 1, lane_start)

        lane_age = jnp.where(finish, 0, lane_age + active.astype(i32))
        best_score = jnp.where(finish, NEG_INF, best_score)
        best_size = jnp.where(finish, 0, best_size)
        hcount = jnp.where(finish, 0, hcount)
        # one-hot select window row `rank` for finishing lanes (int-exact)
        src = jax.lax.broadcasted_iota(i32, (L, L), 1)
        sel_row = src == rank[:, None]
        nc = jnp.sum(
            jnp.where(sel_row[:, :, None], win[None, :, :], 0),
            axis=1, dtype=i32,
        )  # (L, 5)
        c_n = jnp.where(finish, nc[:, 0], c_n)
        c_split = jnp.where(finish, nc[:, 1], c_split)
        c_scale = jnp.where(
            finish, jax.lax.bitcast_convert_type(nc[:, 2], jnp.float32),
            c_scale,
        )
        c_thresh = jnp.where(
            finish, jax.lax.bitcast_convert_type(nc[:, 3], jnp.float32),
            c_thresh,
        )
        c_repr = jnp.where(
            finish, jax.lax.bitcast_convert_type(nc[:, 4], jnp.float32),
            c_repr,
        )

        return (consumed, bm_key, lane_start, st_pack, read_id, fresh,
                lane_done, next_read, lane_age, c_n, c_split, c_scale,
                c_thresh, c_repr, best_score, best_size, hcount, fin_log,
                step + 1)

    MW = M + 16
    NB9 = S + 1  # physical block rows (block S = ROOT, all zero)

    def extract_chains(st_pack, slot_shift=None):
        """Compact completion/abandon entries out of the store, two-stage
        (a flat sort over L*SLOTS keys cost ~278 ms/invocation on chip; the
        gen-1 scatter ~700): stage 1 reduces each 9-candidate block to a
        bitmask, stage 2 top_k's the ~9x-smaller block keys, stage 3
        expands the selected blocks and orders their set bits with a small
        top_k.  Runs once post-loop (generations == 1) or at every store
        boundary plus once post-loop (generations > 1); `slot_shift`
        (9 x cumulative compaction shift) converts in-store slots to
        GLOBAL completion-order keys so per-read hit order is preserved
        across generations.  Valid entries form a prefix (top_k orders the
        distinct negative linear keys before the INT_MIN padding).

        Returns (n_ext, n_chains, read, slot, abandon, lower, lrev, size,
        score, ops)."""
        op9_col = st_pack[:, :, [c * NFP + F_OP for c in range(CANDS)]]
        comp_mask = (
            (op9_col & (OP_COMP_BIT | OP_ABANDON_BIT)) != 0
        )  # (L, NB9, 9)
        n_chains = jnp.sum(comp_mask, dtype=i32)
        blk_bits = jnp.sum(
            jnp.where(
                comp_mask,
                jnp.int32(1)
                << jax.lax.broadcasted_iota(i32, (L, NB9, CANDS), 2),
                0,
            ),
            axis=2,
            dtype=i32,
        )  # (L, NB9) 9-bit occupancy per block
        lin_b = jax.lax.broadcasted_iota(i32, (L, NB9), 0) * NB9 + (
            jax.lax.broadcasted_iota(i32, (L, NB9), 1)
        )
        bkeys = jnp.where(blk_bits != 0, -lin_b, INT_MIN).reshape(L * NB9)
        btop, _ = jax.lax.top_k(bkeys, C)  # ascending (lane, block) order
        bvalid = btop > INT_MIN
        bpos = jnp.where(bvalid, -btop, 0)
        b_lane = bpos // NB9
        b_blk = bpos - b_lane * NB9
        bits = jnp.where(bvalid, blk_bits[b_lane, b_blk], 0)  # (C,)
        # expand: entry k of block b in (lane, slot) order; keep the first C
        cand9 = jax.lax.broadcasted_iota(i32, (C, CANDS), 1)
        set_mask = ((bits[:, None] >> cand9) & 1) != 0
        exp_lin = jnp.where(
            set_mask,
            -(jax.lax.broadcasted_iota(i32, (C, CANDS), 0) * CANDS + cand9),
            INT_MIN,
        ).reshape(C * CANDS)
        etop, _ = jax.lax.top_k(exp_lin, C)
        valid_chain = etop > INT_MIN
        epos = jnp.where(valid_chain, -etop, 0)
        e_row = epos // CANDS
        e_cand = epos - e_row * CANDS
        c_lane = b_lane[e_row]
        c_slot = b_blk[e_row] * CANDS + e_cand

        rows_c = st_pack[c_lane, c_slot // CANDS]  # (C, BW)
        base_c = (c_slot % CANDS) * NFP

        def fld(f):
            return jnp.take_along_axis(
                rows_c, (base_c + f)[:, None], axis=1
            )[:, 0]

        e_op = fld(F_OP)
        c_abandon = ((e_op & OP_ABANDON_BIT) != 0) & valid_chain
        c_read = jnp.where(valid_chain, fld(F_GAPS), -1)
        if BIG:
            c_lower = _unpack64(fld(F_LOWER), fld(NF + 0))
            c_lrev = _unpack64(fld(F_LREV), fld(NF + 1))
            c_size = _unpack64(fld(F_SIZE), fld(NF + 2))
        else:
            c_lower = fld(F_LOWER)
            c_lrev = fld(F_LREV)
            c_size = fld(F_SIZE)
        c_score = jax.lax.bitcast_convert_type(fld(F_SCOREBITS), jnp.float32)

        walk_valid = valid_chain & ~c_abandon
        node0 = jnp.where(walk_valid, fld(F_PARENT), ROOT)
        op0 = jnp.where(walk_valid, e_op, 0)

        def walk(carry, _):
            node = carry
            rows = st_pack[c_lane, node // CANDS]  # (C, BW)
            cand = node % CANDS

            def nfld(f):
                # static slices + arithmetic one-hot over the 9 candidate
                # offsets: ~8x cheaper than a 128-wide take_along_axis on
                # chip
                cols = jnp.stack(
                    [rows[:, c * NFP + f] for c in range(CANDS)], axis=1
                )  # (C, 9)
                hit = (
                    jax.lax.broadcasted_iota(i32, cols.shape, 1)
                    == cand[:, None]
                )
                return jnp.sum(jnp.where(hit, cols, 0), axis=1, dtype=i32)

            at_root = node == ROOT
            word = jnp.where(at_root, 0, nfld(F_OP))
            nxt = jnp.where(at_root, ROOT, nfld(F_PARENT))
            return nxt, word

        _, words = jax.lax.scan(walk, node0, None, length=MW - 1)
        c_ops = jnp.concatenate([op0[None, :], words], axis=0).T  # (C, MW)
        n_ext = jnp.sum(valid_chain, dtype=i32)
        out_slot = c_slot if slot_shift is None else c_slot - slot_shift
        return (n_ext, n_chains, c_read, out_slot, c_abandon, c_lower,
                c_lrev, c_size, c_score, c_ops)

    def fold_read_steps(fin_log, acc_rs):
        """Reduce the (L, S) finish log into the (R+1,) per-read step
        accumulator: each read refills (and so logs) at most once per
        generation, and the fetch then ships R ints instead of the L*S
        log (reference emits per-read wall time as the XD tag,
        mapping.rs:912-918; the device-native analogue is steps x
        measured step time)."""
        ev = fin_log.reshape(-1)
        rid = jnp.where(ev >= 0, ev // 4096, R)
        return acc_rs.at[rid].max(ev % 4096)

    GENS = max(1, int(config.generations))
    if GENS == 1:
        state = jax.lax.while_loop(cond, body, state)
    else:
        # --- generational store compaction: when the store fills with
        # lanes still live, extract this generation's completed chains,
        # shift the live window to the top of the store and keep stepping.
        # Unfinished and undispatched reads thus RESUME with their
        # frontier intact instead of escalating and re-running from
        # scratch (the reference never restarts a read either: it evicts
        # worst frames in place, mapping.rs:1357-1380).  Every live frame
        # is within the last CAP steps of its lane's refill (the abandon
        # cap), so delta = min(live lane_start) >= S - CAP - 2; the
        # static margin below makes a stuck boundary (delta == 0)
        # impossible.  The nested loop keeps the hot inner trace (and its
        # in-place store aliasing) identical to the generations == 1
        # kernel; a boundary costs ~2.5 full-store passes (~10 ms at the
        # 2 GB production store) vs ~600 ms device + host prep for a
        # fresh retry invocation.
        assert config.debug_fixed_steps == 0, (
            "debug_fixed_steps is a gens=1 ablation knob"
        )
        assert CAP + 4 <= S, (
            f"generations>1 needs read_step_cap + 4 <= total_steps "
            f"(got cap={CAP}, steps={S})"
        )
        MIN_LIVE = max(1, int(config.min_live))
        C2 = 2 * C  # append window never clamps: write offset <= C
        acc0 = dict(
            n=jnp.int32(0),
            nch=jnp.int32(0),
            read=jnp.full((C2,), -1, i32),
            slot=jnp.zeros((C2,), i32),
            ab=jnp.zeros((C2,), jnp.bool_),
            lower=jnp.zeros((C2,), IDT),
            lrev=jnp.zeros((C2,), IDT),
            size=jnp.zeros((C2,), IDT),
            score=jnp.zeros((C2,), jnp.float32),
            ops=jnp.zeros((C2, MW), i32),
            rs=jnp.full((R + 1,), -1, i32),
        )

        SPILL = max(0, int(config.spill_steps))

        def inner_cond(carry):
            state, gen_limit = carry
            lane_done, step = state[6], state[18]
            return jnp.logical_and(step < gen_limit, ~jnp.all(lane_done))

        def inner_body(carry):
            state, gen_limit = carry
            return body(state), gen_limit

        def append_acc(acc, ext):
            (n_ext, nch, exr, exslot, exab, exlo, exlr, exsz, exsc,
             exops) = ext
            wr = jnp.minimum(acc["n"], C)
            acc = dict(acc)
            for name, val in (
                ("read", exr), ("slot", exslot), ("ab", exab),
                ("lower", exlo), ("lrev", exlr), ("size", exsz),
                ("score", exsc),
            ):
                acc[name] = jax.lax.dynamic_update_slice(
                    acc[name], val, (wr,)
                )
            acc["ops"] = jax.lax.dynamic_update_slice(
                acc["ops"], exops, (wr, jnp.int32(0))
            )
            acc["n"] = acc["n"] + n_ext
            acc["nch"] = acc["nch"] + nch
            return acc

        def boundary(carry):
            """Extract chains, fold the finish log, compact the store."""
            core, gen, cum, _gl, acc = carry
            (consumed, bm_key, lane_start, st_pack, read_id, fresh,
             lane_done, next_read, lane_age, c_n, c_split, c_scale,
             c_thresh, c_repr, best_score, best_size, hcount, fin_log,
             step) = core
            acc = append_acc(
                acc, extract_chains(st_pack, slot_shift=cum * CANDS)
            )
            if config.track_read_steps:
                acc["rs"] = fold_read_steps(fin_log, acc["rs"])
                fin_log = jnp.full_like(fin_log, -1)
            # STATIC shift distance: every live lane has lane_start >=
            # S - CAP (the abandon cap bounds residency), so S - CAP is
            # always a safe delta -- and a static delta turns the store
            # shift into pure slice copies and the ring roll into a
            # static rotation (the first chip measurement showed a
            # dynamic-index boundary costing ~240 ms/launch)
            delta = jnp.int32(S - CAP)
            shifted = jnp.concatenate(
                [
                    jnp.zeros((L, S - CAP, BW), i32),
                    st_pack[:, : NB9 - (S - CAP) - 1],
                    jnp.zeros((L, 1, BW), i32),  # ROOT row stays zero
                ],
                axis=1,
            )
            # remap parent slots (+9*delta; ROOT fixed -- live frames'
            # ancestors are all within their lane's window, which moved
            # uniformly) and clear the extracted COMP/ABANDON markers so
            # the next extraction only sees new chains
            blob = shifted[:, :, : CANDS * NFP].reshape(
                L, NB9, CANDS, NFP
            )
            ops_f = blob[..., F_OP]
            par_f = blob[..., F_PARENT]
            par2 = jnp.where(
                ((ops_f & OP_VALID_BIT) != 0) & (par_f != ROOT),
                par_f + CANDS * delta,
                par_f,
            )
            ops2 = ops_f & ~(OP_COMP_BIT | OP_ABANDON_BIT)
            blob = jnp.concatenate(
                [
                    blob[..., :F_PARENT],
                    par2[..., None],
                    blob[..., F_PARENT + 1 : F_OP],
                    ops2[..., None],
                    blob[..., F_OP + 1 :],
                ],
                axis=-1,
            ).reshape(L, NB9, CANDS * NFP)
            st_pack = jnp.concatenate(
                [blob, shifted[:, :, CANDS * NFP :]], axis=-1
            )
            # pop rings: slot s holds step t with t === s (mod RB); after
            # t -> t - delta the entry for new slot s sat at (s+delta)%RB
            # (static rotation)
            consumed = jnp.roll(consumed, -((S - CAP) % RB), axis=1)
            bm_key = jnp.roll(bm_key, -((S - CAP) % RB), axis=1)
            lane_start = jnp.maximum(lane_start - delta, 0)
            core = (consumed, bm_key, lane_start, st_pack, read_id, fresh,
                    lane_done, next_read, lane_age, c_n, c_split, c_scale,
                    c_thresh, c_repr, best_score, best_size, hcount,
                    fin_log, step - delta)
            # capped spill: this generation runs at most SPILL more steps
            # (clearing reads that needed a little more shared budget)
            # instead of refilling the whole store -- cap-bound monster
            # reads would abandon either way and each whole-pool step
            # costs the same whatever the occupancy
            gl = (
                jnp.minimum(jnp.int32(S), step - delta + SPILL)
                if SPILL else jnp.int32(S)
            )
            return core, gen, cum + delta, gl, acc

        def outer_body(carry):
            core, gen, cum, gl, acc = carry
            core, gl = jax.lax.while_loop(
                inner_cond, inner_body, (core, gl)
            )
            lane_done, step = core[6], core[18]
            live = jnp.sum(~lane_done, dtype=i32)
            spill = (
                (step >= S)
                & ~jnp.all(lane_done)
                & (live >= MIN_LIVE)
                & (gen + 1 < GENS)
            )
            core, gen, cum, gl, acc = jax.lax.cond(
                spill, boundary, lambda c: c, (core, gen, cum, gl, acc)
            )
            return core, gen + 1, cum, gl, acc

        def outer_cond(carry):
            core, gen, cum, gl, acc = carry
            lane_done, step = core[6], core[18]
            # gen 0 always runs; later gens only when the previous
            # iteration compacted (rolled step back below the limit)
            return (gen == 0) | (
                (gen < GENS) & (step < gl) & ~jnp.all(lane_done)
            )

        state, _gen, cum_shift, _gl, acc = jax.lax.while_loop(
            outer_cond, outer_body,
            (state, jnp.int32(0), jnp.int32(0), jnp.int32(S), acc0),
        )

    (consumed, bm_key, lane_start, st_pack, read_id, fresh, lane_done,
     next_read, lane_age, c_n, c_split, c_scale, c_thresh, c_repr,
     best_score, best_size, hcount, fin_log, steps) = state

    lane_unfinished = ~lane_done & (read_id < R)

    if GENS == 1:
        (n_ext, n_chains, c_read, c_slot, c_abandon, c_lower, c_lrev,
         c_size, c_score, c_ops) = extract_chains(st_pack)
        if config.track_read_steps:
            read_steps = fold_read_steps(
                fin_log, jnp.full((R + 1,), -1, i32)
            )
        total_steps = steps
    else:
        acc = append_acc(
            acc, extract_chains(st_pack, slot_shift=cum_shift * CANDS)
        )
        n_chains = acc["nch"]
        c_read = acc["read"][:C]
        c_slot = acc["slot"][:C]
        c_abandon = acc["ab"][:C]
        c_lower = acc["lower"][:C]
        c_lrev = acc["lrev"][:C]
        c_size = acc["size"][:C]
        c_score = acc["score"][:C]
        c_ops = acc["ops"][:C]
        if config.track_read_steps:
            read_steps = fold_read_steps(fin_log, acc["rs"])
        # total executed steps across generations (for the engine's
        # step-time estimate): the final in-store step counter plus every
        # compacted-away step
        total_steps = steps + cum_shift

    if config.track_read_steps:
        # unfinished lanes report the steps consumed SO FAR by their held
        # read: the engine's retry policy uses this to split budget-starved
        # escalatees (device retry) from deep ones (host fallback); XD
        # timing only reads finished (non-escalated) entries either way
        ur = jnp.where(lane_unfinished, jnp.clip(read_id, 0, R), R)
        read_steps = read_steps.at[ur].max(lane_age)[:R]
    else:
        read_steps = jnp.full((R,), -1, i32)

    return PoolResult(
        c_read=c_read, c_slot=c_slot, c_abandon=c_abandon,
        c_lower=c_lower, c_lrev=c_lrev, c_size=c_size, c_score=c_score,
        c_ops=c_ops, n_chains=n_chains,
        lane_read=read_id, lane_unfinished=lane_unfinished,
        next_read=next_read, steps=total_steps, read_steps=read_steps,
    )
