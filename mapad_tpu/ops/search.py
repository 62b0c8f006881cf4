"""Batched k-mismatch search on device (JAX/XLA).

The TPU-native core: reference mapping.rs:1012-1383 re-designed as a
lock-step batched best-first search.  Each lane (read) owns a fixed-capacity
frame arena in SoA device arrays; every step pops each lane's best frame
(score-max, LIFO among ties, matching the host oracle), runs one shared
4-symbol FM extension sweep, and pushes up to 9 children (1 insertion,
4 deletions, 4 match/mismatch) under the same bound checks, Bi-D lookahead
pruning and early-stop rules as the reference.

Capacity semantics: the reference evicts worst frames past STACK_LIMIT=2e6;
here the per-lane stack capacity C is far smaller, so any eviction (or edit
arena overflow, or step-budget exhaustion) flags the lane for escalation:
the pipeline re-runs flagged lanes on the exact host oracle.  Lanes without
flags produce byte-identical hit sets to the oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bi_d import bi_d_get, compute_bi_d
from .fm import DeviceFmIndex, extend_batch

F32_MIN = np.float32(-3.4028235e38)
NEG_INF = np.float32(-np.inf)

GAP_CLOSED, GAP_INSERTION, GAP_DELETION = 0, 1, 2
OP_MATCH, OP_MISMATCH, OP_INSERTION, OP_DELETION = 0, 1, 2, 3


class SearchConfig(NamedTuple):
    max_len: int = 128  # M: padded read length
    stack_cap: int = 2048  # C: frames per lane
    arena_cap: int = 8192  # E: edit-tree nodes per lane
    hit_cap: int = 24  # H: hit slots per lane
    max_steps: int = 20000
    compute_forward_part: bool = False  # center-start models need both halves


class SearchParams(NamedTuple):
    """Per-batch scalar parameters (f32/i32 on device)."""

    pgo_pge: jax.Array  # f32: penalty_gap_open + penalty_gap_extend
    pge: jax.Array  # f32: penalty_gap_extend
    gap_dist_ends: jax.Array  # i32
    max_gaps: jax.Array  # i32
    stack_limit_abort: jax.Array  # bool


class SearchResult(NamedTuple):
    h_score: jax.Array  # (L, H) f32
    h_lower: jax.Array  # (L, H) i32
    h_lrev: jax.Array  # (L, H) i32
    h_size: jax.Array  # (L, H) i32
    h_node: jax.Array  # (L, H) i32
    hcount: jax.Array  # (L,) i32
    a_parent: jax.Array  # (L, E) i32
    a_kind: jax.Array  # (L, E) i32
    a_pos: jax.Array  # (L, E) i32
    a_base: jax.Array  # (L, E) i32 (0..3 ref base code)
    acount: jax.Array  # (L,) i32
    escalate: jax.Array  # (L,) bool: rerun on host oracle for exactness
    steps: jax.Array  # () i32


@functools.partial(jax.jit, static_argnames=("config",))
def k_mismatch_search_batch(
    index: DeviceFmIndex,
    pattern_rank,  # (L, M) i32: ranks 1..4, 0 = non-ACGT
    pattern_code,  # (L, M) i32: 0..3, 4 = non-ACGT
    n,  # (L,) i32 read lengths
    score_lut,  # (L, M, 4) f32: S[j,b] = model(b -> read[j]) - optimal[j]
    pen,  # (L, M) f32 Bi-D penalty elements
    split,  # (L,) i32 alignment start
    cutoff_scale,  # (L,) f32  (reject: v / scale < thresh)
    cutoff_thresh,  # (L,) f32
    repr_mm,  # (L,) f32 (-inf disables reject_iterative)
    params: SearchParams,
    config: SearchConfig,
) -> SearchResult:
    L, M = pattern_rank.shape
    C, E, H = config.stack_cap, config.arena_cap, config.hit_cap
    lanes = jnp.arange(L, dtype=jnp.int32)
    i32 = jnp.int32

    bid = compute_bi_d(
        index, pattern_rank, pen, n, split,
        compute_forward_part=config.compute_forward_part,
    )

    # --- initial state ---
    st_score = jnp.full((L, C), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    st_valid = jnp.zeros((L, C), jnp.bool_).at[:, 0].set(True)
    st_counter = jnp.zeros((L, C), i32)
    st_lower = jnp.zeros((L, C), i32)
    st_lrev = jnp.zeros((L, C), i32)
    st_size = jnp.zeros((L, C), i32).at[:, 0].set(index.text_len)
    st_start = jnp.zeros((L, C), i32).at[:, 0].set(split)
    st_len = jnp.zeros((L, C), i32)
    st_gapb = jnp.zeros((L, C), i32)
    st_gapf = jnp.zeros((L, C), i32)
    st_ngaps = jnp.zeros((L, C), i32)
    st_node = jnp.zeros((L, C), i32)

    a_parent = jnp.zeros((L, E), i32)
    a_kind = jnp.zeros((L, E), i32)
    a_pos = jnp.zeros((L, E), i32)
    a_base = jnp.zeros((L, E), i32)
    acount = jnp.ones((L,), i32)  # node 0 is the root

    h_score = jnp.full((L, H), NEG_INF, jnp.float32)
    h_lower = jnp.zeros((L, H), i32)
    h_lrev = jnp.zeros((L, H), i32)
    h_size = jnp.zeros((L, H), i32)
    h_node = jnp.zeros((L, H), i32)
    hcount = jnp.zeros((L,), i32)

    done = n <= 0
    escalate = jnp.zeros((L,), jnp.bool_)
    best_score = jnp.full((L,), NEG_INF, jnp.float32)
    best_size = jnp.zeros((L,), i32)
    push_ctr = jnp.ones((L,), i32)

    def reject(v):
        return (v / cutoff_scale) < cutoff_thresh

    def reject_iterative(v):
        # no hit yet -> best_score = -inf -> comparison false
        return v < best_score + repr_mm

    state = (
        st_score, st_valid, st_counter, st_lower, st_lrev, st_size, st_start,
        st_len, st_gapb, st_gapf, st_ngaps, st_node,
        a_parent, a_kind, a_pos, a_base, acount,
        h_score, h_lower, h_lrev, h_size, h_node, hcount,
        done, escalate, best_score, best_size, push_ctr, jnp.int32(0),
    )

    def cond(state):
        done = state[23]
        step = state[28]
        return jnp.logical_and(step < config.max_steps, ~jnp.all(done))

    def body(state):
        (st_score, st_valid, st_counter, st_lower, st_lrev, st_size, st_start,
         st_len, st_gapb, st_gapf, st_ngaps, st_node,
         a_parent, a_kind, a_pos, a_base, acount,
         h_score, h_lower, h_lrev, h_size, h_node, hcount,
         done, escalate, best_score, best_size, push_ctr, step) = state

        nonempty = jnp.any(st_valid, axis=1)
        done = done | ~nonempty
        active = ~done

        # --- pop max (score, LIFO counter among ties) ---
        key = jnp.where(st_valid, st_score, NEG_INF)
        m = jnp.max(key, axis=1)
        tie = jnp.where(st_valid & (key == m[:, None]), st_counter, -1)
        sel = jnp.argmax(tie, axis=1).astype(i32)
        sel_eff = jnp.where(active, sel, C)  # drop for inactive
        f_score = st_score[lanes, sel]
        f_lower = st_lower[lanes, sel]
        f_lrev = st_lrev[lanes, sel]
        f_size = st_size[lanes, sel]
        f_start = st_start[lanes, sel]
        f_len = st_len[lanes, sel]
        f_gapb = st_gapb[lanes, sel]
        f_gapf = st_gapf[lanes, sel]
        f_ngaps = st_ngaps[lanes, sel]
        f_node = st_node[lanes, sel]
        st_valid = st_valid.at[lanes, sel_eff].set(False, mode="drop")

        # --- direction (mapping.rs:1077-1097) ---
        fwd = f_start <= n - f_start - f_len
        j = jnp.where(fwd, f_start + f_len, f_start - 1)
        d_k = jnp.where(fwd, f_start, f_start - 1)
        d_l = jnp.where(fwd, f_start + f_len, f_start + f_len - 1)
        ext_lower = jnp.where(fwd, f_lrev, f_lower)
        ext_lrev = jnp.where(fwd, f_lower, f_lrev)
        gap_state = jnp.where(fwd, f_gapf, f_gapb)

        ins_score = (
            jnp.where(gap_state == GAP_INSERTION, params.pge, params.pgo_pge)
            + f_score
        ).astype(jnp.float32)
        del_score = (
            jnp.where(gap_state == GAP_DELETION, params.pge, params.pgo_pge)
            + f_score
        ).astype(jnp.float32)
        ngaps_inc = jnp.where(gap_state == GAP_CLOSED, f_ngaps + 1, f_ngaps)

        j_c = jnp.clip(j, 0, M - 1)
        Sj = score_lut[lanes, j_c]  # (L, 4)
        pat_j = pattern_code[lanes, j_c]

        lb = bi_d_get(bid, split, n, d_k, d_l)

        # best-first global stop (mapping.rs:1201-1208)
        stop = reject_iterative((f_score + lb).astype(jnp.float32))
        done = done | (active & stop)
        still = active & ~stop

        # --- extension sweep (shared occ state) ---
        ch_lower, ch_lrev, ch_size = extend_batch(index, ext_lower, ext_lrev, f_size)
        # un-swap children for forward extension
        out_lower = jnp.where(fwd[:, None], ch_lrev, ch_lower)
        out_lrev = jnp.where(fwd[:, None], ch_lower, ch_lrev)
        out_size = ch_size

        # gap placement constraints
        ins_allowed = jnp.minimum(j, n - j - 1) >= params.gap_dist_ends
        d5 = jnp.where(fwd, j, j + 1)
        del_allowed = jnp.minimum(d5, n - d5) >= params.gap_dist_ends

        next_start_consume = jnp.where(fwd, f_start, f_start - 1)

        carry = (st_score, st_valid, st_counter, st_lower, st_lrev, st_size,
                 st_start, st_len, st_gapb, st_gapf, st_ngaps, st_node,
                 a_parent, a_kind, a_pos, a_base, acount,
                 h_score, h_lower, h_lrev, h_size, h_node, hcount,
                 best_score, best_size, push_ctr, escalate)

        def check_and_push(carry, cond_, score, lower, lrev, size, start,
                           length, gapb, gapf, ngaps, op_kind, op_base):
            (st_score, st_valid, st_counter, st_lower, st_lrev, st_size,
             st_start, st_len, st_gapb, st_gapf, st_ngaps, st_node,
             a_parent, a_kind, a_pos, a_base, acount,
             h_score, h_lower, h_lrev, h_size, h_node, hcount,
             best_score, best_size, push_ctr, escalate) = carry

            # reference mapping.rs:932-987
            ok = cond_ & ~(score < best_score + repr_mm)
            ok = ok & (ngaps <= params.max_gaps)

            # edit tree node
            node = jnp.minimum(acount, E - 1)
            a_idx = jnp.where(ok, node, E)
            a_parent = a_parent.at[lanes, a_idx].set(f_node, mode="drop")
            a_kind = a_kind.at[lanes, a_idx].set(op_kind, mode="drop")
            a_pos = a_pos.at[lanes, a_idx].set(j, mode="drop")
            a_base = a_base.at[lanes, a_idx].set(op_base, mode="drop")
            escalate = escalate | (ok & (acount >= E - 1))
            acount = acount + ok.astype(i32)

            comp = ok & (length == n)
            h_idx = jnp.where(comp & (hcount < H), hcount, H)
            h_score = h_score.at[lanes, h_idx].set(score, mode="drop")
            h_lower = h_lower.at[lanes, h_idx].set(lower, mode="drop")
            h_lrev = h_lrev.at[lanes, h_idx].set(lrev, mode="drop")
            h_size = h_size.at[lanes, h_idx].set(size, mode="drop")
            h_node = h_node.at[lanes, h_idx].set(node, mode="drop")
            escalate = escalate | (comp & (hcount >= H))
            hcount = hcount + comp.astype(i32)
            upd = comp & (score > best_score)
            best_size = jnp.where(upd, size, best_size)
            best_score = jnp.where(upd, score, best_score)

            push = ok & ~comp
            free = ~st_valid
            has_free = jnp.any(free, axis=1)
            free_slot = jnp.argmax(free, axis=1).astype(i32)
            evict_slot = jnp.argmin(
                jnp.where(st_valid, st_score, jnp.float32(np.inf)), axis=1
            ).astype(i32)
            slot = jnp.where(has_free, free_slot, evict_slot)
            escalate = escalate | (push & ~has_free)
            s_idx = jnp.where(push, slot, C)
            st_score = st_score.at[lanes, s_idx].set(score, mode="drop")
            st_valid = st_valid.at[lanes, s_idx].set(True, mode="drop")
            st_counter = st_counter.at[lanes, s_idx].set(push_ctr, mode="drop")
            st_lower = st_lower.at[lanes, s_idx].set(lower, mode="drop")
            st_lrev = st_lrev.at[lanes, s_idx].set(lrev, mode="drop")
            st_size = st_size.at[lanes, s_idx].set(size, mode="drop")
            st_start = st_start.at[lanes, s_idx].set(start, mode="drop")
            st_len = st_len.at[lanes, s_idx].set(length, mode="drop")
            st_gapb = st_gapb.at[lanes, s_idx].set(gapb, mode="drop")
            st_gapf = st_gapf.at[lanes, s_idx].set(gapf, mode="drop")
            st_ngaps = st_ngaps.at[lanes, s_idx].set(ngaps, mode="drop")
            st_node = st_node.at[lanes, s_idx].set(node, mode="drop")
            push_ctr = push_ctr + push.astype(i32)

            return (st_score, st_valid, st_counter, st_lower, st_lrev, st_size,
                    st_start, st_len, st_gapb, st_gapf, st_ngaps, st_node,
                    a_parent, a_kind, a_pos, a_base, acount,
                    h_score, h_lower, h_lrev, h_size, h_node, hcount,
                    best_score, best_size, push_ctr, escalate)

        # 1) insertion (mapping.rs:1213-1242)
        ins_cond = still & ~reject((ins_score + lb).astype(jnp.float32)) & ins_allowed
        carry = check_and_push(
            carry, ins_cond, ins_score, f_lower, f_lrev, f_size,
            next_start_consume, f_len + 1,
            jnp.where(fwd, f_gapb, GAP_INSERTION),
            jnp.where(fwd, GAP_INSERTION, f_gapf),
            ngaps_inc, OP_INSERTION, jnp.zeros((L,), i32),
        )

        # 2) per sweep slot: deletion then match/mismatch
        del_rej = reject((del_score + lb).astype(jnp.float32))
        for slot in range(4):
            c_lower = out_lower[:, slot]
            c_lrev = out_lrev[:, slot]
            c_size = out_size[:, slot]
            nonzero = c_size >= 1
            # reported ref base code: fwd -> slot, bwd -> 3 - slot
            code = jnp.where(fwd, slot, 3 - slot)
            mm_score = (Sj[lanes, code] + f_score).astype(jnp.float32)

            del_cond = still & nonzero & ~del_rej & del_allowed
            carry = check_and_push(
                carry, del_cond, del_score, c_lower, c_lrev, c_size,
                f_start, f_len,
                jnp.where(fwd, f_gapb, GAP_DELETION),
                jnp.where(fwd, GAP_DELETION, f_gapf),
                ngaps_inc, OP_DELETION, code,
            )

            mm_cond = still & nonzero & ~reject((mm_score + lb).astype(jnp.float32))
            is_match = code == pat_j
            carry = check_and_push(
                carry, mm_cond, mm_score, c_lower, c_lrev, c_size,
                next_start_consume, f_len + 1,
                jnp.where(fwd, f_gapb, GAP_CLOSED),
                jnp.where(fwd, GAP_CLOSED, f_gapf),
                f_ngaps,
                jnp.where(is_match, OP_MATCH, OP_MISMATCH), code,
            )

        (st_score, st_valid, st_counter, st_lower, st_lrev, st_size, st_start,
         st_len, st_gapb, st_gapf, st_ngaps, st_node,
         a_parent, a_kind, a_pos, a_base, acount,
         h_score, h_lower, h_lrev, h_size, h_node, hcount,
         best_score, best_size, push_ctr, escalate) = carry

        # multi-hit / >9 hits early return (mapping.rs:1341-1355)
        done = done | (still & ((hcount > 9) | (best_size > 1)))
        # stack_limit_abort: treat any eviction/overflow as abort-worthy; the
        # pipeline escalates those lanes instead.
        done = done | (still & escalate)

        return (st_score, st_valid, st_counter, st_lower, st_lrev, st_size,
                st_start, st_len, st_gapb, st_gapf, st_ngaps, st_node,
                a_parent, a_kind, a_pos, a_base, acount,
                h_score, h_lower, h_lrev, h_size, h_node, hcount,
                done, escalate, best_score, best_size, push_ctr, step + 1)

    state = jax.lax.while_loop(cond, body, state)

    (st_score, st_valid, st_counter, st_lower, st_lrev, st_size, st_start,
     st_len, st_gapb, st_gapf, st_ngaps, st_node,
     a_parent, a_kind, a_pos, a_base, acount,
     h_score, h_lower, h_lrev, h_size, h_node, hcount,
     done, escalate, best_score, best_size, push_ctr, step) = state

    # lanes that ran out of step budget are escalated too
    escalate = escalate | ~done

    return SearchResult(
        h_score=h_score, h_lower=h_lower, h_lrev=h_lrev, h_size=h_size,
        h_node=h_node, hcount=hcount,
        a_parent=a_parent, a_kind=a_kind, a_pos=a_pos, a_base=a_base,
        acount=acount, escalate=escalate, steps=step,
    )
