"""Batched k-mismatch search on device (JAX/XLA).

The TPU-native core: reference mapping.rs:1012-1383 re-designed as a
lock-step batched best-first search.  TPU-first data layout decisions:

- **Append-only frame store.**  Each step pushes its <=9 candidate frames at
  slot base `step * 9` -- a dynamic-update-slice at a scalar offset shared by
  all lanes, avoiding per-lane scatters entirely (TPU scatters serialize).
  Popped frames are invalidated by masking their score to -inf; slots never
  recycle, so the frame store itself IS the edit-operation tree (each entry
  carries its parent slot and edit op) and the reference's separate slab
  arena (backtrack_tree.rs) disappears.
- **Pop = dense reduction.**  Best-first pop is a score max + LIFO tie
  argmax over the store (slot index equals insertion order), then one row
  gather of the packed frame.
- **Shared 4-symbol occ sweep.**  One gathered BWT block row per interval
  end answers all four symbol ranks (fmd_index.rs:108-182 semantics).
- **On-device hit-chain walk.**  After the search loop, hit edit-operation
  chains are walked on device into dense (L, H, M+pad) op-word tracks, so
  only O(hits) data returns to the host.

Capacity semantics: the step budget doubles as the frame-store capacity.
Lanes still running at the budget (or overflowing hit slots) are flagged
`escalate`; the engine re-runs them with a larger budget or on the exact
host oracle.  Non-escalated lanes produce hit sets byte-identical to the
oracle (tests/test_device_search.py).
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

# packed frame layout in the store's trailing axis
F_LOWER, F_LREV, F_SIZE, F_PARENT, F_STARTLEN, F_GAPS, F_OP, F_SCOREBITS = range(8)
NF = 8
CANDS = 9  # 1 insertion + 4 x (deletion, match/mismatch)


OP_VALID_BIT = 1 << 20  # distinguishes real op words from chain terminators
OP_COMP_BIT = 1 << 21  # marks store entries that completed as hits


def pack_op(kind, pos, base):
    return OP_VALID_BIT | (kind << 17) | (pos << 2) | base


def unpack_op_kind(word):
    return word >> 17


def unpack_op_pos(word):
    return (word >> 2) & 0x7FFF


def unpack_op_base(word):
    return word & 3


class SearchConfig(NamedTuple):
    max_len: int = 128  # M: padded read length
    max_steps: int = 2048  # S: step budget == frame-store rows / CANDS
    hit_cap: int = 24  # H: hit slots per lane
    compute_forward_part: bool = False  # center-start models need both halves


class SearchParams(NamedTuple):
    pgo_pge: jax.Array  # f32: penalty_gap_open + penalty_gap_extend
    pge: jax.Array  # f32: penalty_gap_extend
    gap_dist_ends: jax.Array  # i32
    max_gaps: jax.Array  # i32
    stack_limit_abort: jax.Array  # bool (escalation covers abort semantics)


class SearchResult(NamedTuple):
    h_score: jax.Array  # (L, H) f32
    h_lower: jax.Array  # (L, H) i32
    h_lrev: jax.Array  # (L, H) i32
    h_size: jax.Array  # (L, H) i32
    hcount: jax.Array  # (L,) i32
    h_ops: jax.Array  # (L, H, MW) i32 op words, 0-terminated chains
    escalate: jax.Array  # (L,) bool
    steps: jax.Array  # () i32


@functools.partial(jax.jit, static_argnames=("config",))
def k_mismatch_search_batch(
    index: DeviceFmIndex,
    pattern_rank,  # (L, M) i32 ranks 1..4, 0 = non-ACGT
    pattern_code,  # (L, M) i32 0..3, 4 = non-ACGT
    n,  # (L,) i32
    score_lut,  # (L, M, 4) f32
    pen,  # (L, M) f32 Bi-D penalty elements
    split,  # (L,) i32
    cutoff_scale,  # (L,) f32
    cutoff_thresh,  # (L,) f32
    repr_mm,  # (L,) f32 (-inf disables reject_iterative)
    params: SearchParams,
    config: SearchConfig,
) -> SearchResult:
    L, M = pattern_rank.shape
    S = config.max_steps
    SLOTS = S * CANDS + 1
    ROOT = SLOTS - 1  # the store grows DOWNWARD from the root so that
    # jnp.argmax's first-occurrence tie rule lands on the latest push (LIFO)
    H = config.hit_cap
    lanes = jnp.arange(L, dtype=jnp.int32)
    i32 = jnp.int32
    INT_MIN = jnp.int32(-2147483648)

    def mono(f):
        # monotonic int32 key of an f32 (self-inverse transform)
        u = jax.lax.bitcast_convert_type(f, i32)
        return u ^ ((u >> 31) & 0x7FFFFFFF)

    def mono_inv(k):
        return jax.lax.bitcast_convert_type(k ^ ((k >> 31) & 0x7FFFFFFF),
                                            jnp.float32)

    bid = compute_bi_d(
        index, pattern_rank, pen, n, split,
        compute_forward_part=config.compute_forward_part,
    )

    # frame store: monotonic int32 score keys (single-pass pop reductions),
    # packed ints gathered per pop
    st_mono = jnp.full((L, SLOTS), INT_MIN, i32).at[:, ROOT].set(
        mono(jnp.float32(0.0))
    )
    st_pack = jnp.zeros((L, SLOTS, NF), i32)
    st_pack = st_pack.at[:, ROOT, F_SIZE].set(index.text_len)
    st_pack = st_pack.at[:, ROOT, F_STARTLEN].set(split << 16)

    hcount = jnp.zeros((L,), i32)

    done = n <= 0
    escalate = jnp.zeros((L,), jnp.bool_)
    best_score = jnp.full((L,), NEG_INF, jnp.float32)
    best_size = jnp.zeros((L,), i32)

    slot_iota = jax.lax.broadcasted_iota(i32, (L, SLOTS), 1)

    def reject(v):
        return (v / cutoff_scale) < cutoff_thresh

    state = (st_mono, st_pack, hcount, done, escalate,
             best_score, best_size, jnp.int32(0))

    def cond(state):
        done, step = state[3], state[7]
        return jnp.logical_and(step < S, ~jnp.all(done))

    def body(state):
        (st_mono, st_pack, hcount, done, escalate,
         best_score, best_size, step) = state

        # --- pop best frame: one argmax; first occurrence == latest push ---
        sel = jnp.argmax(st_mono, axis=1).astype(i32)
        f_mono = jnp.max(st_mono, axis=1)
        nonempty = f_mono > INT_MIN
        done = done | ~nonempty
        active = ~done
        st_mono = jnp.where(
            (slot_iota == sel[:, None]) & active[:, None], INT_MIN, st_mono
        )
        frame = st_pack[lanes, sel]  # (L, NF) row gather
        f_score = mono_inv(f_mono)
        f_lower = frame[:, F_LOWER]
        f_lrev = frame[:, F_LREV]
        f_size = frame[:, F_SIZE]
        f_start = frame[:, F_STARTLEN] >> 16
        f_len = frame[:, F_STARTLEN] & 0xFFFF
        gaps = frame[:, F_GAPS]
        f_gapb = gaps & 3
        f_gapf = (gaps >> 2) & 3
        f_ngaps = (gaps >> 4) & 0xFF

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
        stop = (f_score + lb).astype(jnp.float32) < best_score + repr_mm
        done = done | (active & stop)
        still = active & ~stop

        # --- extension sweep ---
        ch_lower, ch_lrev, ch_size = extend_batch(index, ext_lower, ext_lrev, f_size)
        out_lower = jnp.where(fwd[:, None], ch_lrev, ch_lower)
        out_lrev = jnp.where(fwd[:, None], ch_lower, ch_lrev)

        ins_allowed = jnp.minimum(j, n - j - 1) >= params.gap_dist_ends
        d5 = jnp.where(fwd, j, j + 1)
        del_allowed = jnp.minimum(d5, n - d5) >= params.gap_dist_ends
        next_start = jnp.where(fwd, f_start, f_start - 1)
        del_rej = reject((del_score + lb).astype(jnp.float32))
        ins_rej = reject((ins_score + lb).astype(jnp.float32))

        # --- build the 9 candidates (order: ins, then (del, mm) per slot) ---
        c_ok, c_score = [], []
        c_lower, c_lrev, c_size = [], [], []
        c_startlen, c_gaps, c_op = [], [], []

        def gaps_word(gb, gf, ng):
            return gb | (gf << 2) | (ng << 4)

        # 1) insertion (mapping.rs:1213-1242)
        ok = still & ~ins_rej & ins_allowed & (ngaps_inc <= params.max_gaps)
        c_ok.append(ok)
        c_score.append(ins_score)
        c_lower.append(f_lower)
        c_lrev.append(f_lrev)
        c_size.append(f_size)
        c_startlen.append((next_start << 16) | (f_len + 1))
        c_gaps.append(
            gaps_word(
                jnp.where(fwd, f_gapb, GAP_INSERTION),
                jnp.where(fwd, GAP_INSERTION, f_gapf),
                ngaps_inc,
            )
        )
        c_op.append(pack_op(OP_INSERTION, j_c, 0))

        for slot in range(4):
            s_lower = out_lower[:, slot]
            s_lrev = out_lrev[:, slot]
            s_size = ch_size[:, slot]
            nonzero = s_size >= 1
            code = jnp.where(fwd, slot, 3 - slot)
            mm_score = (Sj[lanes, code] + f_score).astype(jnp.float32)

            # deletion
            ok = (
                still & nonzero & ~del_rej & del_allowed
                & (ngaps_inc <= params.max_gaps)
            )
            c_ok.append(ok)
            c_score.append(del_score)
            c_lower.append(s_lower)
            c_lrev.append(s_lrev)
            c_size.append(s_size)
            c_startlen.append((f_start << 16) | f_len)
            c_gaps.append(
                gaps_word(
                    jnp.where(fwd, f_gapb, GAP_DELETION),
                    jnp.where(fwd, GAP_DELETION, f_gapf),
                    ngaps_inc,
                )
            )
            c_op.append(pack_op(OP_DELETION, j_c, code))

            # match / mismatch
            ok = still & nonzero & ~reject((mm_score + lb).astype(jnp.float32))
            kind = jnp.where(code == pat_j, OP_MATCH, OP_MISMATCH)
            c_ok.append(ok)
            c_score.append(mm_score)
            c_lower.append(s_lower)
            c_lrev.append(s_lrev)
            c_size.append(s_size)
            c_startlen.append((next_start << 16) | (f_len + 1))
            c_gaps.append(
                gaps_word(
                    jnp.where(fwd, f_gapb, GAP_CLOSED),
                    jnp.where(fwd, GAP_CLOSED, f_gapf),
                    f_ngaps,
                )
            )
            c_op.append(pack_op(kind, j_c, code))

        score9 = jnp.stack(c_score, axis=1)
        size9 = jnp.stack(c_size, axis=1)
        len9 = jnp.stack(c_startlen, axis=1) & 0xFFFF
        # reject_iterative at push time (mapping.rs:956-963): the reference
        # pushes candidates sequentially, so later candidates see the best
        # hit updated by earlier completions of the SAME step.
        ok_cols, comp_cols = [], []
        run_best, run_size = best_score, best_size
        for k in range(CANDS):
            ok_k = c_ok[k] & ~(score9[:, k] < run_best + repr_mm)
            comp_k = ok_k & (len9[:, k] == n)
            upd = comp_k & (score9[:, k] > run_best)
            run_size = jnp.where(upd, size9[:, k], run_size)
            run_best = jnp.where(upd, score9[:, k], run_best)
            ok_cols.append(ok_k)
            comp_cols.append(comp_k)
        best_score, best_size = run_best, run_size
        ok9 = jnp.stack(ok_cols, axis=1)
        comp9 = jnp.stack(comp_cols, axis=1)
        push9 = ok9 & ~comp9

        # --- write frames: DUS at a shared scalar offset, candidate order
        # reversed so lower slot index == later push (LIFO argmax).  The
        # store is also the hit log: completions carry OP_COMP_BIT ---
        pack9 = jnp.stack(
            [
                jnp.stack(c_lower, axis=1),
                jnp.stack(c_lrev, axis=1),
                jnp.stack(c_size, axis=1),
                jnp.broadcast_to(sel[:, None], (L, CANDS)),
                jnp.stack(c_startlen, axis=1),
                jnp.stack(c_gaps, axis=1),
                jnp.stack(c_op, axis=1)
                | jnp.where(comp9, OP_COMP_BIT, 0).astype(i32),
                jax.lax.bitcast_convert_type(score9, i32),
            ],
            axis=2,
        )  # (L, 9, NF)
        base_slot = ROOT - (step + 1) * CANDS
        st_pack = jax.lax.dynamic_update_slice(
            st_pack, pack9[:, ::-1, :], (jnp.int32(0), base_slot, jnp.int32(0))
        )
        st_mono = jax.lax.dynamic_update_slice(
            st_mono,
            jnp.where(push9, mono(score9), INT_MIN)[:, ::-1],
            (jnp.int32(0), base_slot),
        )

        hcount = hcount + jnp.sum(comp9, axis=1, dtype=i32)

        # multi-hit / >9 hits early return (mapping.rs:1341-1355)
        done = done | (still & ((hcount > 9) | (best_size > 1)))
        done = done | (still & escalate)

        return (st_mono, st_pack, hcount, done, escalate,
                best_score, best_size, step + 1)

    state = jax.lax.while_loop(cond, body, state)
    (st_mono, st_pack, hcount, done, escalate, best_score, best_size,
     steps) = state
    escalate = escalate | ~done

    # --- collect hits from the store: COMP-marked slots, highest slot ==
    # earliest completion (store grows downward) ---
    comp_mask = (st_pack[:, :, F_OP] & OP_COMP_BIT) != 0
    hit_key = jnp.where(comp_mask, slot_iota, -1)
    hit_slots, _ = jax.lax.top_k(hit_key, H)  # (L, H) descending
    hit_slots = jnp.maximum(hit_slots, 0)
    hit_rows = st_pack[lanes[:, None], hit_slots]  # (L, H, NF)
    valid_hit = jnp.arange(H, dtype=jnp.int32)[None, :] < hcount[:, None]
    h_score = jnp.where(
        valid_hit,
        jax.lax.bitcast_convert_type(hit_rows[:, :, F_SCOREBITS], jnp.float32),
        NEG_INF,
    )

    # --- walk hit chains on device: (L*H,) parents in lockstep ---
    MW = M + 16  # ops per chain <= read_len + max deletions + slack
    LH = L * H
    hit_lane = jnp.repeat(lanes, H)
    node0 = jnp.where(
        valid_hit, hit_rows[:, :, F_PARENT], ROOT
    ).reshape(LH)
    op0 = jnp.where(valid_hit, hit_rows[:, :, F_OP], 0).reshape(LH)

    def walk(carry, _):
        node = carry
        entry = st_pack[hit_lane, node]  # (LH, NF) row gather
        at_root = node == ROOT
        word = jnp.where(at_root, 0, entry[:, F_OP])
        nxt = jnp.where(at_root, ROOT, entry[:, F_PARENT])
        return nxt, word

    _, words = jax.lax.scan(walk, node0, None, length=MW - 1)
    h_ops = jnp.concatenate(
        [op0[None, :], words], axis=0
    ).T.reshape(L, H, MW)

    zero_h = jnp.zeros((L, H), i32)
    return SearchResult(
        h_score=h_score,
        h_lower=jnp.where(valid_hit, hit_rows[:, :, F_LOWER], zero_h),
        h_lrev=jnp.where(valid_hit, hit_rows[:, :, F_LREV], zero_h),
        h_size=jnp.where(valid_hit, hit_rows[:, :, F_SIZE], zero_h),
        hcount=hcount,
        h_ops=h_ops,
        escalate=escalate,
        steps=steps,
    )
