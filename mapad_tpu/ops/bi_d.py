"""Batched Bi-D array computation on device.

Device counterpart of reference src/map/bi_d_array.rs: per read, 15 offset
walks per half extend the FMD-index perfectly; each failure accrues the most
conservative penalty over the scanned window.  All walks of a batch run in
lockstep as one (L*15,) extension per scan step.

The reference's window fold (bi_d_array.rs:144-190) is re-expressed as a
running maximum that resets at each failure: windows between failures are
disjoint, so the fold over [last_mismatch+1, index] equals the running max
accumulated since the previous failure.  The f32 accumulation order of `z`
is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fm import DeviceFmIndex, extend_batch

MAX_OFFSET = 15
F32_MIN = np.float32(-3.4028235e38)


def _walk_part(index: DeviceFmIndex, part_rank, part_pen, part_len, forward: bool,
               max_len: int):
    """Run MAX_OFFSET perfect-extension walks over one read part.

    part_rank: (L, M) symbol ranks of the part in walk order (already
               reversed for the backward part), 0 where invalid
    part_pen:  (L, M) f32 penalty elements indexed in walk order
    part_len:  (L,) number of valid positions
    -> (L, M) f32 min-reduced D values for the part (reference fold,
       initialized at 0.0)
    """
    L, M = part_rank.shape
    W = MAX_OFFSET
    LW = L * W

    skip = jnp.tile(jnp.arange(W, dtype=jnp.int32), (L,))  # (LW,) walk offsets
    plen = jnp.repeat(part_len, W)

    init_lower = jnp.zeros(LW, index.idx_dtype)
    init_lrev = jnp.zeros(LW, index.idx_dtype)
    init_size = jnp.full(LW, index.text_len, index.idx_dtype)

    # Steps run only to the longest real part (reads are usually much
    # shorter than the padded M), and the per-step pattern/penalty loads are
    # dynamic column slices broadcast over the walks -- the scan index is
    # uniform across lanes, so no per-row gathers are needed in the body
    # (XLA row gathers cost ~10ns/row on v5e; at L*15 walks they dominated).
    n_steps = jnp.max(part_len)

    def extend(lower, lrev, size, c):
        if forward:
            # forward ext = backward ext of swapped interval w/ complement
            comp = jnp.where((c >= 1) & (c <= 4), 5 - c, 0)
            ch_lower, ch_lrev, ch_size = extend_batch(index, lrev, lower, size)
            sel = comp
        else:
            ch_lower, ch_lrev, ch_size = extend_batch(index, lower, lrev, size)
            sel = c
        # slot for rank r is 4 - r; arithmetic one-hot select instead of a
        # per-row gather
        slot = 4 - sel
        cand = jax.lax.broadcasted_iota(jnp.int32, ch_size.shape, 1)
        hit = cand == slot[:, None]

        def pick(a):
            return jnp.sum(jnp.where(hit, a, 0), axis=1, dtype=a.dtype)

        sl, slr, ss = pick(ch_lower), pick(ch_lrev), pick(ch_size)
        valid = (c >= 1) & (c <= 4)
        zero = jnp.zeros_like(sl)
        sl = jnp.where(valid, sl, zero)
        slr = jnp.where(valid, slr, zero)
        ss = jnp.where(valid, ss, zero)
        if forward:
            return slr, sl, ss
        return sl, slr, ss

    def cond(carry):
        return carry[0] < n_steps

    def step(carry):
        idx, lower, lrev, size, z, rm, z_out = carry
        active = (idx >= skip) & (idx < plen)
        # uniform column loads broadcast to all W walks of a lane
        col_rank = jax.lax.dynamic_slice(part_rank, (jnp.int32(0), idx), (L, 1))[:, 0]
        col_pen = jax.lax.dynamic_slice(part_pen, (jnp.int32(0), idx), (L, 1))[:, 0]
        c = jnp.repeat(col_rank, W)
        nl, nlr, ns = extend(lower, lrev, size, c)
        nl = jnp.where(active, nl, lower)
        nlr = jnp.where(active, nlr, lrev)
        ns = jnp.where(active, ns, size)
        rm = jnp.where(
            active, jnp.maximum(rm, jnp.repeat(col_pen, W)), rm
        )
        dead = active & (ns < 1)
        z = jnp.where(dead, (z + rm).astype(jnp.float32), z)
        nl = jnp.where(dead, init_lower, nl)
        nlr = jnp.where(dead, init_lrev, nlr)
        ns = jnp.where(dead, init_size, ns)
        rm = jnp.where(dead, F32_MIN, rm)
        # out[w, i] = 0 if i <= skip_w else z after step i-1: write z into
        # column idx+1 (clipped; the last column write is overwritten by the
        # skip mask below only where idx+1 <= skip, never true for idx>=skip)
        z_out = jax.lax.dynamic_update_slice(
            z_out, z[:, None], (jnp.int32(0), idx + 1)
        )
        return idx + 1, nl, nlr, ns, z, rm, z_out

    carry = (jnp.int32(0), init_lower, init_lrev, init_size,
             jnp.zeros(LW, jnp.float32), jnp.full(LW, F32_MIN, jnp.float32),
             jnp.zeros((LW, M + 1), jnp.float32))
    carry = jax.lax.while_loop(cond, step, carry)
    z_out = carry[6][:, :M]  # (LW, M); column i holds z after step i-1
    idxs = jnp.arange(M, dtype=jnp.int32)[None, :]
    out = jnp.where(idxs <= skip[:, None], jnp.float32(0.0), z_out)
    out = out.reshape(L, W, M)
    # reference fold: starts at 0.0 and min-reduces over the offset walks
    return jnp.minimum(jnp.min(out, axis=1), jnp.float32(0.0))  # (L, M)


def compute_bi_d(index: DeviceFmIndex, pattern_rank, pen, n, split,
                 compute_forward_part: bool = True):
    """-> (L, M) f32 composite Bi-D array + per-lane split.

    pattern_rank: (L, M) ranks (1..4, 0 invalid); pen: (L, M) f32 penalty
    elements per absolute read position; n: (L,) lengths; split: (L,)
    alignment starts.  composite[i] = d_backwards[i] for i < split else
    d_forwards[i - split] (bi_d_array.rs:95-98).
    """
    L, M = pattern_rank.shape
    # Part 1: pattern[:split], Forward direction, absolute index = walk index
    d_back = _walk_part(index, pattern_rank, pen, split, True, M)

    if not compute_forward_part:
        return d_back

    # Part 2: pattern[split:] reversed; walk index j -> absolute n - 1 - j
    lanes = jnp.arange(L, dtype=jnp.int32)[:, None]
    j = jnp.arange(M, dtype=jnp.int32)[None, :]
    abs_idx = jnp.clip(n[:, None] - 1 - j, 0, M - 1)
    tail_rank = jnp.where(j < (n - split)[:, None], pattern_rank[lanes, abs_idx], 0)
    tail_pen = jnp.where(
        j < (n - split)[:, None], pen[lanes, abs_idx], jnp.float32(0.0)
    )
    d_fwd = _walk_part(index, tail_rank, tail_pen, n - split, False, M)

    # composite: positions >= split come from d_fwd[i - split]
    fwd_idx = jnp.clip(j - split[:, None], 0, M - 1)
    composite = jnp.where(j < split[:, None], d_back, d_fwd[lanes, fwd_idx])
    return composite


def bi_d_get(composite, split, n, backward_index, forward_index):
    """Batched BiDArray::get (bi_d_array.rs:200-224). All args (L,).

    Both lookups ride one gather of (L, 2) elements."""
    L, M = composite.shape
    lanes = jnp.arange(L, dtype=jnp.int32)
    bk = jnp.clip(backward_index, 0, M - 1)
    t = n - (1 + forward_index)
    ci = t + split
    ci_c = jnp.clip(ci, 0, M - 1)
    vals = composite[lanes[:, None], jnp.stack([bk, ci_c], axis=1)]  # (L, 2)
    d_rev = jnp.where(
        (backward_index >= 0) & (backward_index < n), vals[:, 0],
        jnp.float32(0.0),
    )
    d_fwd = jnp.where((t >= 0) & (ci < n), vals[:, 1], jnp.float32(0.0))
    return (d_rev + d_fwd).astype(jnp.float32)
