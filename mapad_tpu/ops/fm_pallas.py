"""Pallas TPU kernel for the batched FMD extension sweep (experimental).

Alternative backend for ops.fm.extend_batch: a Pallas kernel that manually
DMAs exactly the two BWT/occ rows each lane needs from HBM (double-buffered
across grid steps) and fuses the 4-symbol count + interval sweep.

Semantics are identical to ops.fm.extend_batch (property-tested in
tests/test_fm_pallas.py, interpret mode + compiled).  This is the template
for moving the remaining search step into Pallas (ROADMAP.md lever 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fm import DeviceFmIndex

LANES_PER_STEP = 8  # grid granularity: lanes handled per grid step


def _extend_kernel(blk1_ref, blk2_ref, aux_ref, rows_hbm, less_ref,
                   out_ref, scratch, sem, *, occ_k, lanes_per_step):
    """Grid step g handles lanes [g*lanes_per_step, (g+1)*lanes_per_step)."""
    g = pl.program_id(0)
    nw = occ_k // 8
    W = 6 + nw

    # DMA the 2 * lanes_per_step rows for this grid step
    for sl in range(lanes_per_step):
        lane = g * lanes_per_step + sl
        pltpu.make_async_copy(
            rows_hbm.at[blk1_ref[lane]], scratch.at[2 * sl], sem.at[2 * sl]
        ).start()
        pltpu.make_async_copy(
            rows_hbm.at[blk2_ref[lane]], scratch.at[2 * sl + 1],
            sem.at[2 * sl + 1],
        ).start()
    for sl in range(2 * lanes_per_step):
        pltpu.make_async_copy(
            rows_hbm.at[0], scratch.at[sl], sem.at[sl]
        ).wait()

    word_pos = jax.lax.broadcasted_iota(jnp.int32, (8, nw), 1)
    nib_plane = jax.lax.broadcasted_iota(jnp.int32, (8, nw), 0)
    shifts = nib_plane * 4
    pos = word_pos * 8 + nib_plane

    for sl in range(lanes_per_step):
        lane = g * lanes_per_step + sl
        off1 = aux_ref[lane, 0]
        off2 = aux_ref[lane, 1]
        lower = aux_ref[lane, 2]
        lower_rev = aux_ref[lane, 3]
        sent = aux_ref[lane, 6] - aux_ref[lane, 5]

        def counts(buf_idx, off):
            cp = [scratch[buf_idx, c] for c in (1, 2, 3, 4)]
            words = scratch[buf_idx, 6:W]
            symbols = (words[None, :] >> shifts) & 0xF
            in_prefix = pos <= off
            return [
                jnp.where(
                    off >= 0,
                    jnp.sum(
                        jnp.where((symbols == r) & in_prefix, 1, 0),
                        dtype=jnp.int32,
                    )
                    + cp[r - 1],
                    0,
                )
                for r in (1, 2, 3, 4)
            ]

        occ1 = counts(2 * sl, off1)
        occ2 = counts(2 * sl + 1, off2)

        l_run = lower_rev
        s_run = sent
        for slot, c in enumerate((4, 3, 2, 1)):
            l_run = l_run + s_run
            o = jnp.where(lower == 0, 0, occ1[c - 1])
            s_run = occ2[c - 1] - o
            out_ref[lane, slot] = less_ref[c] + o
            out_ref[lane, 4 + slot] = l_run
            out_ref[lane, 8 + slot] = s_run


@functools.partial(jax.jit, static_argnames=("occ_k", "interpret"))
def _extend_pallas(rows, less, blk1, blk2, aux, occ_k, interpret=False):
    L = blk1.shape[0]
    W = rows.shape[1]
    assert L % LANES_PER_STEP == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L // LANES_PER_STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux (L, 8)
            pl.BlockSpec(memory_space=pltpu.ANY),  # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # less (8,)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),  # (L, 12)
        scratch_shapes=[
            pltpu.VMEM((2 * LANES_PER_STEP, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * LANES_PER_STEP,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _extend_kernel, occ_k=occ_k, lanes_per_step=LANES_PER_STEP
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, 12), jnp.int32),
        interpret=interpret,
    )(blk1, blk2, aux, rows, less)
    return out[:, 0:4], out[:, 4:8], out[:, 8:12]


def extend_batch_pallas(index: DeviceFmIndex, lower, lower_rev, size,
                        interpret: bool = False):
    """Drop-in replacement for ops.fm.extend_batch via the Pallas kernel."""
    k = index.occ_k
    r1 = lower - 1
    r2 = lower + size - 1
    r1_eff = jnp.where(lower == 0, -1, r1)
    blk1 = jnp.maximum(r1_eff, 0) // k
    blk2 = jnp.maximum(r2, 0) // k
    off1 = jnp.where(r1_eff >= 0, r1_eff % k, -1)
    off2 = jnp.where(r2 >= 0, r2 % k, -1)
    s0, s1 = index.sentinels[0], index.sentinels[1]

    def sent_count(r):
        return (r >= s0).astype(jnp.int32) + (r >= s1).astype(jnp.int32)

    sent1 = jnp.where(lower == 0, 0, sent_count(r1))
    sent2 = sent_count(r2)
    L = lower.shape[0]
    aux = jnp.stack(
        [off1, off2, lower, lower_rev, size, sent1, sent2,
         jnp.zeros((L,), jnp.int32)],
        axis=1,
    ).astype(jnp.int32)
    less8 = jnp.zeros((8,), jnp.int32).at[: index.less.shape[0]].set(
        index.less.astype(jnp.int32)
    )
    return _extend_pallas(
        index.rows, less8, blk1.astype(jnp.int32), blk2.astype(jnp.int32),
        aux, index.occ_k, interpret,
    )
