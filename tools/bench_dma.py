#!/usr/bin/env python3
"""Microbenchmark: scattered-row DMA issue cost inside a Pallas TPU kernel.

Design question for the pool-step mega-kernel (ROADMAP lever 1): each
search step needs 2 occ rows per lane fetched from HBM at data-dependent
block indices.  At L=512 lanes that is ~1024 small (64-128B) DMAs per
step.  This kernel runs T steps of exactly that access pattern (indices
mutate per step so nothing can be hoisted) and reports us/step, compared
with the XLA gather doing the same work from outside.

Run on the real chip: python tools/bench_dma.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

NB = 1 << 20  # number of HBM rows


def scatter_dma_kernel(blk_ref, rows_hbm, out_ref, scratch, sem, *, lanes, steps, width):
    """T steps; each step DMAs `lanes` rows at mutated indices, reduces."""

    def step_body(t, acc):
        def issue(i, _):
            idx = (blk_ref[i] + t * 1237 + acc.astype(jnp.int32) % 7) % NB
            pltpu.make_async_copy(
                rows_hbm.at[idx], scratch.at[i], sem.at[i]
            ).start()
            return 0

        jax.lax.fori_loop(0, lanes, issue, 0)

        def wait(i, _):
            pltpu.make_async_copy(rows_hbm.at[0], scratch.at[i], sem.at[i]).wait()
            return 0

        jax.lax.fori_loop(0, lanes, wait, 0)
        return acc + jnp.sum(scratch[:, 0].astype(jnp.float32))

    out_ref[0, 0] = jax.lax.fori_loop(0, steps, step_body, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("lanes", "steps", "width"))
def run_scatter(rows, blk, lanes, steps, width):
    return pl.pallas_call(
        functools.partial(scatter_dma_kernel, lanes=lanes, steps=steps, width=width),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((lanes, width), jnp.int32),
                pltpu.SemaphoreType.DMA((lanes,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(blk, rows)


@functools.partial(jax.jit, static_argnames=("steps",))
def run_xla_gather(rows, blk, steps):
    def body(t, carry):
        acc, blk = carry
        g = rows[(blk + t * 1237) % NB]  # (L, W) gather
        return acc + jnp.sum(g[:, 0].astype(jnp.float32)), blk

    acc, _ = jax.lax.fori_loop(0, steps, body, (jnp.float32(0.0), blk))
    return acc


def main():
    width = int(os.environ.get("W", 128))  # int32 words per row; the axon
    # terminal's Nov-2025 Mosaic only compiles DMA-sliced refs whose minor
    # dim is exactly 128 (see ROADMAP "axon DMA findings")
    lanes = int(os.environ.get("L", 1024))
    steps = int(os.environ.get("T", 200))
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 100, size=(NB, width), dtype=np.int32))
    blk = jnp.asarray(rng.integers(0, NB, size=lanes, dtype=np.int32))

    for name, fn in [
        ("pallas-scatter-dma", lambda: run_scatter(rows, blk, lanes, steps, width)),
        ("xla-gather-loop", lambda: run_xla_gather(rows, blk, steps)),
    ]:
        try:
            r = jax.block_until_ready(fn())  # compile+warm
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn())
            dt = time.perf_counter() - t0
            print(f"{name}: L={lanes} W={width} T={steps}: "
                  f"{dt*1e6/steps:.1f} us/step ({dt*1e3:.1f} ms total)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
