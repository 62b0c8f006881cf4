#!/usr/bin/env python3
"""A/B: Pallas extend kernel vs the XLA gather path (VERDICT r4 item 5).

Measures the FMD extension sweep -- the pool step's occ-row stage -- as a
CHAINED loop (each iteration's intervals derive from the previous
output, like the dependent steps of the search loop), so the number is
per-step latency, not throughput of an unrolled batch.

Usage: [AB_LANES=512] [AB_STEPS=512] [BENCH_GENOME=4000000] \
       python tools/pallas_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mapad_tpu.ops.fm import DeviceFmIndex, extend_batch
from mapad_tpu.ops.fm_pallas import extend_batch_pallas


def chained(fn, index, n_steps):
    @jax.jit
    def run(lower, lower_rev, size):
        def body(_, state):
            lo, lr, sz = state
            out_lo, out_lr, out_sz = fn(index, lo, lr, sz)
            # pick child 0 where non-empty, else reset to the root
            ok = out_sz[:, 0] >= 1
            lo2 = jnp.where(ok, out_lo[:, 0], 0)
            lr2 = jnp.where(ok, out_lr[:, 0], 0)
            sz2 = jnp.where(ok, out_sz[:, 0], index.text_len)
            return lo2.astype(lo.dtype), lr2.astype(lo.dtype), sz2.astype(
                lo.dtype
            )

        return jax.lax.fori_loop(0, n_steps, body, (lower, lower_rev, size))

    return run


def main():
    L = int(os.environ.get("AB_LANES", 512))
    n_steps = int(os.environ.get("AB_STEPS", 512))
    index_h = bench.get_genome_index()
    index = DeviceFmIndex.from_host(index_h.fmd)
    rng = np.random.default_rng(3)
    n = int(index.text_len)
    size0 = rng.integers(1, 50, L)
    lower0 = rng.integers(0, n - 60, L)
    lower = jnp.asarray(lower0, index.idx_dtype)
    lrev = jnp.asarray(lower0, index.idx_dtype)
    size = jnp.asarray(size0, index.idx_dtype)

    for name, fn in (
        ("xla_gather", extend_batch),
        ("pallas", lambda idx, lo, lr, sz: extend_batch_pallas(idx, lo, lr,
                                                               sz)),
    ):
        run = chained(fn, index, n_steps)
        try:
            out = jax.tree.map(np.asarray, run(lower, lrev, size))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.tree.map(np.asarray, run(lower, lrev, size))
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: {best / n_steps * 1e6:.1f} us/step "
                  f"(L={L}, {n_steps} chained steps, best of 3); "
                  f"checksum {int(np.sum(out[2]) & 0xFFFFFFFF)}")
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
