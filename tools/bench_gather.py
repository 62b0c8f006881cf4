#!/usr/bin/env python3
"""Micro-benchmark gather strategies on the real chip.

The pool2 trace showed XLA staging whole gather tables through VMEM in
windows per loop step (slut_flat: 4 x 3MB slices/step; consts likewise)
while other gathers (occ rows) go direct.  This times the candidate
replacements inside a while_loop so loop-invariant-hoisting behavior
matches the kernel's.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

L = 512
RM = 4096 * 128
STEPS = 1000


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t)
    print(f"{name:44s} {best/STEPS*1e6:8.2f} us/step", flush=True)


def loop(body, state):
    def cond(c):
        return c[0] < STEPS

    def b(c):
        i = c[0]
        return (i + 1,) + body(i, *c[1:])

    return jax.lax.while_loop(cond, b, (jnp.int32(0),) + state)


key = jax.random.PRNGKey(0)
table6 = jax.random.normal(key, (RM, 6), jnp.float32)
tableT = table6.T.copy()  # (6, RM)
consts = jax.random.normal(key, (4096, 5), jnp.float32)
idx0 = jax.random.randint(key, (L, 3), 0, RM, jnp.int32)
cidx0 = jax.random.randint(key, (L,), 0, 4096, jnp.int32)

# st_pack-like store: (L, SLOTS, NF)
S = 2048
SLOTS = S * 9 + 1
NF = 8
store = jnp.zeros((L, SLOTS, NF), jnp.int32)
blk0 = jax.random.randint(key, (L,), 0, S, jnp.int32)
lanes = jnp.arange(L, dtype=jnp.int32)[:, None]
cand_iota = jax.lax.broadcasted_iota(jnp.int32, (L, 9), 1)


@jax.jit
def g_2didx(idx):
    def body(i, idx, acc):
        rows = table6[idx]  # (L, 3, 6)
        s = jnp.sum(rows, axis=(1, 2))
        return (idx + 1) % RM, acc + s

    return loop(body, (idx, jnp.zeros(L)))


@jax.jit
def g_flatidx(idx):
    def body(i, idx, acc):
        rows = table6[idx.reshape(-1)].reshape(L, 3, 6)
        s = jnp.sum(rows, axis=(1, 2))
        return (idx + 1) % RM, acc + s

    return loop(body, (idx, jnp.zeros(L)))


@jax.jit
def g_cols(idx):
    cols = [table6[:, c] for c in range(6)]

    def body(i, idx, acc):
        f = idx.reshape(-1)
        s = jnp.zeros(L)
        for c in range(6):
            s = s + jnp.sum(cols[c][f].reshape(L, 3), axis=1)
        return (idx + 1) % RM, acc + s

    return loop(body, (idx, jnp.zeros(L)))


@jax.jit
def g_transposed(idx):
    def body(i, idx, acc):
        rows = tableT[:, idx.reshape(-1)]  # (6, L*3)
        s = jnp.sum(rows.reshape(6, L, 3), axis=(0, 2))
        return (idx + 1) % RM, acc + s

    return loop(body, (idx, jnp.zeros(L)))


@jax.jit
def c_2d(cidx):
    def body(i, cidx, acc):
        rows = consts[cidx]  # (L, 5)
        return (cidx + 1) % 4096, acc + jnp.sum(rows, axis=1)

    return loop(body, (cidx, jnp.zeros(L)))


@jax.jit
def c_cols(cidx):
    cols = [consts[:, c] for c in range(5)]

    def body(i, cidx, acc):
        s = jnp.zeros(L)
        for c in range(5):
            s = s + cols[c][cidx]
        return (cidx + 1) % 4096, acc + s

    return loop(body, (cidx, jnp.zeros(L)))


@jax.jit
def st_9rows(blk):
    def body(i, blk, acc):
        rows = store[lanes, blk[:, None] * 9 + cand_iota]  # (L, 9, NF)
        return (blk + 1) % S, acc + jnp.sum(rows, axis=(1, 2))

    return loop(body, (blk, jnp.zeros(L, jnp.int32)))


@jax.jit
def st_block(blk):
    st3 = store.reshape(L, SLOTS * NF)

    def body(i, blk, acc):
        # one 72-word contiguous slice per lane via gather of flat rows
        starts = blk * (9 * NF)
        offs = jax.lax.broadcasted_iota(jnp.int32, (L, 9 * NF), 1)
        rows = st3[lanes, starts[:, None] + offs]
        return (blk + 1) % S, acc + jnp.sum(rows, axis=1)

    return loop(body, (blk, jnp.zeros(L, jnp.int32)))


@jax.jit
def st_gather_op(blk):
    # lax.gather with slice_sizes=(1, 9, NF): one contiguous 288B slice/lane
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )

    def body(i, blk, acc):
        starts = jnp.stack([lanes[:, 0], blk * 9], axis=1)  # (L, 2)
        rows = jax.lax.gather(
            store, starts, dnums, slice_sizes=(1, 9, NF),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (L, 9, NF)
        return (blk + 1) % S, acc + jnp.sum(rows, axis=(1, 2))

    return loop(body, (blk, jnp.zeros(L, jnp.int32)))


print(f"L={L} RM={RM} steps={STEPS}", flush=True)
timeit("slut (L,3) 2d-index gather (current)", g_2didx, idx0)
timeit("slut flat-index gather", g_flatidx, idx0)
timeit("slut per-column 1d gathers", g_cols, idx0)
timeit("slut transposed minor-dim gather", g_transposed, idx0)
timeit("consts (L,) row gather (current)", c_2d, cidx0)
timeit("consts per-column 1d gathers", c_cols, cidx0)
timeit("store 9-row gather (current)", st_9rows, blk0)
timeit("store flat 72-word row gather", st_block, blk0)
timeit("store lax.gather block slice", st_gather_op, blk0)
