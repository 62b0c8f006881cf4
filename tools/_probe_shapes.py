"""Probe which DMA ref shapes the terminal's (Nov-2025) Mosaic accepts.

Empirically the old compile helper aborts on DMA-sliced refs whose minor dim
is not exactly 128 (W=32/64/256 all fail, W=128 works).  This maps the
boundary for the pool-step mega-kernel design: occ rows, frame slabs and
chain-log writes must use compliant shapes.
"""
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

results = []


def probe(name, fn):
    try:
        out = fn()
        np.asarray(jax.block_until_ready(out))
        results.append((name, "OK"))
    except Exception as e:
        results.append((name, f"FAIL {type(e).__name__} {str(e)[:60]}"))
    print(results[-1])


def src_slice(shape, sl, blkshape):
    rows = jnp.zeros(shape, jnp.int32)

    def k(rows_hbm, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(rows_hbm.at[sl], scratch, sem)
        cp.start(); cp.wait()
        out_ref[...] = scratch[...]

    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(blkshape, jnp.int32), pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct(blkshape, jnp.int32),
    )(rows)


def dst_slice(shape, sl, blkshape):
    def k(in_ref, out_hbm, scratch, sem):
        scratch[...] = in_ref[...]
        cp = pltpu.make_async_copy(scratch, out_hbm.at[sl], sem)
        cp.start(); cp.wait()

    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM(blkshape, jnp.int32), pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )(jnp.zeros(blkshape, jnp.int32))


probe("src (64,128)->(2,128)", lambda: src_slice((64, 128), (pl.ds(6, 2),), (2, 128)))
probe("src (64,128)->(8,128)", lambda: src_slice((64, 128), (pl.ds(8, 8),), (8, 128)))
probe("src 3d (64,2,128)->(1,2,128)",
      lambda: src_slice((64, 2, 128), (pl.ds(3, 1),), (1, 2, 128)))
probe("src 3d (64,8,128)->(1,8,128)",
      lambda: src_slice((64, 8, 128), (pl.ds(3, 1),), (1, 8, 128)))
probe("dst (1024,128) write (72,128)",
      lambda: dst_slice((1024, 128), (pl.ds(100, 72),), (72, 128)))
probe("src (64,256)->(1,256) KNOWN BAD",
      lambda: src_slice((64, 256), (pl.ds(3, 1),), (1, 256)))
probe("src (64,384)->(1,384)", lambda: src_slice((64, 384), (pl.ds(3, 1),), (1, 384)))
probe("src 2-minor slice (64,256)->(1,128)",
      lambda: src_slice((64, 256), (pl.ds(3, 1), pl.ds(0, 128)), (1, 128)))
print("---- summary ----")
for n, r in results:
    print(f"{r.split()[0]:5s} {n}")
