"""Dump the Mosaic module text for a failing (sliced HBM src) and a passing
(sliced HBM dst) DMA kernel, to diff what the old terminal compiler chokes on.
"""
import base64
import json
import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128
rows = jnp.asarray(np.arange(8 * W, dtype=np.int32).reshape(8, W))

mods = {}

import jax._src.tpu_custom_call as tcc

orig = tcc._lower_mosaic_module_to_asm

def spy(module, **kw):
    mods[os.environ.get("_CUR", "?")] = str(module)
    return orig(module, **kw)

tcc._lower_mosaic_module_to_asm = spy


def k_src(rows_hbm, out_ref, scratch, sem):
    cp = pltpu.make_async_copy(rows_hbm.at[pl.ds(2, 1)], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[:, :] = scratch[:, :]


def k_dst(in_ref, out_hbm, scratch, sem):
    scratch[:, :] = in_ref[:, :] + 1
    cp = pltpu.make_async_copy(scratch, out_hbm.at[pl.ds(3, 1)], sem)
    cp.start()
    cp.wait()


os.environ["_CUR"] = "src"
try:
    pl.pallas_call(
        k_src,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.int32), pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
    )(rows)
    print("src: OK?!")
except Exception as e:
    print("src:", type(e).__name__)

os.environ["_CUR"] = "dst"
try:
    pl.pallas_call(
        k_dst,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.int32), pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
    )(rows[:1])
    print("dst: OK")
except Exception as e:
    print("dst:", type(e).__name__)

with open("/tmp/mod_src.mlir", "w") as f:
    f.write(mods.get("src", "NONE"))
with open("/tmp/mod_dst.mlir", "w") as f:
    f.write(mods.get("dst", "NONE"))
print("wrote /tmp/mod_src.mlir /tmp/mod_dst.mlir")
