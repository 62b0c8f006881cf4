import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, W = 1024, 32
rows = jnp.asarray(np.arange(NB * W, dtype=np.int32).reshape(NB, W))


def k9(rows_hbm, out_ref, scratch, sem):
    cp = pltpu.make_async_copy(rows_hbm.at[pl.ds(7, 1)], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[:, :] = scratch[:, :]


def t9():
    return pl.pallas_call(
        k9,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.int32), pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
    )(rows)


try:
    t9()
    print("OK?!")
except Exception as e:
    print("expected fail", type(e).__name__)
