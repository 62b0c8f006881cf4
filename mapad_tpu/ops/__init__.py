"""Device (TPU) compute kernels.

x64 is enabled for the whole process so the int64 ("big") device-index
mode -- genomes with >= 2^31 text symbols, e.g. doubled human references --
can do 64-bit interval arithmetic.  All compute-path code uses explicit
dtypes, so the flag does not change any f32/int32 kernel semantics (the
device-vs-oracle equivalence suite runs under this exact configuration).
"""

import jax

jax.config.update("jax_enable_x64", True)
