import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench. NOTE: on this jax build the JAX_PLATFORMS env var and the old
# xla_force_host_platform_device_count flag are NOT honored for the CPU
# device count -- only the config route works, and both knobs must be set
# before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("MAPAD_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compile cache: the search kernel compiles once, then all
# subsequent test runs start instantly.
from mapad_tpu.utils.jaxcache import enable_compile_cache  # noqa: E402

enable_compile_cache()
