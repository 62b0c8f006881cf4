import os
import sys

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for bench.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache: the search kernel compiles once, then all
# subsequent test runs start instantly.
from mapad_tpu.utils.jaxcache import enable_compile_cache  # noqa: E402

enable_compile_cache()
