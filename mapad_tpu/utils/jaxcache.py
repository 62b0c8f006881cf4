"""Persistent XLA compilation cache setup.

The batched search kernel takes minutes to compile (especially through
remote-device tunnels); caching compiled executables on disk makes every
process after the first start instantly.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "mapad_tpu", "xla_cache"
)


def enable_compile_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("MAPAD_TPU_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
