"""Pallas extension-sweep kernel vs the XLA implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.ops.fm import DeviceFmIndex, extend_batch
from mapad_tpu.ops.fm_pallas import extend_batch_pallas


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(0)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=5000))
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    dev = DeviceFmIndex.from_host(fmd)
    L = 64
    lower = jnp.asarray(rng.integers(0, dev.text_len - 100, L), jnp.int32)
    lrev = jnp.asarray(rng.integers(0, dev.text_len - 100, L), jnp.int32)
    size = jnp.asarray(rng.integers(1, 50, L), jnp.int32)
    return dev, lower.at[0].set(0), lrev, size


def test_pallas_extend_interpret(fixture):
    dev, lower, lrev, size = fixture
    want = extend_batch(dev, lower, lrev, size)
    got = extend_batch_pallas(dev, lower, lrev, size, interpret=True)
    for w, g, name in zip(want, got, ("lower", "lrev", "size")):
        assert np.array_equal(np.asarray(w), np.asarray(g)), name


def test_pallas_extend_compiled(fixture):
    """Compiled path; skipped where the backend cannot lower the kernel
    (e.g. the axon remote-compile helper rejects manual-DMA kernels)."""
    dev, lower, lrev, size = fixture
    try:
        got = jax.tree.map(
            np.asarray, extend_batch_pallas(dev, lower, lrev, size)
        )
    except Exception as e:  # pragma: no cover - backend-dependent
        pytest.skip(f"pallas compile unsupported on this backend: {e!r:.120}")
    want = jax.tree.map(np.asarray, extend_batch(dev, lower, lrev, size))
    for w, g, name in zip(want, got, ("lower", "lrev", "size")):
        assert np.array_equal(w, g), name
