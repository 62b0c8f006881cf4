"""Multi-chip sharding test on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_search_equals_single_device():
    """The mesh-sharded search must produce the same hits as unsharded."""
    import importlib.util
    import os

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mapad_tpu.ops.search import k_mismatch_search_batch
    from mapad_tpu.parallel.sharding import make_mesh, shard_search_inputs

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    engine, prep, config = mod._tiny_problem(16)
    params = engine._params()

    def run(index, p):
        return k_mismatch_search_batch(
            index, p["pattern_rank"], p["pattern_code"], p["n"],
            p["score_lut"], p["pen"], p["split"], p["cutoff_scale"],
            p["cutoff_thresh"], p["repr_mm"], params, config,
        )

    base = jax.tree.map(np.asarray, run(engine.device_index, prep))

    mesh = make_mesh(8)
    sharded = shard_search_inputs(mesh, prep)
    index = jax.device_put(engine.device_index, NamedSharding(mesh, P()))
    got = jax.tree.map(np.asarray, run(index, sharded))

    assert np.array_equal(got.hcount, base.hcount)
    assert np.array_equal(got.h_lower, base.h_lower)
    assert np.array_equal(got.h_ops, base.h_ops)
    assert np.allclose(got.h_score, base.h_score, equal_nan=True)
