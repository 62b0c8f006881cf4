"""Multi-chip sharding of the batched search.

The domain's parallelism is data parallelism over reads (the reference's
rayon par_iter and dispatcher/worker modes, SURVEY.md §2.3): lanes shard
across the mesh's 'data' axis while the FMD-index and scoring tables
replicate.  XLA SPMD partitions the whole search while_loop cleanly because
lanes are independent; the only cross-device communication is the
all-reduce of the `all(done)` loop condition and final stats reductions,
which ride ICI.

For pod-scale genomes the index can instead be sharded by reference
partition (each shard maps every read against its partition and best hits
reduce with psum/argmax); that mode is planned once genomes exceed
single-chip HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible; set "
                f"jax.config.jax_num_cpu_devices before first use"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_search_inputs(mesh: Mesh, prep: dict, axis: str = "data") -> dict:
    """Place per-lane arrays sharded over the mesh; lane count must divide."""
    lane_sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in prep.items():
        # host-only entries (the `_stash` fallback views) stay unsharded
        out[k] = v if k.startswith("_") else jax.device_put(v, lane_sharding)
    return out


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))
