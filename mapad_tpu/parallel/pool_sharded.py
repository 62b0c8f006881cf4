"""Mesh-sharded execution of the production pool search kernel.

Multi-chip data parallelism for `k_mismatch_search_pool` (the engine behind
the headline bench): reads and lanes are partitioned over the mesh's 'data'
axis with `shard_map`, the FMD-index and scalar params replicate, and each
shard runs its *own* persistent search loop to completion -- there is no
lock-step barrier between devices, so a shard whose reads finish early
stops stepping instead of idling behind the slowest shard (the multi-chip
analogue of the reference's dynamic dispatcher/worker work distribution,
src/distributed/dispatcher.rs:103-338, re-designed for SPMD: the static
read split replaces the TCP work queue).

Each shard's result keeps *local* read ids; the wrapper re-bases them to
global ids with the shard's offset and stacks every result field along a
leading device axis so the host collector can process shards independently
(completion-order slot semantics hold within a shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.search_pool import PoolConfig, PoolResult


def shard_reads(mesh: Mesh, prep: dict, axis: str = "data") -> dict:
    """Place per-read arrays sharded along the mesh axis (R must divide).

    Host-only entries (the `_stash` fallback views) pass through unsharded.
    """
    sh = NamedSharding(mesh, P(axis))
    return {
        k: v if k.startswith("_") else jax.device_put(v, sh)
        for k, v in prep.items()
    }


def round_robin_permutation(R: int, D: int) -> np.ndarray:
    """Permutation placing reads round-robin into the D contiguous shard
    slices (reads[perm][d*R/D:(d+1)*R/D] = every D-th read, offset d).

    Measured on the bench workload (tools/balance_probe.py): input files
    carry positional correlation (damage/length/repeat-region runs), so a
    contiguous split bears ~14% per-shard step spread while round-robin
    dealing gets ~12% -- and a cost-MODEL deal does no better (Bi-D /
    optimal-score totals do not predict per-read search depth: spearman
    0.04; the true-cost lower bound is ~4% but the cost is unknowable
    host-side).  Round-robin is therefore the production deal: the cheap
    ~90%-efficiency static analogue of the reference's dynamic dispatcher
    queue (src/distributed/dispatcher.rs:165-338).

    Invert with np.argsort(perm) to map results back.
    """
    shard_of = np.arange(R, dtype=np.int64) % D
    return np.argsort(shard_of, kind="stable")


def balanced_shard_permutation(pred_costs: np.ndarray, D: int) -> np.ndarray:
    """Permutation placing reads so the D contiguous shard slices have
    near-equal predicted total cost (snake deal over descending cost).

    Kept for workloads where a real per-read cost estimate exists (e.g.
    re-mapping with measured XD step counts); for a-priori mapping use
    `round_robin_permutation` (see its docstring for the probe numbers).

    Returns `perm` such that reads[perm] has shard d's reads at
    [d*R/D, (d+1)*R/D).  Invert with np.argsort(perm) to map results back.
    """
    R = len(pred_costs)
    order = np.argsort(-np.asarray(pred_costs), kind="stable")
    shard_of = np.empty(R, dtype=np.int64)
    for k in range(R):
        d = k % (2 * D)
        shard_of[order[k]] = d if d < D else 2 * D - 1 - d
    # stable sort by assigned shard -> contiguous slices per shard
    return np.argsort(shard_of, kind="stable")


def pool_search_sharded(
    mesh: Mesh,
    index,
    prep: dict,
    params,
    config: PoolConfig,
    axis: str = "data",
) -> PoolResult:
    """Run the pool kernel as one SPMD program over `mesh`.

    `prep` holds the per-read arrays (pattern_rank, pattern_code, n,
    score_lut, pen, split, cutoff_scale, cutoff_thresh, repr_mm) with a
    leading read axis R divisible by the mesh size; `config.lanes` is the
    per-shard lane count.  Returns a PoolResult whose fields all have a
    leading device axis (D, ...); c_read / lane_read are global read ids.
    """
    from jax import shard_map

    D = mesh.shape[axis]
    R = prep["n"].shape[0]
    assert R % D == 0, f"reads {R} must divide mesh size {D}"
    R_local = R // D

    keys = (
        "pattern_rank", "pattern_code", "n", "score_lut", "pen", "split",
        "cutoff_scale", "cutoff_thresh", "repr_mm",
    )
    # host-bid prep: the prepacked LUT/Bi-D table shards along its row
    # axis too (R*M rows, R divisible by the mesh)
    packed = "slut_packed" in prep
    if packed:
        keys = keys + ("slut_packed",)
    arrays = [prep[k] for k in keys]

    from ..ops.search_pool2 import k_mismatch_search_pool2 as pool_fn

    def shard_fn(index, *arrays):
        if packed:
            *pos, slut = arrays
            res = pool_fn(index, *pos, params, config, slut_packed=slut)
        else:
            res = pool_fn(index, *arrays, params, config)
        base = jax.lax.axis_index(axis).astype(jnp.int32) * R_local
        # local -> global read ids; the "no read" sentinel (local R) maps to
        # a value >= global R so host-side `rid < len(chunk)` checks hold
        c_read = jnp.where(res.c_read >= 0, res.c_read + base, -1)
        lane_read = jnp.where(
            res.lane_read < R_local, res.lane_read + base, R
        )
        res = res._replace(
            c_read=c_read, lane_read=lane_read,
            next_read=res.next_read + base,
        )
        return jax.tree.map(lambda x: jnp.asarray(x)[None], res)

    in_specs = (
        jax.tree.map(lambda _: P(), index),  # replicated index
    ) + tuple(P(axis) for _ in arrays)
    out_specs = jax.tree.map(lambda _: P(axis), PoolResult(
        *([0] * len(PoolResult._fields))
    ))

    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fn(index, *arrays)


def collect_sharded(engine, chunk, result: PoolResult, out, t0):
    """Host-side collection of a sharded PoolResult.

    Mirrors DeviceSearchEngine._collect_pool per shard: shard d owns reads
    [d*R_local, (d+1)*R_local).  Returns the set of escalated global read
    indices.
    """
    result = jax.tree.map(np.asarray, result)
    D = result.c_read.shape[0]
    R_local = (len(chunk) + D - 1) // D
    escalated = set()
    for d in range(D):
        shard_res = jax.tree.map(lambda x: x[d], result)
        lo = d * R_local
        hi = min(lo + R_local, len(chunk))
        sub = chunk[lo:hi]
        # shard-local result already carries global read ids; collect with
        # a base of 0 but a chunk slice offset by lo, so re-base ids here
        shard_res = shard_res._replace(
            c_read=np.where(
                shard_res.c_read >= 0, shard_res.c_read - lo, -1
            ),
            lane_read=np.where(
                shard_res.lane_read < len(chunk), shard_res.lane_read - lo,
                len(sub),
            ),
            next_read=min(max(int(shard_res.next_read) - lo, 0), len(sub)),
        )
        esc = engine._collect_pool(sub, shard_res, out, lo, t0)
        escalated.update(lo + i for i in esc)
    return escalated
