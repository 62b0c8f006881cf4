#!/usr/bin/env python3
"""Profile one pool-kernel invocation on the real chip.

Produces a jax profiler trace (if the axon backend supports it) and prints
per-invocation wall time + steps so step time is measurable directly.

Env: GENOME (default 4e6), READS (default 4096), LANES/S via PoolConfig.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as benchmod


def main():
    benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
    index = benchmod.get_genome_index()
    from mapad_tpu.map import AlignmentParameters
    from mapad_tpu.models import Discrete, SimpleAncientDnaModel
    from mapad_tpu.ops.engine import DeviceSearchEngine
    from mapad_tpu.ops.search import SearchConfig
    from mapad_tpu.ops.search_pool2 import k_mismatch_search_pool2 as k_mismatch_search_pool

    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.6, 0.55), 0.01, 1.0,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=4096, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    config = SearchConfig(max_len=128, hit_cap=24, compute_forward_part=False)
    engine = DeviceSearchEngine(index.fmd, params, lanes=1024, config=config)

    n_reads = int(os.environ.get("READS", 4096))
    reads = benchmod.make_reads(index, n_reads)
    cfg = engine.pool_config
    sp = engine._params()

    def run_once():
        (h, _packed, _t0, _stash), _ = engine._dispatch_pool(
            reads[:n_reads], sp, n_reads, cfg
        )
        return jax.block_until_ready(h)

    r = run_once()  # compile + warm
    print(f"warm: steps={int(r.steps)}")

    t0 = time.perf_counter()
    r = run_once()
    dt = time.perf_counter() - t0
    steps = int(r.steps)
    print(f"invocation: {dt*1e3:.0f} ms, {steps} steps, "
          f"{dt*1e6/max(steps,1):.0f} us/step, n_chains={int(r.n_chains)}")

    tracedir = os.environ.get("TRACE")
    if tracedir:
        with jax.profiler.trace(tracedir):
            r = run_once()
        print("trace written to", tracedir)


if __name__ == "__main__":
    main()
