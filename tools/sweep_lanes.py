#!/usr/bin/env python3
"""Lane-count sweep for the packed gen-2 pool kernel.

Per-lane work is fixed by the read set; wider pools amortize per-step
launch overhead but grow per-step gather/elementwise cost.  Round-1 found
L=512 optimal pre-packing; re-check now the step is leaner.

Usage: python tools/sweep_lanes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


import bench as benchmod
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import DeviceSearchEngine, _pool_impl
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.ops.search_pool import PoolConfig

benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
N_READS = int(os.environ.get("READS", 8192))
CAP = int(os.environ.get("CAP", 1024))

index = benchmod.get_genome_index()
dm = SimpleAncientDnaModel(("single_stranded", 0.6, 0.55), 0.01, 1.0,
                           np.float32(0.02) / np.float32(3.0), False)
repr_mm = dm.get_representative_mismatch_penalty()
params = AlignmentParameters(
    difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
    penalty_gap_open=repr_mm * np.float32(1.5),
    penalty_gap_extend=repr_mm * np.float32(0.5),
    chunk_size=N_READS, gap_dist_ends=5, stack_limit_abort=False,
    max_num_gaps_open=2,
)
engine = DeviceSearchEngine(
    index.fmd, params, lanes=512,
    config=SearchConfig(max_len=128, hit_cap=24, compute_forward_part=False),
    tiers=((2048, None),),
)
reads = benchmod.make_reads(index, N_READS)
mlen = max(len(r.sequence) for r in reads)
M = min(128, max(16, -(-mlen // 16) * 16))
prep = engine._prepare(reads, M, N_READS, host_bid=True)
sp = engine._params()
kern = _pool_impl()
mark(f"prep done (M={M}, R={N_READS})")

for L in (256, 512, 1024, 2048):
    # keep the frame-store HBM budget roughly constant
    S = max(2048, (512 * 8192) // L)
    cfg = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=8192,
                     compute_forward_part=False, read_step_cap=min(CAP, S))

    def run(c=cfg):
        return kern(
            engine.device_index, prep["pattern_rank"], prep["pattern_code"],
            prep["n"], prep["score_lut"], prep["pen"], prep["split"],
            prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
            sp, c, slut_packed=prep["slut_packed"],
        )

    t = time.perf_counter()
    out = run()
    steps = int(np.asarray(out.steps))
    mark(f"L={L} S={S}: first invocation {time.perf_counter()-t:.1f}s")
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        out = run()
        steps = int(np.asarray(out.steps))
        best = min(best, time.perf_counter() - t)
    unfin = int(np.asarray(out.lane_unfinished).sum())
    nch = int(np.asarray(out.n_chains))
    mark(f"L={L} S={S}: {best*1e3:7.1f} ms  {best/steps*1e6:6.1f} us/step "
         f"steps={steps} chains={nch} unfin={unfin} -> "
         f"{N_READS/best:,.0f} reads/s")
mark("done")
