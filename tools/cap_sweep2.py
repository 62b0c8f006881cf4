#!/usr/bin/env python3
"""read_step_cap sweep for the two-level-pop gen-2 kernel (8192 reads)."""

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
S = int(os.environ.get("STEPS", 8192))
L = int(os.environ.get("LANES", 512))

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
    index.fmd, params, lanes=L,
    config=SearchConfig(max_len=128, hit_cap=24, compute_forward_part=False),
    tiers=((2048, None),),
)
reads = benchmod.load_reads(benchmod.reads_fastq(index, N_READS))
mlen = max(len(r.sequence) for r in reads)
M = min(128, max(16, -(-mlen // 16) * 16))
prep = engine._prepare(reads, M, N_READS, host_bid=True)
sp = engine._params()
kern = _pool_impl()
mark(f"prep done (M={M}, R={N_READS}, L={L})")

CAPS = tuple(
    int(x) for x in os.environ.get("CAPS", "1024,2048,4096,8192").split(",")
)

for cap in CAPS:
    cfg = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=16384,
                     compute_forward_part=False,
                     read_step_cap=min(cap, S))

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
    mark(f"CAP={cap}: first invocation {time.perf_counter()-t:.1f}s")
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        out = run()
        steps = int(np.asarray(out.steps))
        best = min(best, time.perf_counter() - t)
    ab = int(np.asarray(out.c_abandon).sum())
    unfin = int(np.asarray(out.lane_unfinished).sum())
    mark(f"CAP={cap}: {best*1e3:7.1f} ms {best/steps*1e6:6.1f} us/step "
         f"steps={steps} abandons={ab} unfin={unfin} -> "
         f"{N_READS/best:,.0f} reads/s")
mark("done")
