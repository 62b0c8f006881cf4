#!/usr/bin/env python3
"""Round-2 chip measurement: gen-2 step time after score-LUT packing,
read_step_cap sweep (pop-pass cost scales with CAP), and real-termination
throughput at the kernel level.

One process so the axon first-invocation startup cost is paid once.
Usage: python tools/measure_r2.py
Env: GENOME (default 4e6), READS (default 4096), LANES (default 512)
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

L = int(os.environ.get("LANES", 512))
benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
N_READS = int(os.environ.get("READS", 4096))
S = int(os.environ.get("STEPS", 8192))

index = benchmod.get_genome_index()
mark(f"index loaded ({benchmod.GENOME_SIZE} bp)")
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
reads = benchmod.make_reads(index, N_READS)
mlen = max(len(r.sequence) for r in reads)
M = min(128, max(16, -(-mlen // 16) * 16))
prep = engine._prepare(reads, M, N_READS)
sp = engine._params()
pos_args = (
    engine.device_index, prep["pattern_rank"], prep["pattern_code"],
    prep["n"], prep["score_lut"], prep["pen"], prep["split"],
    prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"], sp,
)
mark(f"host prep done (M={M}, {N_READS} reads)")

kern = _pool_impl()


def run(cfg, reps=3, label=""):
    t = time.perf_counter()
    out = kern(*pos_args, config=cfg)
    steps = int(np.asarray(out.steps))
    mark(f"{label}: first invocation {time.perf_counter() - t:.1f}s "
         f"({steps} steps)")
    best_total, best_us = float("inf"), float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = kern(*pos_args, config=cfg)
        steps = int(np.asarray(out.steps))
        dt = time.perf_counter() - t
        best_total = min(best_total, dt)
        best_us = min(best_us, dt / steps * 1e6)
    unfin = int(np.asarray(out.lane_unfinished).sum())
    nch = int(np.asarray(out.n_chains))
    mark(f"{label}: {best_total*1e3:8.1f} ms  {best_us:7.1f} us/step  "
         f"steps={steps} unfinished={unfin} chains={nch}")
    return best_total, best_us, steps


base = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=8192,
                  compute_forward_part=False)

# 1. fixed-step timing (pure step cost, CAP sweep: pop passes are (L,CAP+1))
for cap in (2048, 1024, 512, 256):
    cfg = base._replace(read_step_cap=cap, debug_fixed_steps=1024)
    run(cfg, label=f"fixed1024 CAP={cap}")

# 2. real termination at each CAP (throughput + abandon tradeoff)
for cap in (2048, 1024, 512):
    cfg = base._replace(read_step_cap=cap)
    total, us, steps = run(cfg, label=f"real CAP={cap}")
    mark(f"  -> kernel-level reads/s at CAP={cap}: {N_READS/total:,.0f}")

mark("done")
