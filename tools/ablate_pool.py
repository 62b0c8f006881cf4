#!/usr/bin/env python3
"""Attribute per-step pool-kernel cost on real hardware via ablation.

Runs the pool kernel with debug_fixed_steps so every variant executes the
same number of steps, then toggles debug_ablate flags one at a time (and
cumulatively) and reports the us/step delta each piece costs.

Usage: python tools/ablate_pool.py [lanes] [fixed_steps]
Env: GENOME (default 4e6), READS (default 4096)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

import jax

import bench as benchmod
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.ops.search_pool import PoolConfig
from mapad_tpu.ops.search_pool2 import k_mismatch_search_pool2 as k_mismatch_search_pool

L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
FIXED = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
N_READS = int(os.environ.get("READS", 4096))

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
reads = benchmod.make_reads(index, N_READS)
prep = engine._prepare(reads, 128, N_READS)
sp = engine._params()
pos_args = (
    engine.device_index, prep["pattern_rank"], prep["pattern_code"],
    prep["n"], prep["score_lut"], prep["pen"], prep["split"],
    prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"], sp,
)


def run(cfg, reps=3):
    out = k_mismatch_search_pool(*pos_args, config=cfg)
    np.asarray(out.steps)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = k_mismatch_search_pool(*pos_args, config=cfg)
        steps = int(np.asarray(out.steps))
        dt = time.perf_counter() - t
        best = min(best, dt / steps * 1e6)
    return best, steps


base_cfg = PoolConfig(max_len=128, lanes=L, total_steps=16384,
                      max_chains=8192, compute_forward_part=False,
                      debug_fixed_steps=FIXED)

variants = [
    ("baseline", ()),
    ("-pop", ("pop",)),
    ("-ring", ("ring",)),
    ("-pop-ring", ("pop", "ring")),
    ("-extend", ("extend",)),
    ("-lut", ("lut",)),
    ("-frame", ("frame",)),
    ("-store", ("store",)),
    ("-all", ("pop", "ring", "extend", "lut", "frame", "store")),
]

print(f"L={L} fixed_steps={FIXED} genome={benchmod.GENOME_SIZE} "
      f"reads={N_READS}", flush=True)
base_us = None
for name, flags in variants:
    cfg = base_cfg._replace(debug_ablate=tuple(flags))
    us, steps = run(cfg)
    if base_us is None:
        base_us = us
    print(f"{name:12s} {us:8.1f} us/step   delta {base_us - us:+8.1f}",
          flush=True)
