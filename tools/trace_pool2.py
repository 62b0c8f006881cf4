#!/usr/bin/env python3
"""Trace one packed (host-bid) gen-2 pool invocation and print the top ops.

Usage: python tools/trace_pool2.py [out_dir]
Env: GENOME, READS, LANES, STEPS, CAP as in measure_inv.py
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
from mapad_tpu.ops.engine import DeviceSearchEngine, _pool_impl
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.ops.search_pool import PoolConfig

L = int(os.environ.get("LANES", 512))
benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
N_READS = int(os.environ.get("READS", 4096))
S = int(os.environ.get("STEPS", 8192))
CAP = int(os.environ.get("CAP", 1024))
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pool2_trace"

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
mlen = max(len(r.sequence) for r in reads)
M = min(128, max(16, -(-mlen // 16) * 16))
prep = engine._prepare(reads, M, N_READS, host_bid=True)
sp = engine._params()
kern = _pool_impl()
cfg = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=8192,
                 compute_forward_part=False, read_step_cap=CAP)


def run():
    out = kern(
        engine.device_index, prep["pattern_rank"], prep["pattern_code"],
        prep["n"], prep["score_lut"], prep["pen"], prep["split"],
        prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
        sp, cfg, slut_packed=prep["slut_packed"],
    )
    return int(np.asarray(out.steps))


steps = run()
print(f"warm: steps={steps}", flush=True)
t = time.perf_counter()
steps = run()
print(f"invocation: {(time.perf_counter()-t)*1e3:.1f} ms, {steps} steps",
      flush=True)

with jax.profiler.trace(OUT):
    run()
print("trace written to", OUT, flush=True)

import subprocess

subprocess.run([sys.executable,
                os.path.join(os.path.dirname(__file__), "xplane_top.py"),
                OUT, "40"])
