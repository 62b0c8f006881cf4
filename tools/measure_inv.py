#!/usr/bin/env python3
"""Attribute the per-invocation fixed overhead of the gen-2 pool kernel.

measure_r2.py showed: true step cost ~70-83 us but ~232 ms invocation
overhead (fixed1024 vs real-termination regression).  This times the
candidate components on the chip with the same inputs:
  - compute_bi_d alone (jitted standalone)
  - score-LUT packing alone
  - while-loop with debug_fixed_steps in {1, 128, 1024} -> linear fit
  - full invocation with real termination

Usage: python tools/measure_inv.py
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


import functools

import jax
import jax.numpy as jnp

import bench as benchmod
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.bi_d import compute_bi_d
from mapad_tpu.ops.engine import DeviceSearchEngine, _pool_impl
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.ops.search_pool import PoolConfig

L = int(os.environ.get("LANES", 512))
benchmod.GENOME_SIZE = int(os.environ.get("GENOME", 4_000_000))
N_READS = int(os.environ.get("READS", 4096))
S = int(os.environ.get("STEPS", 8192))

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
prep = engine._prepare(reads, M, N_READS)
sp = engine._params()
pos_args = (
    engine.device_index, prep["pattern_rank"], prep["pattern_code"],
    prep["n"], prep["score_lut"], prep["pen"], prep["split"],
    prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"], sp,
)
mark(f"prep done (M={M}, R={N_READS}, L={L}, S={S})")


def timeit(fn, fetch, label, reps=4):
    out = fn()
    np.asarray(fetch(out))
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = fn()
        np.asarray(fetch(out))
        best = min(best, time.perf_counter() - t)
    mark(f"{label}: {best*1e3:8.2f} ms")
    return best


# --- component: Bi-D alone ---
bid_jit = jax.jit(functools.partial(compute_bi_d,
                                    compute_forward_part=False))
timeit(
    lambda: bid_jit(engine.device_index, prep["pattern_rank"], prep["pen"],
                    prep["n"], prep["split"]),
    lambda o: o[0, 0], "compute_bi_d (R=4096, M=%d)" % M,
)


# --- while-loop scaling: fixed_steps in {1, 128, 1024} ---
kern = _pool_impl()
base = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=8192,
                  compute_forward_part=False, read_step_cap=1024)
times = {}
for fs in (1, 128, 1024):
    cfg = base._replace(debug_fixed_steps=fs)
    t = timeit(lambda c=cfg: kern(*pos_args, config=c),
               lambda o: o.steps, f"invocation fixed_steps={fs}")
    times[fs] = t
c = (times[1024] - times[128]) / (1024 - 128)
f = times[128] - 128 * c
mark(f"linear fit: step={c*1e6:.1f} us, fixed-overhead={f*1e3:.1f} ms "
     f"(fs=1 direct: {times[1]*1e3:.1f} ms)")

# --- real termination for reference ---
cfg = base
t = timeit(lambda: kern(*pos_args, config=cfg), lambda o: o.steps,
           "invocation real-termination")
out = kern(*pos_args, config=cfg)
steps = int(np.asarray(out.steps))
mark(f"real steps={steps} -> derived loop={steps*c*1e3:.1f} ms + "
     f"overhead={f*1e3:.1f} ms vs measured {t*1e3:.1f} ms")

# --- host-bid (slut_packed) path: device skips Bi-D + packing ---
t_h = time.perf_counter()
prep_h = engine._prepare(reads, M, N_READS, host_bid=True)
mark(f"host prep w/ C++ bid+pack: {(time.perf_counter()-t_h)*1e3:.1f} ms "
     "(host wall, overlaps device in the pipeline)")
pos_h = (
    engine.device_index, prep_h["pattern_rank"], prep_h["pattern_code"],
    prep_h["n"], prep_h["score_lut"], prep_h["pen"], prep_h["split"],
    prep_h["cutoff_scale"], prep_h["cutoff_thresh"], prep_h["repr_mm"], sp,
)
for fs in (1, 1024):
    cfgf = base._replace(debug_fixed_steps=fs)
    timeit(lambda c=cfgf: kern(*pos_h, config=c,
                               slut_packed=prep_h["slut_packed"]),
           lambda o: o.steps, f"packed fixed_steps={fs}")
t = timeit(lambda: kern(*pos_h, config=base,
                        slut_packed=prep_h["slut_packed"]),
           lambda o: o.steps, "packed real-termination")
out = kern(*pos_h, config=base, slut_packed=prep_h["slut_packed"])
steps = int(np.asarray(out.steps))
mark(f"packed real steps={steps}, kernel-level reads/s: {N_READS/t:,.0f}")
mark("done")
