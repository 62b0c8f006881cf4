#!/usr/bin/env python3
"""hg19-scale on-chip run: the int64 (big) pool kernel against a >2^31
text (3.1 Gbp genome -> 6.2 Gbp doubled text), kernel-level timing +
HBM/hit stats.  VERDICT round-1 item 2.

Usage: BENCH_EASY=1 python tools/measure_big.py
(uses bench.py's cached genome_3100000000 index; build first if absent)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_EASY", "1")
os.environ.setdefault("BENCH_GENOME", "3100000000")

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
N_READS = int(os.environ.get("READS", 4096))
S = int(os.environ.get("STEPS", 8192))
CAP = int(os.environ.get("CAP", 1024))

index = benchmod.get_genome_index()
mark(f"index loaded: text_len={len(index.fmd):,} "
     f"(>2^31: {len(index.fmd) > 2**31})")
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
di = engine.device_index
assert di.big, "expected int64 device mode for a >2^31 text"
rows_gb = di.rows.size * 4 / 1e9
store_gb = L * (S + 1) * 128 * 4 / 1e9
mark(f"device index resident: big={di.big} occ_k={di.occ_k} "
     f"rows={di.rows.shape} = {rows_gb:.2f} GB HBM; "
     f"frame store (L={L}, S={S}) = {store_gb:.2f} GB/invocation")

reads = benchmod.make_reads(index, N_READS)
mark("reads sampled")
mlen = max(len(r.sequence) for r in reads)
M = min(128, max(16, -(-mlen // 16) * 16))
prep = engine._prepare(reads, M, N_READS, host_bid=True)
sp = engine._params()
mark(f"host prep done (M={M})")

kern = _pool_impl()
cfg = PoolConfig(max_len=M, lanes=L, total_steps=S, max_chains=8192,
                 compute_forward_part=False, read_step_cap=CAP)


def run():
    return kern(
        engine.device_index, prep["pattern_rank"], prep["pattern_code"],
        prep["n"], prep["score_lut"], prep["pen"], prep["split"],
        prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
        sp, cfg, slut_packed=prep["slut_packed"],
    )


t = time.perf_counter()
out = run()
steps = int(np.asarray(out.steps))
mark(f"first invocation {time.perf_counter()-t:.1f}s ({steps} steps)")
best = float("inf")
for _ in range(3):
    t = time.perf_counter()
    out = run()
    steps = int(np.asarray(out.steps))
    best = min(best, time.perf_counter() - t)
unfin = int(np.asarray(out.lane_unfinished).sum())
nch = int(np.asarray(out.n_chains))
abandons = int(np.asarray(out.c_abandon).sum())
mark(f"big-mode invocation: {best*1e3:.1f} ms, {steps} steps "
     f"({best/steps*1e6:.1f} us/step), chains={nch} abandons={abandons} "
     f"unfinished={unfin}")
mark(f"kernel-level reads/s on hg19-scale text: {N_READS/best:,.0f}")
mark("done")
