#!/usr/bin/env python3
"""Native C++ engine thread-scaling on the bench workload.

Grounds the bench.py vs_baseline anchor (VERDICT round-2 item 6): the
reference publishes no reads/s numbers (BASELINE.md), so the 10k anchor
rests on a per-core extrapolation.  This measures the actual C++ engine
(same algorithm and exact semantics as the reference's hot loop) at
1/2/4 threads on this host and prints the per-core rate + the 32-thread
AVX2-node extrapolation, so the anchor's derivation is recorded from
measurements rather than folklore.

Run on an otherwise-idle machine (contention skews thread scaling).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import bench as benchmod
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.native_search import NativeSearchEngine
from mapad_tpu.models import Discrete, SimpleAncientDnaModel

N_READS = int(os.environ.get("READS", 16384))

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
reads = benchmod.load_reads(benchmod.reads_fastq(index, N_READS))

rates = {}
for threads in (1, 2, 4):
    eng = NativeSearchEngine(index.fmd, params, threads=threads,
                             packed_hits=True)
    eng.search_chunk(reads[:512])  # warm caches
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.search_chunk(reads)
        best = min(best, time.perf_counter() - t0)
    rates[threads] = N_READS / best
    print(f"threads={threads}: {rates[threads]:,.0f} reads/s "
          f"({rates[threads]/threads:,.0f}/core)", flush=True)

per_core = rates[max(rates)] / max(rates)
eff21 = rates[2] / (2 * rates[1])
eff42 = rates[4] / (2 * rates[2])
print(f"scaling efficiency 1->2: {eff21:.0%}, 2->4: {eff42:.0%}")
print(f"32-core extrapolation at the 2->4 efficiency: "
      f"{per_core * 32 * eff42 ** 3:,.0f} reads/s "
      f"(search stage only; the reference also runs output conversion "
      f"in the same pool)")
