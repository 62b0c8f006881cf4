#!/usr/bin/env python3
"""Characterize the deep-search ("monster") read tail (VERDICT r4 item 8).

Runs the exact native searcher single-threaded over a sample of the bench
workload, recording per-read pop counts (native/searcher.cpp
last_search_pops), wall time, hit counts and lengths; prints the pop-count
distribution and a breakdown by outcome class so the device tier budgets
(PoolConfig read_step_cap / generations, deep tier shape) can be set from
data instead of guesses.

Env: BENCH_GENOME (index size, default 4e6), PROFILE_READS (sample size,
default 2048), PROFILE_OFFSET (skip), BENCH_READS (workload file size).

Usage: python tools/monster_profile.py
"""

import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.native_search import NativeSearcher, _load
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import _batch_luts


def main():
    n_sample = int(os.environ.get("PROFILE_READS", 2048))
    offset = int(os.environ.get("PROFILE_OFFSET", 0))
    index = bench.get_genome_index()
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.6, 0.55), 0.01, 1.0,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=16384, gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fastq = bench.reads_fastq(index, int(os.environ.get("BENCH_READS", 65536)))
    reads = bench.load_reads(fastq)[offset : offset + n_sample]
    lib = _load()
    lib.last_search_pops.restype = ctypes.c_int64
    searcher = NativeSearcher(index.fmd)
    mb = params.mismatch_bound

    rows = []
    t_all = time.perf_counter()
    for rec in reads:
        seq = np.frombuffer(bytes(rec.sequence), dtype=np.uint8)
        quals = np.frombuffer(bytes(rec.base_qualities), dtype=np.uint8)
        ln = len(seq)
        score_lut, pen = _batch_luts(
            dm, params, seq[None, :], quals[None, :],
            np.asarray([ln], dtype=np.int32),
        )
        from mapad_tpu.ops.engine import _RANK_TABLE
        from mapad_tpu.utils.seq import BASE_TO_CODE

        rank = _RANK_TABLE[seq].astype(np.uint8)
        code = BASE_TO_CODE[seq].astype(np.uint8)
        t0 = time.perf_counter()
        hits = searcher.search(
            rank, code, ln, score_lut[0], pen[0],
            dm.find_alignment_start(ln), np.float32(1.0),
            mb.threshold_for_length(ln), repr_mm, params,
        )
        dt = time.perf_counter() - t0
        pops = int(lib.last_search_pops())
        rows.append((pops, dt, len(hits), ln))
    total_t = time.perf_counter() - t_all

    pops = np.array([r[0] for r in rows])
    dts = np.array([r[1] for r in rows])
    nhits = np.array([r[2] for r in rows])
    lens = np.array([r[3] for r in rows])

    qs = [50, 75, 90, 95, 99, 99.5, 100]
    print(f"# {len(rows)} reads, {total_t:.1f}s single-thread "
          f"({len(rows)/total_t:.0f} reads/s/core)")
    print("pop quantiles:",
          {q: int(np.percentile(pops, q)) for q in qs})
    print("time quantiles (ms):",
          {q: round(float(np.percentile(dts, q)) * 1e3, 2) for q in qs})
    for thr in (2048, 4096, 8192, 16384, 32768, 65536, 131072):
        frac = (pops > thr).mean()
        share = dts[pops > thr].sum() / dts.sum()
        print(f"pops>{thr}: {frac:.2%} of reads, {share:.1%} of core time")
    nohit = nhits == 0
    print(f"no-hit reads: {nohit.mean():.2%}; their pop quantiles:",
          {q: int(np.percentile(pops[nohit], q)) for q in qs} if nohit.any()
          else "-")
    print(f"hit reads pop quantiles:",
          {q: int(np.percentile(pops[~nohit], q)) for q in qs}
          if (~nohit).any() else "-")
    mon = pops > 8192
    if mon.any():
        print(f"monsters (>8192 pops): {mon.sum()} "
              f"({mon.mean():.2%}), no-hit share {nohit[mon].mean():.1%}, "
              f"len median {int(np.median(lens[mon]))} "
              f"vs overall {int(np.median(lens))}; "
              f"pops/ms: {pops[mon].sum() / (dts[mon].sum()*1e3):.0f}")
    # dump per-read rows for downstream analysis
    out = os.path.join(bench.CACHE, f"monster_profile_{bench.GENOME_SIZE}.npz")
    np.savez(out, pops=pops, dts=dts, nhits=nhits, lens=lens, offset=offset)
    print("saved", out)


if __name__ == "__main__":
    main()
