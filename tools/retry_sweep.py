#!/usr/bin/env python3
"""In-process e2e sweep of the retry/deep-tier knobs on the chip.

Each fresh process pays a ~7-15 min first-invocation stall through the
axon tunnel, so all configs run in ONE process (cap_sweep2 pattern): the
env knobs are read per search_stream call, and the kernel shapes do not
change across configs (no recompiles except the deep tier's cap, warmed
once up front).

Usage: CONFIGS='name:ENV=V,ENV=V;name2:...' python tools/retry_sweep.py
Default sweep: retry off (round-3 baseline), retry_block in {512,1024,
2048}, deep-frac variants, deep tier on.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from mapad_tpu.map import AlignmentParameters  # noqa: E402
from mapad_tpu.models import Discrete, SimpleAncientDnaModel  # noqa: E402
from mapad_tpu.ops.engine import DeviceSearchEngine  # noqa: E402
from mapad_tpu.ops.search import SearchConfig  # noqa: E402

DEFAULT = (
    "baseline:;"
    "device_bid:MAPAD_HOST_BID=0;"
    "cap2048:MAPAD_POOL_CAP=2048;"
    "cap2048_retry:MAPAD_POOL_CAP=2048,MAPAD_RETRY_TIER=1,"
    "MAPAD_RETRY_BLOCK=1024,MAPAD_RETRY_DEEP_FRAC=0.25;"
    "hybrid:ENGINE=hybrid;"
    "hybrid_bid0:ENGINE=hybrid,MAPAD_HOST_BID=0"
)

KNOBS = [
    "MAPAD_RETRY_TIER", "MAPAD_RETRY_BLOCK", "MAPAD_RETRY_DEEP_FRAC",
    "MAPAD_DEEP_TIER", "MAPAD_DEEP_BLOCK", "MAPAD_RETRY_GENS",
    "MAPAD_RETRY_MIN", "MAPAD_DEEP_CAP", "MAPAD_POOL_CAP",
    "MAPAD_POOL_STEPS", "MAPAD_HOST_BID", "MAPAD_BLOCK_READS",
    "MAPAD_KGENS", "MAPAD_SPILL", "MAPAD_KGENS_MIN_LIVE",
    "MAPAD_DEEP_KGENS", "MAPAD_INFLIGHT", "MAPAD_PREP_THREADS",
    "MAPAD_DEEP_SPILL", "MAPAD_DEEP_NOHIT_HOST", "MAPAD_DEEP_LANES",
    "MAPAD_DEEP_STEPS", "MAPAD_DEEP_GENS", "MAPAD_FB_THREADS",
    "MAPAD_NOHIT_PROBE", "MAPAD_PROBE_K", "MAPAD_PROBE_BATCH",
]


def main():
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
        chunk_size=min(bench.N_READS, 16384), gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    config = SearchConfig(max_len=128, hit_cap=24, compute_forward_part=False)
    from mapad_tpu.map import native_post

    fastq = bench.reads_fastq(index, bench.N_READS)
    reads = bench.load_reads(fastq)
    longest = max(reads, key=lambda r: len(r.sequence))
    warm = reads[: bench.LANES - 1] + [longest]

    from mapad_tpu.io.bam import BamReader
    from mapad_tpu.map import pipeline as pl_mod

    threads = max(1, (os.cpu_count() or 2) - 1)
    out_bam = tempfile.NamedTemporaryFile(suffix=".bam", delete=False).name
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    baseline_counts = None

    # knobs read at engine CONSTRUCTION: a config touching these (or
    # ENGINE=) forces a rebuild; everything else is read per call, so the
    # engine (and its staged occ rows -- 3.4 GB at hg19 scale) is reused
    BUILD_KNOBS = {"MAPAD_POOL_CAP", "MAPAD_POOL_STEPS", "MAPAD_KGENS",
                   "MAPAD_SPILL", "MAPAD_KGENS_MIN_LIVE"}
    engine = None
    engine_sig = None

    for spec in os.environ.get("CONFIGS", DEFAULT).split(";"):
        name, _, envs = spec.partition(":")
        for k in KNOBS:
            os.environ.pop(k, None)
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        kind = os.environ.pop("ENGINE", "device")
        sig = (kind,) + tuple(
            os.environ.get(k) for k in sorted(BUILD_KNOBS)
        )
        if engine is None or sig != engine_sig:
            if kind == "hybrid":
                from mapad_tpu.ops.engine import HybridSearchEngine

                engine = HybridSearchEngine(
                    index.fmd, params, lanes=bench.LANES, config=config,
                    tiers=((2048, None),),
                    packed_hits=native_post.available(),
                )
            else:
                engine = DeviceSearchEngine(
                    index.fmd, params, lanes=bench.LANES, config=config,
                    tiers=((2048, None),),
                    packed_hits=native_post.available(),
                )
            engine_sig = sig
        # warm under THIS config's env: per-call knobs like MAPAD_HOST_BID
        # select differently-compiled kernel variants (cache hit when
        # already compiled)
        engine.warm(warm)
        stats = engine._stats
        for k in ("escalated", "oracle", "device_lanes"):
            stats[k] = 0
        stats["fb_secs"] = 0.0
        for k in ("retried", "deep_retried", "esc_why", "nohit_host"):
            stats.pop(k, None)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            pl_mod.run(fastq, os.path.join(bench.CACHE,
                       f"genome_{bench.GENOME_SIZE}_hard"), out_bam, True,
                       params, engine=engine, threads=threads, index=index)
            best = min(best, time.perf_counter() - t0)
        with open(out_bam, "rb") as f:
            n_mapped = sum(1 for rec in BamReader(f) if not rec.flags & 0x4)
        if baseline_counts is None:
            baseline_counts = n_mapped
        s = engine._stats
        print(
            f"{name}: {len(reads) / best:.0f} reads/s ({best:.2f}s) "
            f"mapped={n_mapped} esc={s['escalated']} "
            f"retried={s.get('retried', 0)}+{s.get('deep_retried', 0)}deep "
            f"host={s['oracle']} nohit={s.get('nohit_host', 0)} "
            f"fb={s.get('fb_secs', 0.0):.1f}core-s "
            f"p={getattr(engine, '_p', 1.0):.2f} why={s.get('esc_why')}",
            flush=True,
        )
        assert n_mapped == baseline_counts, "mapped-count drift across configs"
    os.unlink(out_bam)


if __name__ == "__main__":
    main()
