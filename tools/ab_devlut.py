#!/usr/bin/env python3
"""In-process A/B of the device-LUT small-blob prep path (MAPAD_DEV_LUT).

The axon tunnel's bandwidth swings ~20x over minutes (ROADMAP round 4),
so cross-process comparisons are weather-confounded; this alternates the
two prep paths inside ONE warmed process.  Usage:

    AB_PASSES=2 python tools/ab_devlut.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the bench workload + engine setup)


def main():
    import tempfile

    import numpy as np

    from mapad_tpu.map import AlignmentParameters, native_post
    from mapad_tpu.map import pipeline as pl_mod
    from mapad_tpu.models import Discrete, SimpleAncientDnaModel
    from mapad_tpu.ops.engine import DeviceSearchEngine
    from mapad_tpu.ops.search import SearchConfig

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
    packed = native_post.available()
    engine = DeviceSearchEngine(
        index.fmd, params, lanes=bench.LANES, config=config,
        tiers=((2048, None),), big=None, packed_hits=packed,
    )
    fastq = bench.reads_fastq(index, bench.N_READS)
    reads = bench.load_reads(fastq)
    longest = max(reads, key=lambda r: len(r.sequence))
    engine.warm(reads[: bench.LANES - 1] + [longest])
    # compile-warm BOTH unpack paths so neither pays a mid-A/B compile
    os.environ["MAPAD_DEV_LUT"] = "0"
    engine.warm(reads[: bench.LANES - 1] + [longest])
    os.environ["MAPAD_DEV_LUT"] = "1"

    threads = max(1, (os.cpu_count() or 2) - 1)
    prefix = os.path.join(
        bench.CACHE,
        f"genome_{bench.GENOME_SIZE}"
        f"{'' if os.environ.get('BENCH_EASY') else '_hard'}",
    )
    passes = int(os.environ.get("AB_PASSES", 2))
    results = {}
    for p in range(passes):
        for flag in ("1", "0"):
            os.environ["MAPAD_DEV_LUT"] = flag
            out_bam = tempfile.NamedTemporaryFile(
                suffix=".bam", delete=False
            ).name
            t0 = time.perf_counter()
            pl_mod.run(fastq, prefix, out_bam, True, params,
                       engine=engine, threads=threads, index=index)
            dt = time.perf_counter() - t0
            os.unlink(out_bam)
            rps = len(reads) / dt
            results.setdefault(flag, []).append(rps)
            print(
                f"pass {p} dev_lut={flag}: {rps:,.0f} reads/s"
                f" ({dt:.2f}s)", flush=True,
            )
    for flag, vals in sorted(results.items(), reverse=True):
        print(
            f"dev_lut={flag}: best {max(vals):,.0f} reads/s"
            f" over {len(vals)} passes {['%.0f' % v for v in vals]}"
        )


if __name__ == "__main__":
    main()
