#!/usr/bin/env python3
"""A/B the depth-first no-hit exhaustion probe vs the exact heap search.

For a sample of the bench workload: classify each read by the exact
search's hit count, then time (a) the exact search and (b) the
nohit_hint=True path (probe first, exact on bail) on every read, assert
identical results, and report per-class timings -- the probe's win on
hitless reads and its bail overhead on hit-ful reads.

Env: BENCH_GENOME, PROFILE_READS (default 768), BENCH_READS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.native_search import NativeSearcher
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import DeviceSearchEngine, _batch_luts


def main():
    n_sample = int(os.environ.get("PROFILE_READS", 768))
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
    reads = bench.load_reads(fastq)[:n_sample]
    searcher = NativeSearcher(index.fmd)
    eng = object.__new__(DeviceSearchEngine)  # just for _native_search
    eng.parameters = params
    eng.packed_hits = False

    rows = []
    for rec in reads:
        t0 = time.perf_counter()
        plain = eng._native_search(searcher, rec, False)
        t_plain = time.perf_counter() - t0
        t0 = time.perf_counter()
        hinted = eng._native_search(searcher, rec, True)
        t_hint = time.perf_counter() - t0
        assert len(plain) == len(hinted)
        for g, w in zip(hinted, plain):
            assert g.interval == w.interval and (
                np.float32(g.alignment_score)
                == np.float32(w.alignment_score)
            ) and g.edit_operations == w.edit_operations
        rows.append((len(plain), t_plain, t_hint))

    nh = np.array([r[0] for r in rows])
    tp = np.array([r[1] for r in rows])
    th = np.array([r[2] for r in rows])
    for name, m in (("no-hit", nh == 0), ("hit", nh > 0), ("all", nh >= 0)):
        if not m.any():
            continue
        print(
            f"{name}: n={m.sum()} plain {tp[m].sum():.2f}s "
            f"(mean {tp[m].mean()*1e3:.2f}ms) -> hinted {th[m].sum():.2f}s "
            f"(mean {th[m].mean()*1e3:.2f}ms)  speedup "
            f"{tp[m].sum()/max(th[m].sum(),1e-9):.2f}x", flush=True,
        )
    mon = tp > 0.004
    for name, m in (("slow no-hit", mon & (nh == 0)), ("slow hit", mon & (nh > 0))):
        if m.any():
            print(
                f"{name} (plain>4ms): n={m.sum()} plain {tp[m].sum():.2f}s "
                f"-> hinted {th[m].sum():.2f}s "
                f"speedup {tp[m].sum()/max(th[m].sum(),1e-9):.2f}x",
                flush=True,
            )

    # batched interleaved probe over the no-hit class, single thread:
    # isolates the K-interleave effect from pipeline scheduling
    nohit_recs = [rec for rec, r in zip(reads, rows) if r[0] == 0]
    if nohit_recs:
        from mapad_tpu.ops.engine import _RANK_TABLE
        from mapad_tpu.utils.seq import BASE_TO_CODE

        mb = params.mismatch_bound
        M = max(len(r.sequence) for r in nohit_recs)
        B = len(nohit_recs)
        ranks = np.zeros((B, M), np.uint8)
        codes = np.zeros((B, M), np.uint8)
        ns = np.zeros(B, np.int32)
        sluts = np.zeros((B, M, 4), np.float32)
        pens = np.zeros((B, M), np.float32)
        splits = np.zeros(B, np.int32)
        scales = np.ones(B, np.float32)
        threshs = np.zeros(B, np.float32)
        dm = params.difference_model
        for bi, rec in enumerate(nohit_recs):
            seq = np.frombuffer(bytes(rec.sequence), dtype=np.uint8)
            quals = np.frombuffer(bytes(rec.base_qualities), dtype=np.uint8)
            ln = len(seq)
            slut, pen = _batch_luts(
                dm, params, seq[None, :], quals[None, :],
                np.asarray([ln], dtype=np.int32),
            )
            ranks[bi, :ln] = _RANK_TABLE[seq]
            codes[bi, :ln] = BASE_TO_CODE[seq]
            ns[bi] = ln
            sluts[bi, :ln] = slut[0][:ln]
            pens[bi, :ln] = pen[0][:ln]
            splits[bi] = dm.find_alignment_start(ln)
            threshs[bi] = mb.threshold_for_length(ln)
        for K in (1, 2, 4, 8):
            t0 = time.perf_counter()
            v = searcher.probe_batch(ranks, codes, ns, sluts, pens,
                                     splits, scales, threshs, params,
                                     interleave=K)
            dt = time.perf_counter() - t0
            print(
                f"probe_batch K={K}: n={B} {dt:.2f}s "
                f"(mean {dt/B*1e3:.2f}ms) proven={int((v == 0).sum())}",
                flush=True,
            )


if __name__ == "__main__":
    main()
