#!/usr/bin/env python3
"""Probe: how well do host-known quantities predict per-read search depth?

Used to design the multi-chip balanced shard assignment (VERDICT round-2
item 4): if a cheap host-side predictor correlates with per-read device
steps, a snake deal over predicted cost tightens the per-shard step spread
vs the naive contiguous split.

Runs the production pool kernel on the CPU backend (small genome) with
per-read step tracking, then reports correlation + the simulated per-shard
totals for (a) contiguous split, (b) round-robin, (c) snake deal by
predicted cost, (d) snake deal by TRUE steps (oracle bound).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

from mapad_tpu.index.builder import build_from_sequences
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.record import Record
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.search import SearchConfig
from mapad_tpu.ops.search_pool import PoolConfig

GENOME = int(os.environ.get("GENOME", 1_000_000))
R = int(os.environ.get("READS", 512))
D = int(os.environ.get("SHARDS", 8))

rng = np.random.default_rng(42)
genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=GENOME)
fmd, _ssa, _idp, _orig = build_from_sequences([("chr", genome.tobytes())])

dm = SimpleAncientDnaModel(
    ("single_stranded", 0.6, 0.55), 0.01, 1.0,
    np.float32(0.02) / np.float32(3.0), False,
)
repr_mm = dm.get_representative_mismatch_penalty()
params = AlignmentParameters(
    difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
    penalty_gap_open=repr_mm * np.float32(1.5),
    penalty_gap_extend=repr_mm * np.float32(0.5),
    chunk_size=R, gap_dist_ends=5, stack_limit_abort=False,
    max_num_gaps_open=2,
)

reads = []
LN = 75
starts = rng.integers(0, GENOME - 128, size=R)
for i in range(R):
    if rng.random() < 0.08:  # exogenous
        seq = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8), LN).tobytes())
    else:
        seq = bytearray(genome[starts[i] : starts[i] + LN].tobytes())
        for pos in range(LN):
            p = 0.3 * (0.55 ** pos) + 0.3 * (0.55 ** (LN - 1 - pos))
            if seq[pos] == ord("C") and rng.random() < p:
                seq[pos] = ord("T")
    reads.append(Record(sequence=bytes(seq), base_qualities=bytes([40] * LN)))

cfg = PoolConfig(
    max_len=80, lanes=32, total_steps=65536, read_step_cap=4096,
    max_chains=4096, compute_forward_part=False, track_read_steps=True,
)
engine = DeviceSearchEngine(
    fmd, params, mode="pool", pool_config=cfg,
    config=SearchConfig(max_len=80, compute_forward_part=False),
)
from mapad_tpu.map import native_search

host_bid = native_search.available()
prep = engine._prepare(reads, cfg.max_len, R, host_bid=host_bid)
prep.pop("_stash", None)
from mapad_tpu.ops.search_pool2 import k_mismatch_search_pool2

kw = {"slut_packed": prep.pop("slut_packed")} if host_bid else {}
t0 = time.perf_counter()
res = k_mismatch_search_pool2(
    engine.device_index, prep["pattern_rank"], prep["pattern_code"],
    prep["n"], prep["score_lut"], prep["pen"], prep["split"],
    prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"],
    engine._params(), cfg, **kw,
)
steps = np.asarray(res.read_steps)
print(f"kernel done in {time.perf_counter()-t0:.1f}s; "
      f"total steps {int(np.asarray(res.steps))}, "
      f"read steps min/med/max {steps.min()}/{int(np.median(steps))}/{steps.max()}")

# --- predictors (host-known quantities only) ---
from mapad_tpu.ops.engine import _RANK_TABLE, _batch_luts

seqs = np.zeros((R, cfg.max_len), np.uint8)
quals = np.zeros((R, cfg.max_len), np.uint8)
n = np.zeros(R, np.int32)
for i, r in enumerate(reads):
    ln = len(r.sequence)
    n[i] = ln
    seqs[i, :ln] = np.frombuffer(bytes(r.sequence), np.uint8)
    quals[i, :ln] = np.frombuffer(bytes(r.base_qualities), np.uint8)
score_lut, pen = _batch_luts(dm, params, seqs, quals, n, threads=1)
split = np.asarray([dm.find_alignment_start(int(x)) for x in n], np.int32)
rank = np.where(n[:, None] > 0, _RANK_TABLE[seqs], 0).astype(np.uint8)
bid = engine._native_bid().compute(rank, pen, n, split, 2)

pred_bid = -bid.sum(axis=1)  # weak lower bounds => big search space
pred_opt = -score_lut.max(axis=2).sum(axis=1)

for name, pred in [("-sum(bid)", pred_bid), ("-sum(opt)", pred_opt),
                   ("combo", pred_bid + pred_opt)]:
    c = np.corrcoef(pred, steps)[0, 1]
    # rank correlation
    rs = np.corrcoef(np.argsort(np.argsort(pred)),
                     np.argsort(np.argsort(steps)))[0, 1]
    print(f"predictor {name}: pearson {c:.3f}, spearman {rs:.3f}")


def shard_totals(order):
    """Snake-deal reads (in `order`) over D shards; return per-shard step
    totals."""
    tot = np.zeros(D)
    for k, idx in enumerate(order):
        d = k % (2 * D)
        d = d if d < D else 2 * D - 1 - d
        tot[d] += steps[idx]
    return tot


def spread(tot):
    return (tot.max() - tot.min()) / tot.mean()


naive = np.array([steps[d * (R // D):(d + 1) * (R // D)].sum() for d in range(D)])
rrobin = np.zeros(D)
for i in range(R):
    rrobin[i % D] += steps[i]
by_pred = shard_totals(np.argsort(-(pred_bid + pred_opt)))
by_true = shard_totals(np.argsort(-steps))
print(f"per-shard totals spread (max-min)/mean over {D} shards:")
print(f"  contiguous split : {spread(naive):.1%}  {naive.astype(int).tolist()}")
print(f"  round-robin      : {spread(rrobin):.1%}")
print(f"  snake by predictor: {spread(by_pred):.1%}")
print(f"  snake by true cost: {spread(by_true):.1%}")
