#!/usr/bin/env python3
"""Pipeline-level multi-host WALL-CLOCK scaling on the CPU mesh.

VERDICT r4 item 4: the >=80% multi-host north star was covered by a
step-count proxy (88% in MULTICHIP_r04); this measures real seconds.
Each "host" is a separate process running the full multihost pipeline
(parallel/multihost.py run_multihost: sharded task queue -> engine ->
shard BAM; host 0 merges).  The engine is the NATIVE searcher pinned to
ONE thread per process, so compute capacity scales exactly with process
count up to the core count and any efficiency loss below 100% is the
multihost driver's own overhead (duplicate index load, input parse of
skipped chunks, shard merge, jax.distributed barrier).

Usage: [SCALE_READS=8192] [BENCH_GENOME=4000000] \
       python tools/multihost_scaling.py
Prints a table of n_procs / wall seconds / efficiency and the merged
mapped count (asserted equal across arms).
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import sys, os
repo, ref, reads, out, pid, nprocs, port = sys.argv[1:8]
sys.path.insert(0, repo)
import jax

# this jax build ignores the JAX_PLATFORMS env var; the config route is
# the only way to force the CPU backend (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.map.native_search import NativeSearchEngine
from mapad_tpu.index import load_index
from mapad_tpu.parallel.multihost import run_multihost

dm = SimpleAncientDnaModel(("single_stranded", 0.6, 0.55), 0.01, 1.0,
                           np.float32(0.02) / np.float32(3.0), False)
repr_mm = dm.get_representative_mismatch_penalty()
params = AlignmentParameters(
    difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
    penalty_gap_open=repr_mm * np.float32(1.5),
    penalty_gap_extend=repr_mm * np.float32(0.5),
    chunk_size=1024, gap_dist_ends=5, stack_limit_abort=False,
    max_num_gaps_open=2,
)
index = load_index(ref)
engine = NativeSearchEngine(index.fmd, params, threads=1)
import time
t0 = time.perf_counter()
run_multihost(reads, ref, out, True, params, engine=engine,
              coordinator="127.0.0.1:" + port, num_processes=int(nprocs),
              process_id=int(pid))
print("MAPWALL", time.perf_counter() - t0, flush=True)
"""


def count_mapped(path):
    from mapad_tpu.io.bam import BamReader

    with open(path, "rb") as f:
        return sum(1 for r in BamReader(f) if not r.flags & 0x4)


def main():
    import bench

    n_reads = int(os.environ.get("SCALE_READS", 8192))
    index = bench.get_genome_index()
    fastq = bench.reads_fastq(index, max(n_reads, 8192))
    if n_reads < 8192:
        sub = tempfile.NamedTemporaryFile(
            suffix=".fq", delete=False, mode="w"
        )
        with open(fastq) as f:
            for i, line in enumerate(f):
                if i >= 4 * n_reads:
                    break
                sub.write(line)
        sub.close()
        fastq = sub.name
    suffix = "" if os.environ.get("BENCH_EASY") else "_hard"
    ref = os.path.join(bench.CACHE, f"genome_{bench.GENOME_SIZE}{suffix}")

    tmp = tempfile.mkdtemp(prefix="mh_scale_")
    results = {}
    mapped = {}
    port = 29461
    for n in (1, 2, 4):
        out = os.path.join(tmp, f"out_{n}.bam")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", DRIVER, REPO, ref, fastq, out,
                 str(pid), str(n), str(port + n)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for pid in range(n)
        ]
        outs = [p.communicate(timeout=1800)[0] for p in procs]
        walls = []
        for p, o in zip(procs, outs):
            if p.returncode != 0:
                sys.stderr.write(o.decode(errors="replace")[-3000:])
                raise SystemExit(f"{n}-proc arm failed")
            for line in o.decode(errors="replace").splitlines():
                if line.startswith("MAPWALL"):
                    walls.append(float(line.split()[1]))
        # mapping-phase wall = slowest host (incl. the shard barrier +
        # host-0 merge); total wall additionally carries per-process
        # startup constants (imports, index load, jax.distributed init)
        # that amortize at pod scale
        results[n] = (max(walls), time.perf_counter() - t0)
        mapped[n] = count_mapped(out)

    t1, w1 = results[1]
    print(f"# multihost wall-clock scaling, {n_reads} reads, "
          f"{bench.GENOME_SIZE/1e6:.0f} Mbp, native engine 1 thread/proc, "
          f"{os.cpu_count()} cores")
    print("procs  map_s  map_eff  total_s  total_eff  mapped")
    for n, (t, w) in results.items():
        print(f"{n:5d}  {t:5.1f}  {t1 / (n * t):6.1%}  {w:7.1f}  "
              f"{w1 / (n * w):8.1%}  {mapped[n]}")
    assert len(set(mapped.values())) == 1, mapped


if __name__ == "__main__":
    main()
