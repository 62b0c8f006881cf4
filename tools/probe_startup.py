"""Root-cause probe for the ~15-20 min first pool-kernel invocation stall
seen through the axon tunnel (ROADMAP 'Bench environment note').

Separates the phases: backend init, trivial dispatch, pool-kernel trace,
XLA compile (AOT), executable load, first execution, steady execution.
Run on the real TPU:  python tools/probe_startup.py [lanes] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapad_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

mark(f"jax imported, devices={jax.devices()}")

x = jnp.ones((8, 128))
y = (x @ x.T).block_until_ready()
np.asarray(y)
mark("trivial matmul done")

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.ops.engine import DeviceSearchEngine
from mapad_tpu.ops.search_pool import PoolConfig
from mapad_tpu.ops.search_pool2 import k_mismatch_search_pool2 as k_mismatch_search_pool

rng = np.random.default_rng(0)
ref = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200_000).tobytes()
fmd, _ = build_auxiliary_structures(ref, b"ACGT")
mark("index built (200kb)")

dm = SimpleAncientDnaModel(("single_stranded", 0.6, 0.55), 0.01, 1.0,
                           np.float32(0.02) / np.float32(3.0), False)
repr_mm = dm.get_representative_mismatch_penalty()
params = AlignmentParameters(
    difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
    penalty_gap_open=repr_mm * np.float32(1.5),
    penalty_gap_extend=repr_mm * np.float32(0.5),
    chunk_size=1000, gap_dist_ends=5, stack_limit_abort=False,
    max_num_gaps_open=2,
)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
engine = DeviceSearchEngine(
    fmd, params, mode="pool",
    pool_config=PoolConfig(max_len=128, lanes=L, total_steps=S,
                           max_chains=8192, compute_forward_part=False),
)
mark("engine constructed (device arrays resident)")

# Build the argument batch the same way the engine does, then AOT-compile.
from mapad_tpu.map.record import Record

reads = []
for i in range(L):
    ln = 75
    start = int(rng.integers(0, len(ref) - ln))
    seq = bytearray(ref[start:start + ln])
    for j in range(2):
        seq[int(rng.integers(0, ln))] = int(rng.choice(
            np.frombuffer(b"ACGT", dtype=np.uint8)))
    reads.append(Record(sequence=bytes(seq), base_qualities=bytes([40] * ln)))

cfg = engine.pool_config
prep = engine._prepare(reads, cfg.max_len, L)
sp = engine._params()
mark("host batch prep done")

pos_args = (
    engine.device_index, prep["pattern_rank"], prep["pattern_code"],
    prep["n"], prep["score_lut"], prep["pen"], prep["split"],
    prep["cutoff_scale"], prep["cutoff_thresh"], prep["repr_mm"], sp,
)

lowered = k_mismatch_search_pool.lower(*pos_args, config=cfg)
mark("traced/lowered")
compiled = lowered.compile()
mark("compiled (AOT)")

out = compiled(*pos_args)
steps = int(np.asarray(out.steps))
mark(f"first execution done (steps={steps})")

out = compiled(*pos_args)
np.asarray(out.steps)
mark("second execution done")

for i in range(3):
    t = time.perf_counter()
    out = compiled(*pos_args)
    steps = int(np.asarray(out.steps))
    dt = time.perf_counter() - t
    mark(f"exec {i+3}: {dt*1e3:.1f} ms total, {dt/steps*1e6:.1f} us/step "
         f"({steps} steps)")
