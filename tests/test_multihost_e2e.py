"""2-process multihost end-to-end: real jax.distributed over localhost.

Counterpart of the reference's in-process dispatcher+workers integration
test (tests/integration_tests.rs:220-254): two OS processes coordinate via
jax.distributed, each maps its round-robin half of the chunks, and host 0's
raw-merged BAM must contain field-identical records to a single-process run
(order differs by shard, XD timing excluded)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import sys
repo, ref_path, reads, out, pid = sys.argv[1:6]
sys.path.insert(0, repo)
import jax

# this jax build ignores the JAX_PLATFORMS env var; the config route is
# the only way to force the CPU backend (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.pipeline import OracleSearchEngine
from mapad_tpu.models import Discrete, SimpleAncientDnaModel
from mapad_tpu.index import load_index
from mapad_tpu.parallel.multihost import run_multihost

dm = SimpleAncientDnaModel(("single_stranded", 0.6, 0.55), 0.01, 1.0,
                           np.float32(0.02) / np.float32(3.0), False)
repr_mm = dm.get_representative_mismatch_penalty()
params = AlignmentParameters(
    difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
    penalty_gap_open=repr_mm * np.float32(1.5),
    penalty_gap_extend=repr_mm * np.float32(0.5),
    chunk_size=5, gap_dist_ends=5, stack_limit_abort=False,
    max_num_gaps_open=2,
)
index = load_index(ref_path)
engine = OracleSearchEngine(index.fmd, params)
run_multihost(
    reads, ref_path, out, True, params, engine=engine,
    coordinator="127.0.0.1:47551", num_processes=2, process_id=int(pid),
)
print("driver done", pid)
"""


def _make_fixture(tmp):
    from mapad_tpu.index.builder import build_from_sequences
    from mapad_tpu.index.runtime import save_index

    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)
    ref_path = os.path.join(tmp, "ref.fa")
    fmd, ssa, idp, orig = build_from_sequences([("chrT", genome.tobytes())])
    save_index(ref_path, fmd, ssa, idp, orig)

    reads = os.path.join(tmp, "reads.fq")
    with open(reads, "w") as f:
        for i in range(23):
            start = int(rng.integers(0, len(genome) - 60))
            seq = bytearray(genome[start : start + 60].tobytes())
            for p in range(len(seq)):
                if seq[p] == ord("C") and rng.random() < 0.3 * (0.5 ** p):
                    seq[p] = ord("T")
            f.write(f"@r{i}\n{bytes(seq).decode()}\n+\n{'I' * len(seq)}\n")
    return ref_path, reads


def _load_records(path):
    from mapad_tpu.io.bam import BamReader

    out = {}
    with open(path, "rb") as f:
        for rec in BamReader(f):
            tags = sorted(
                (k, v) for k, _t, v in rec.tags if k != b"XD"
            )
            out[rec.name] = (
                rec.flags, rec.ref_id, rec.pos, rec.mapq,
                rec.cigar_string(), rec.sequence, rec.quals, tuple(tags),
            )
    return out


def test_two_process_multihost_matches_single(tmp_path):
    tmp = str(tmp_path)
    ref_path, reads = _make_fixture(tmp)

    # single-process expected output
    from mapad_tpu.map import AlignmentParameters
    from mapad_tpu.map import pipeline as pl
    from mapad_tpu.models import Discrete, SimpleAncientDnaModel

    dm = SimpleAncientDnaModel(("single_stranded", 0.6, 0.55), 0.01, 1.0,
                               np.float32(0.02) / np.float32(3.0), False)
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.03, 0.02, repr_mm),
        penalty_gap_open=repr_mm * np.float32(1.5),
        penalty_gap_extend=repr_mm * np.float32(0.5),
        chunk_size=5, gap_dist_ends=5, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    single = os.path.join(tmp, "single.bam")
    pl.run(reads, ref_path, single, True, params)

    merged = os.path.join(tmp, "merged.bam")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["MAPAD_NO_NATIVE_POST"] = env.get("MAPAD_NO_NATIVE_POST", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", DRIVER, REPO, ref_path, reads, merged,
             str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-3000:]

    exp = _load_records(single)
    got = _load_records(merged)
    assert set(exp) == set(got)
    for name in exp:
        assert got[name] == exp[name], (name, got[name], exp[name])
    assert not os.path.exists(merged + ".shard0")
    assert not os.path.exists(merged + ".shard1")
