"""Multi-chip sharding test on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_search_equals_single_device():
    """The mesh-sharded search must produce the same hits as unsharded."""
    import importlib.util
    import os

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mapad_tpu.ops.search import k_mismatch_search_batch
    from mapad_tpu.parallel.sharding import make_mesh, shard_search_inputs

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    engine, prep, config = mod._tiny_problem(16)
    params = engine._params()

    def run(index, p):
        return k_mismatch_search_batch(
            index, p["pattern_rank"], p["pattern_code"], p["n"],
            p["score_lut"], p["pen"], p["split"], p["cutoff_scale"],
            p["cutoff_thresh"], p["repr_mm"], params, config,
        )

    base = jax.tree.map(np.asarray, run(engine.device_index, prep))

    mesh = make_mesh(8)
    sharded = shard_search_inputs(mesh, prep)
    index = jax.device_put(engine.device_index, NamedSharding(mesh, P()))
    got = jax.tree.map(np.asarray, run(index, sharded))

    assert np.array_equal(got.hcount, base.hcount)
    assert np.array_equal(got.h_lower, base.h_lower)
    assert np.array_equal(got.h_ops, base.h_ops)
    assert np.allclose(got.h_score, base.h_score, equal_nan=True)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_pool_kernel_equals_oracle():
    """The PRODUCTION pool kernel, sharded over the mesh via shard_map,
    must produce the oracle's exact hit sets for every read (VERDICT.md
    round-1 item 4: same kernel the bench uses, realistic read count)."""
    import os

    import numpy as np

    from mapad_tpu.index.builder import build_auxiliary_structures
    from mapad_tpu.map import AlignmentParameters
    from mapad_tpu.map.oracle import k_mismatch_search as oracle_search
    from mapad_tpu.map.record import Record
    from mapad_tpu.models import Discrete, SimpleAncientDnaModel
    from mapad_tpu.ops.engine import DeviceSearchEngine
    from mapad_tpu.ops.search import SearchConfig
    from mapad_tpu.ops.search_pool import PoolConfig
    from mapad_tpu.parallel.pool_sharded import (
        collect_sharded,
        pool_search_sharded,
        shard_reads,
    )
    from mapad_tpu.parallel.sharding import make_mesh

    HERE = os.path.dirname(os.path.abspath(__file__))
    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")

    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)),
        penalty_gap_extend=repr_mm, chunk_size=1000, gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=2,
    )

    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    R = 256  # 32 reads per shard
    reads = []
    for _ in range(R):
        ln = int(rng.integers(20, 101))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(rng.choice(bases))
        reads.append(
            Record(sequence=bytes(seq), base_qualities=bytes([40] * ln))
        )

    cfg = PoolConfig(max_len=128, lanes=8, total_steps=8192, max_chains=1024,
                     compute_forward_part=False)
    engine = DeviceSearchEngine(
        fmd, params, mode="pool", pool_config=cfg,
        config=SearchConfig(max_len=128, compute_forward_part=False),
    )
    prep = engine._prepare(reads, cfg.max_len, R)
    mesh = make_mesh(8)
    sharded_prep = shard_reads(mesh, prep)
    from jax.sharding import NamedSharding, PartitionSpec as P

    index = jax.device_put(engine.device_index, NamedSharding(mesh, P()))
    result = pool_search_sharded(mesh, index, sharded_prep, engine._params(),
                                 cfg)

    import time

    out = [None] * R
    escalated = collect_sharded(engine, reads, result, out, time.perf_counter())
    # escalated reads go through the exact host fallback, same as the engine
    for i in sorted(escalated):
        out[i] = engine._fallback_one(reads, i)[1]

    assert sum(1 for o in out if o is None) == 0
    n_nonempty = 0
    for record, (hits, _dur) in zip(reads, out):
        want = oracle_search(
            record.sequence, record.base_qualities, params, fmd
        )
        assert len(hits) == len(want)
        n_nonempty += bool(want)
        for d, o in zip(hits, want):
            assert d.interval == o.interval
            assert np.float32(d.alignment_score) == np.float32(o.alignment_score)
            assert d.edit_operations == o.edit_operations
    assert n_nonempty >= R // 2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_engine_auto_shard_equals_single(monkeypatch, tmp_path):
    """DeviceSearchEngine with MAPAD_SHARD=1 builds a mesh over all
    visible devices and must produce results identical to the
    single-device engine, including escalation handling (VERDICT r4
    item 3: multi-chip in the production path, not just the bare
    kernel)."""
    import os

    from mapad_tpu.index.builder import build_auxiliary_structures
    from mapad_tpu.map import AlignmentParameters
    from mapad_tpu.map.record import Record
    from mapad_tpu.models import Discrete, SimpleAncientDnaModel
    from mapad_tpu.ops.engine import DeviceSearchEngine
    from mapad_tpu.ops.search_pool import PoolConfig

    rng = np.random.default_rng(5)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 20000))
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=Discrete(0.04, 0.02, repr_mm),
        penalty_gap_open=np.log2(np.float32(0.00001)),
        penalty_gap_extend=repr_mm, chunk_size=1000, gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    reads = []
    for i in range(96):
        ln = int(rng.integers(24, 90))
        start = int(rng.integers(0, len(ref) - ln))
        seq = bytearray(ref[start : start + ln])
        for _ in range(int(rng.integers(0, 3))):
            seq[int(rng.integers(0, ln))] = int(
                rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8))
            )
        reads.append(Record(sequence=bytes(seq),
                            base_qualities=bytes([40] * ln)))
    # a couple of exogenous reads so escalation paths are exercised too
    for _ in range(4):
        reads.append(Record(
            sequence=bytes(rng.choice(
                np.frombuffer(b"ACGT", dtype=np.uint8), 60)),
            base_qualities=bytes([40] * 60),
        ))

    cfg = PoolConfig(max_len=128, lanes=8, total_steps=2048,
                     read_step_cap=512, max_chains=2048,
                     compute_forward_part=False, generations=2)

    def run(shard: str):
        monkeypatch.setenv("MAPAD_SHARD", shard)
        monkeypatch.setenv("MAPAD_BLOCK_READS", "32")
        engine = DeviceSearchEngine(fmd, params, mode="pool",
                                    pool_config=cfg)
        if shard == "1":
            assert engine.mesh is not None and engine.n_shards >= 4
            assert engine.block_reads % engine.n_shards == 0
        else:
            assert engine.mesh is None
        return engine.search_chunk(reads), engine

    (single, _), (sharded, eng) = run("0"), run("1")
    for (ha, _da), (hb, _db), rec in zip(single, sharded, reads):
        assert len(ha) == len(hb), rec.sequence[:16]
        for a, b in zip(ha, hb):
            assert a.interval == b.interval
            assert np.float32(a.alignment_score) == np.float32(
                b.alignment_score)
            assert a.edit_operations == b.edit_operations
