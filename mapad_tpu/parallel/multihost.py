"""Multi-host data-parallel mapping (replaces the dispatcher/worker TCP mode
on TPU pod slices).

Layout (BASELINE.json north star; SURVEY.md §2.3): the FMD-index replicates
per host; each host maps its own static shard of the read stream with its
local devices (no dynamic work assignment, no TCP); host 0 concatenates the
per-host BAM shards.  Fault tolerance is deferred to the job scheduler, as
is conventional for pod-scale jobs.

Run one process per host:
  python -m mapad_tpu.parallel.multihost --coordinator host0:port \
      --num_processes N --process_id I ... (same flags as `map`)
or rely on the TPU environment auto-detection of jax.distributed.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    import jax

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()  # TPU env auto-detection
    return jax.process_index(), jax.process_count()


class ShardedTaskQueue:
    """Wraps a TaskQueue, yielding only this host's chunks (round-robin)."""

    def __init__(self, task_queue, process_id: int, process_count: int):
        self._inner = task_queue
        self._pid = process_id
        self._count = process_count

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            sheet = next(self._inner)
            if sheet.chunk_id % self._count == self._pid:
                return sheet


def run_multihost(
    reads_path: str,
    reference_path: str,
    out_file_path: str,
    force_overwrite: bool,
    alignment_parameters,
    read_group=None,
    engine=None,
    position_seed: int = 0,
    cmdline: str | None = None,
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Each host maps chunk_id % nprocs == pid; host 0 merges shard BAMs."""
    import jax

    pid, count = initialize(coordinator, num_processes, process_id)
    logger.info("multihost: process %d/%d", pid, count)

    from ..index import load_index
    from ..io.bam import BamWriter
    from ..io.sniff import InputSource
    from ..map.pipeline import OracleSearchEngine, run_inner
    from ..map.postprocess import create_bam_header

    index = load_index(reference_path)
    if engine is None:
        from ..ops.engine import DeviceSearchEngine

        engine = DeviceSearchEngine(index.fmd, alignment_parameters)

    shard_path = f"{out_file_path}.shard{pid}"
    input_source = InputSource.from_path(reads_path)
    out_header = create_bam_header(
        input_source.header, index.id_pos_map, read_group, cmdline
    )
    queue = ShardedTaskQueue(
        input_source.task_queue(alignment_parameters.chunk_size), pid, count
    )
    with open(shard_path, "wb") as raw:
        with BamWriter(raw, out_header) as writer:
            run_inner(
                queue, index, alignment_parameters, read_group, engine, writer,
                position_seed,
            )

    # barrier: wait for all hosts before merging
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mapad_tpu_shards_done")

    if pid == 0:
        _merge_bam_shards(out_file_path, count, out_header, force_overwrite)


def _merge_bam_shards(out_file_path: str, count: int, header, force_overwrite):
    """Concatenate shard BAMs into the final output (records re-encoded)."""
    from ..io.bam import BamReader, BamWriter

    if not force_overwrite and os.path.exists(out_file_path):
        raise FileExistsError(out_file_path)
    with open(out_file_path, "wb") as raw:
        with BamWriter(raw, header) as writer:
            for i in range(count):
                shard = f"{out_file_path}.shard{i}"
                with open(shard, "rb") as f:
                    for record in BamReader(f):
                        writer.write_record(record)
                os.remove(shard)
