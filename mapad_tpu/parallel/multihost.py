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
    """Wraps a TaskQueue, yielding only this host's chunks (round-robin).

    Non-owned chunks are skipped via TaskQueue.skip_chunk, which counts
    records for exact chunk-boundary parity but never converts them --
    each host pays full parse cost only for its own 1/N of the input."""

    def __init__(self, task_queue, process_id: int, process_count: int):
        self._inner = task_queue
        self._pid = process_id
        self._count = process_count

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._inner.next_chunk_id % self._count == self._pid:
                return next(self._inner)
            if not self._inner.skip_chunk():
                raise StopIteration


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
    from ..map.pipeline import run_inner
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
        with BamShardWriter(raw) as writer:
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


class BamShardWriter:
    """Headerless BGZF record stream for one host's shard.

    Shards carry only record blocks (no BAM header, no BGZF EOF): BGZF
    streams are block-concatenable, so host 0 merges shards by raw byte
    append -- no per-record decode/re-encode (reference counterpart: the
    dispatcher re-encodes every interval, dispatcher.rs:340-379)."""

    def __init__(self, fileobj):
        from ..io.bgzf import BgzfWriter

        self._w = BgzfWriter(fileobj)
        self._f = fileobj

    def write_record(self, rec):
        from ..io.bam import encode_record

        self._w.write(encode_record(rec))

    def write_raw(self, data: bytes):
        self._w.write(data)

    def close(self):
        self._w.flush()
        self._f.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _merge_bam_shards(out_file_path: str, count: int, header, force_overwrite):
    """Merge: header + raw shard bytes + EOF.  Streams at disk bandwidth."""
    import shutil

    from ..io.bam import BamWriter
    from ..io.bgzf import BGZF_EOF

    if not force_overwrite and os.path.exists(out_file_path):
        raise FileExistsError(out_file_path)
    with open(out_file_path, "wb") as raw:
        writer = BamWriter(raw, header)
        writer._w.flush()  # header blocks out, no EOF yet
        for i in range(count):
            shard = f"{out_file_path}.shard{i}"
            with open(shard, "rb") as f:
                shutil.copyfileobj(f, raw, 1 << 20)
            os.remove(shard)
        raw.write(BGZF_EOF)
