"""Multi-host layer unit tests (shard assignment + BAM shard merge)."""

from mapad_tpu.io.bam import BamReader, BamRecord, BamWriter, SamHeader
from mapad_tpu.io.sniff import TaskQueue
from mapad_tpu.parallel.multihost import (
    BamShardWriter,
    ShardedTaskQueue,
    _merge_bam_shards,
)


def test_sharded_task_queue():
    records = list(range(25))
    seen = {}
    for pid in range(3):
        q = ShardedTaskQueue(TaskQueue(iter(records), 4), pid, 3)
        for sheet in q:
            assert sheet.chunk_id % 3 == pid
            for r in sheet.records:
                assert r not in seen
                seen[r] = pid
    assert sorted(seen) == records


def test_merge_bam_shards(tmp_path):
    header = SamHeader(hd=[("VN", "1.6")], sq=[("chr1", 100, [])])
    out = tmp_path / "merged.bam"
    for pid in range(2):
        with open(f"{out}.shard{pid}", "wb") as f:
            with BamShardWriter(f) as w:
                w.write_record(
                    BamRecord(name=f"r{pid}".encode(), flags=4, sequence=b"ACGT",
                              quals=bytes([30] * 4))
                )
    _merge_bam_shards(str(out), 2, header, force_overwrite=False)
    with open(out, "rb") as f:
        reader = BamReader(f)
        names = [r.name for r in reader]
    assert names == [b"r0", b"r1"]
    import os

    assert not os.path.exists(f"{out}.shard0")
