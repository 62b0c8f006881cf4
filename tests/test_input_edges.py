"""Input edge cases: malformed records skipped, overlong reads, task queue."""

import io

from mapad_tpu.errors import SeqLenError
from mapad_tpu.io.sniff import InputSource, TaskQueue
from mapad_tpu.map.record import Record


def test_overlong_read_rejected():
    try:
        Record.from_fastq(b"r", b"A" * 40000, b"I" * 40000)
    except SeqLenError as e:
        assert "32767" in str(e)
    else:
        raise AssertionError("expected SeqLenError")


def test_malformed_record_skipped_with_log(caplog):
    # second record is overlong -> skipped in-stream (validity counts
    # toward chunk boundaries), first and third still yielded
    data = (
        b"@ok1\nACGT\n+\nIIII\n"
        + b"@bad\n" + b"A" * 40000 + b"\n+\n" + b"I" * 40000 + b"\n"
        + b"@ok2\nGGTT\n+\nIIII\n"
    )
    src = InputSource._from_bytes(data)
    sheets = list(src.task_queue(10))
    assert [r.name for s in sheets for r in s.records] == [b"ok1", b"ok2"]
    assert any("Skip invalid record" in r.message for r in caplog.records)


def test_skip_chunk_counts_only_valid_records():
    # an invalid record inside a skipped chunk must not shift boundaries
    data = (
        b"@a\nACGT\n+\nIIII\n"
        + b"@bad\n" + b"A" * 40000 + b"\n+\n" + b"I" * 40000 + b"\n"
        + b"@b\nACGT\n+\nIIII\n"
        + b"@c\nGGTT\n+\nIIII\n"
    )
    src = InputSource._from_bytes(data)
    q = src.task_queue(2)
    assert q.skip_chunk()  # chunk 0 = [a, b] (bad doesn't count)
    sheet = next(q)
    assert sheet.chunk_id == 1
    assert [r.name for r in sheet.records] == [b"c"]
    assert not q.skip_chunk()


def test_task_queue_chunking_and_requery():
    records = iter([Record(b"ACGT", b"IIII", name=str(i).encode()) for i in range(10)])
    q = TaskQueue(records, 4)
    sheets = [next(q), next(q)]
    assert [s.chunk_id for s in sheets] == [0, 1]
    assert len(sheets[0].records) == 4
    # requeue a failed chunk: it comes back before new ones
    q.requery_task(sheets[0])
    nxt = next(q)
    assert nxt.chunk_id == 0
    rest = list(q)
    assert [s.chunk_id for s in rest] == [2]
    assert len(rest[0].records) == 2


def test_bam_input_unreverses_reverse_flagged_reads():
    # record.rs:159-162: reverse-flagged input reads are restored to
    # original orientation before searching
    rec = Record.from_bam(b"r", 16, b"ACGT", bytes([1, 2, 3, 4]), [])
    assert rec.sequence == b"ACGT"[::-1].translate(
        bytes.maketrans(b"ACGT", b"TGCA")
    )
    assert rec.base_qualities == bytes([4, 3, 2, 1])
