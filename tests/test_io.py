"""I/O layer tests: BGZF, BAM round-trip, FASTQ, format sniffing, stdin."""

import gzip
import io
import struct

import numpy as np
import pytest

from mapad_tpu.errors import InvalidInputType
from mapad_tpu.io.bam import (
    BamReader,
    BamRecord,
    BamWriter,
    SamHeader,
    decode_record,
    encode_record,
    reg2bin,
)
from mapad_tpu.io.bgzf import BgzfReader, BgzfWriter
from mapad_tpu.io.fastq import read_fastq
from mapad_tpu.io.sniff import InputSource


def test_bgzf_roundtrip():
    buf = io.BytesIO()
    w = BgzfWriter(buf)
    data = bytes(range(256)) * 1000
    w.write(data)
    w.close()
    buf.seek(0)
    assert BgzfReader(buf).read_all() == data
    # gzip-compatible (BGZF is valid gzip)
    buf.seek(0)
    assert gzip.decompress(buf.read()) == data


def test_bam_record_roundtrip():
    rec = BamRecord(
        name=b"read/1", flags=16, ref_id=2, pos=1234, mapq=37,
        cigar=[(10, "M"), (2, "I"), (5, "M"), (1, "D"), (3, "M")],
        sequence=b"ACGTACGTACGTACGTACGT",
        quals=bytes(range(20)),
        tags=[
            (b"AS", "f", -3.25), (b"NM", "i", 2), (b"MD", "Z", b"10A7"),
            (b"XT", "A", ord("U")), (b"XB", "c", -5), (b"XC", "C", 250),
            (b"XS", "s", -3000), (b"XU", "S", 60000), (b"XI", "I", 70000),
            (b"XH", "H", b"1AE3"), (b"XA", "B", ("i", [1, -2, 3])),
        ],
    )
    buf = encode_record(rec)
    got, consumed = decode_record(buf, 0)
    assert consumed == len(buf)
    assert got.name == rec.name
    assert got.flags == rec.flags and got.ref_id == rec.ref_id
    assert got.pos == rec.pos and got.mapq == rec.mapq
    assert got.cigar == rec.cigar
    assert got.sequence == rec.sequence
    assert got.quals == rec.quals
    assert got.tag(b"AS") == pytest.approx(-3.25)
    assert got.tag(b"NM") == 2
    assert got.tag(b"MD") == b"10A7"
    assert got.tag(b"XT") == ord("U")
    assert got.tag(b"XB") == -5 and got.tag(b"XC") == 250
    assert got.tag(b"XS") == -3000 and got.tag(b"XU") == 60000
    assert got.tag(b"XI") == 70000
    assert got.tag(b"XH") == b"1AE3"
    assert got.tag(b"XA") == ("i", [1, -2, 3])


def test_bam_file_roundtrip(tmp_path):
    header = SamHeader(
        hd=[("VN", "1.6"), ("SO", "unsorted")],
        sq=[("chr1", 1000, []), ("chr2", 500, [("M5", "abc")])],
        rg=[("RG1", [("SM", "s1")])],
        pg=[("prog", [("PN", "p"), ("VN", "1")])],
        co=["a comment"],
    )
    path = tmp_path / "t.bam"
    with open(path, "wb") as f:
        with BamWriter(f, header) as w:
            w.write_record(BamRecord(name=b"r1", flags=0, ref_id=0, pos=10,
                                     mapq=30, cigar=[(4, "M")],
                                     sequence=b"ACGT", quals=bytes([40] * 4)))
            w.write_record(BamRecord(name=b"r2", flags=4, sequence=b"NNNA",
                                     quals=bytes([2] * 4)))
    with open(path, "rb") as f:
        r = BamReader(f)
        assert r.references == [("chr1", 1000), ("chr2", 500)]
        assert "@CO\ta comment" in r.header_text
        recs = list(r)
    assert len(recs) == 2
    assert recs[0].name == b"r1" and recs[0].pos == 10
    assert recs[1].sequence == b"NNNA"
    assert recs[1].ref_id == -1 and recs[1].pos == -1


def test_reg2bin():
    # SAM spec values
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, 1 << 17) == 585


def test_fastq_reader():
    data = io.BytesIO(b"@r1 extra\nACGT\n+\nIIII\n@r2\nGG\n+x\nAB\n")
    recs = list(read_fastq(data))
    assert recs[0].name == b"r1" and recs[0].sequence == b"ACGT"
    assert recs[1].name == b"r2" and recs[1].quality == b"AB"
    with pytest.raises(ValueError):
        list(read_fastq(io.BytesIO(b"@r\nACGT\n+\nII\n")))  # len mismatch


def test_sniff_formats(tmp_path):
    # FASTQ
    fq = tmp_path / "a.fq"
    fq.write_bytes(b"@r\nACGT\n+\nIIII\n")
    assert InputSource.from_path(str(fq)).kind == "fastq"
    # fastq.gz
    fqz = tmp_path / "a.fq.gz"
    with gzip.open(fqz, "wb") as f:
        f.write(b"@r\nACGT\n+\nIIII\n")
    assert InputSource.from_path(str(fqz)).kind == "fastq.gz"
    # BAM
    bam = tmp_path / "a.bam"
    with open(bam, "wb") as f:
        with BamWriter(f, SamHeader()) as w:
            w.write_record(BamRecord(name=b"r", flags=4, sequence=b"AC",
                                     quals=b"\x20\x20"))
    src = InputSource.from_path(str(bam))
    assert src.kind == "bam"
    recs = list(src._records)
    assert recs[0].name == b"r"
    # CRAM magic -> clear error
    cram = tmp_path / "a.cram"
    cram.write_bytes(b"CRAM\x03\x00junk")
    with pytest.raises(InvalidInputType):
        InputSource.from_path(str(cram))


def test_stdin_input(monkeypatch):
    import sys

    payload = b"@r1\nACGT\n+\nIIII\n"

    class FakeStdin:
        buffer = io.BytesIO(payload)

    monkeypatch.setattr(sys, "stdin", FakeStdin)
    src = InputSource.from_path("-")
    recs = list(src._records)
    assert recs[0].sequence == b"ACGT"
