"""mapAD native on-disk index interop: snappy + bincode codecs, round-trip,
and transparent load_index fallback."""

import os

import numpy as np
import pytest

from mapad_tpu.errors import IndexVersionMismatch, InvalidIndex
from mapad_tpu.index.builder import build_from_sequences
from mapad_tpu.index.mapad_native import (
    MAPAD_SUFFIXES,
    is_mapad_native_index,
    load_mapad_index,
    save_mapad_index,
    snappy_block_decompress,
    snappy_frame_compress,
    snappy_frame_decompress,
)
from mapad_tpu.index.runtime import load_index


def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_snappy_frame_roundtrip():
    rng = np.random.default_rng(7)
    for size in (0, 1, 100, 65536, 65537, 200000):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert snappy_frame_decompress(snappy_frame_compress(data)) == data


def test_snappy_native_matches_python():
    from mapad_tpu.index import mapad_native as mn

    plain = b"abcde" + b"abcde" * 5 + b"XYZ"
    block = bytearray()
    block += _varint(len(plain))
    block += bytes([(5 - 1) << 2]) + b"abcde"
    block += bytes([((25 - 1) << 2) | 2]) + (5).to_bytes(2, "little")
    block += bytes([(3 - 1) << 2]) + b"XYZ"
    py = mn._snappy_block_decompress_py(bytes(block))
    assert py == plain
    if mn._native_snappy() is not None:  # dispatch path uses the C++ decoder
        assert mn.snappy_block_decompress(bytes(block)) == plain


def test_snappy_block_golden():
    # Hand-built raw snappy block exercising literals and all copy widths
    # (format: github.com/google/snappy/blob/main/format_description.txt).
    plain = b"abcde" + b"abcde" * 5 + b"XYZ"
    block = bytearray()
    block += _varint(len(plain))
    block += bytes([(5 - 1) << 2]) + b"abcde"  # literal len 5
    # copy len 25 offset 5 (overlapping, repeats "abcde"): 2-byte-offset form
    block += bytes([((25 - 1) << 2) | 2]) + (5).to_bytes(2, "little")
    block += bytes([(3 - 1) << 2]) + b"XYZ"
    assert snappy_block_decompress(bytes(block)) == plain

    # 1-byte-offset copy form: len 4..11, offset < 2048
    plain2 = b"0123" * 3
    block2 = bytearray()
    block2 += _varint(len(plain2))
    block2 += bytes([(4 - 1) << 2]) + b"0123"
    block2 += bytes([((8 - 4) << 2) | 1, 4])  # len 8, offset 4
    assert snappy_block_decompress(bytes(block2)) == plain2

    # 64-byte long literal (length-byte form)
    plain3 = bytes(range(70))
    block3 = _varint(70) + bytes([60 << 2, 69]) + plain3
    assert snappy_block_decompress(block3) == plain3


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(11)
    seqs = []
    for name in ("chr1", "chr2"):
        s = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 3000))
        # include ambiguous bases to exercise OriginalSymbols
        s = s[:100] + b"NRY" + s[103:]
        seqs.append((name, s))
    fmd, ssa, id_pos, orig = build_from_sequences(seqs)
    return seqs, fmd, ssa, id_pos, orig


def test_mapad_native_roundtrip(built, tmp_path):
    seqs, fmd, ssa, id_pos, orig = built
    prefix = str(tmp_path / "ref.fa")
    save_mapad_index(prefix, fmd, ssa, id_pos, orig)
    assert is_mapad_native_index(prefix)

    idx = load_mapad_index(prefix)
    np.testing.assert_array_equal(idx.fmd.bwt, fmd.bwt)
    np.testing.assert_array_equal(idx.fmd.less, fmd.less)
    np.testing.assert_array_equal(
        idx.suffix_array.sample, ssa.sample
    )
    assert idx.suffix_array.sampling_rate == ssa.sampling_rate
    np.testing.assert_array_equal(idx.suffix_array.extra_keys, ssa.extra_keys)
    np.testing.assert_array_equal(idx.suffix_array.extra_vals, ssa.extra_vals)
    assert [c.identifier for c in idx.id_pos_map] == ["chr1", "chr2"]
    assert [(c.start, c.end) for c in idx.id_pos_map] == [
        (c.start, c.end) for c in id_pos
    ]
    np.testing.assert_array_equal(
        idx.original_symbols.positions, orig.positions
    )
    np.testing.assert_array_equal(idx.original_symbols.symbols, orig.symbols)

    # SA lookups agree across the whole row space sample
    for i in range(0, len(ssa), 97):
        assert idx.suffix_array.get(i) == ssa.get(i)

    # exact-match search agrees
    pat = seqs[0][1][500:550]
    a = fmd.init_interval()
    b = idx.fmd.init_interval()
    for ch in reversed(pat):
        a = fmd.backward_ext(a, ch)
        b = idx.fmd.backward_ext(b, ch)
    assert (a.lower, a.lower_rev, a.size) == (b.lower, b.lower_rev, b.size)
    assert a.size > 0


def test_load_index_fallback(built, tmp_path):
    seqs, fmd, ssa, id_pos, orig = built
    prefix = str(tmp_path / "genome.fa")
    save_mapad_index(prefix, fmd, ssa, id_pos, orig)
    idx = load_index(prefix)  # no .tpx bundle present
    assert idx.meta["format"] == "mapad-native"
    assert idx.meta["contigs"][0]["identifier"] == "chr1"

    with pytest.raises(InvalidIndex):
        load_index(str(tmp_path / "missing.fa"))


def test_version_mismatch(built, tmp_path):
    seqs, fmd, ssa, id_pos, orig = built
    prefix = str(tmp_path / "ref.fa")
    save_mapad_index(prefix, fmd, ssa, id_pos, orig)
    # bump the version byte inside the snappy payload of .tbw
    payload = bytearray(
        snappy_frame_decompress(open(prefix + ".tbw", "rb").read())
    )
    payload[0] = 99
    open(prefix + ".tbw", "wb").write(snappy_frame_compress(bytes(payload)))
    with pytest.raises(IndexVersionMismatch):
        load_mapad_index(prefix)


def test_missing_file_message(built, tmp_path):
    seqs, fmd, ssa, id_pos, orig = built
    prefix = str(tmp_path / "ref.fa")
    save_mapad_index(prefix, fmd, ssa, id_pos, orig)
    os.remove(prefix + ".tsa")
    assert not is_mapad_native_index(prefix)
    with pytest.raises(InvalidIndex, match="tsa"):
        load_mapad_index(prefix)


def test_toc_written_and_roundtrips(built, tmp_path):
    """save_mapad_index emits all SEVEN reference files including .toc
    (rust-bio Occ, k=128, inclusive checkpoints -- VERDICT r4 item 7);
    load_mapad_occ parses it back and the counts match a brute-force
    occurrence count over the BWT."""
    from mapad_tpu.index.mapad_native import MAPAD_TOC_OCC_K, load_mapad_occ

    _seqs, fmd, ssa, id_pos, orig = built
    prefix = os.path.join(tmp_path, "toc")
    save_mapad_index(prefix, fmd, ssa, id_pos, orig)
    for suffix in (".tbw", ".tle", ".tsa", ".tpi", ".tos", ".trt", ".toc"):
        assert os.path.exists(prefix + suffix), suffix

    occ, k = load_mapad_occ(prefix + ".toc")
    assert k == MAPAD_TOC_OCC_K == 128
    bwt = np.asarray(fmd.bwt, dtype=np.int64)
    n = len(bwt)
    assert occ.shape[0] == -(-n // k)
    assert occ.shape[1] == int(bwt.max()) + 1
    for b in range(occ.shape[0]):
        # rust-bio convention: checkpoint b counts bwt[0 ..= b*k]
        prefix_counts = np.bincount(
            bwt[: b * k + 1], minlength=occ.shape[1]
        )
        assert (occ[b] == prefix_counts).all(), b
