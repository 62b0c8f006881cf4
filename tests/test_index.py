"""Index layer tests: suffix array, FMD-index invariants, sampled SA, store."""

import numpy as np
import pytest

from mapad_tpu.index import BiInterval, build_auxiliary_structures, load_index
from mapad_tpu.index.builder import build_from_sequences, run_apply, run as index_run
from mapad_tpu.index.runtime import save_index
from mapad_tpu.index.sais import suffix_array_numpy
from mapad_tpu.utils.seq import revcomp


def brute_suffix_array(text):
    return sorted(range(len(text)), key=lambda i: bytes(text[i:]))


@pytest.mark.parametrize(
    "text",
    [b"\x01", b"\x02\x01\x00", b"banana\x00", b"aaaaaa\x00", b"GT$AC$",
     b"mississippi$", b"ACGT$ACGT$ACGT$"],
)
def test_suffix_array_numpy(text):
    arr = np.frombuffer(text, dtype=np.uint8)
    got = suffix_array_numpy(arr)
    assert list(got) == brute_suffix_array(arr)


def test_suffix_array_random():
    rng = np.random.default_rng(42)
    for n in [1, 2, 7, 50, 333]:
        arr = rng.integers(0, 5, size=n).astype(np.uint8)
        assert list(suffix_array_numpy(arr)) == brute_suffix_array(arr)


def _naive_occurrences(text_ranks, pattern_ranks):
    n, m = len(text_ranks), len(pattern_ranks)
    return [
        i
        for i in range(n - m + 1)
        if np.array_equal(text_ranks[i : i + m], pattern_ranks)
    ]


def test_fmd_backward_ext_matches_naive():
    ref = b"GATTACAGATTACATTTGATTACA"
    fmd, sa = build_auxiliary_structures(ref)
    text = bytes(ref) + b"$" + revcomp(ref) + b"$"
    text_ranks = fmd.rank_transform.transform(text)

    for pattern in [b"GATTACA", b"TTT", b"A", b"ACA", b"TTTT", b"CCC"]:
        iv = fmd.init_interval()
        for a in reversed(pattern):
            iv = fmd.backward_ext(iv, a)
        pat_ranks = fmd.rank_transform.transform(pattern)
        occurrences = _naive_occurrences(text_ranks, pat_ranks)
        assert iv.size == len(occurrences), pattern
        got_positions = sorted(sa[iv.lower : iv.lower + iv.size])
        assert got_positions == occurrences, pattern


def test_fmd_forward_ext_equals_backward():
    ref = b"GATTACAGATTACATTTGATTACA"
    fmd, sa = build_auxiliary_structures(ref)
    pattern = b"GATTAC"
    # Extend forward from empty
    iv_f = fmd.init_interval()
    for a in pattern:
        iv_f = fmd.forward_ext(iv_f, a)
    # Extend backward from empty
    iv_b = fmd.init_interval()
    for a in reversed(pattern):
        iv_b = fmd.backward_ext(iv_b, a)
    assert iv_f == iv_b


def test_fmd_bidirectional_mixed_extension():
    ref = b"ACCGTGGATGGCGGATAACGCTAGGATCC"
    fmd, sa = build_auxiliary_structures(ref)
    text = bytes(ref) + b"$" + revcomp(ref) + b"$"
    text_ranks = fmd.rank_transform.transform(text)
    # extend "GGAT" from the middle outwards: G-GA-GGA-GGAT
    iv = fmd.init_interval()
    iv = fmd.backward_ext(iv, ord("G"))
    iv = fmd.forward_ext(iv, ord("A"))
    iv = fmd.backward_ext(iv, ord("G"))
    iv = fmd.forward_ext(iv, ord("T"))
    pat_ranks = fmd.rank_transform.transform(b"GGAT")
    occurrences = _naive_occurrences(text_ranks, pat_ranks)
    assert iv.size == len(occurrences)
    assert sorted(sa[iv.lower : iv.lower + iv.size]) == occurrences


def test_extend_all_symbol_order():
    ref = b"GATTACA"
    fmd, _ = build_auxiliary_structures(ref)
    out = fmd.extend_all(fmd.init_interval())
    assert [c for c, _ in out] == [4, 3, 2, 1]  # T, G, C, A


def test_nonalphabet_symbol_kills_interval():
    ref = b"GATTACA"
    fmd, _ = build_auxiliary_structures(ref)
    iv = fmd.backward_ext(fmd.init_interval(), ord("N"))
    assert iv == BiInterval(0, 0, 0)


def test_sampled_suffix_array():
    rng = np.random.default_rng(7)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200))
    fmd, ssa, id_pos, orig = build_from_sequences([("chr1", ref)])
    # Reconstruct full SA by brute force on the same text
    text = ref + b"$" + revcomp(ref) + b"$"
    text_ranks = fmd.rank_transform.transform(text)
    sa_full = suffix_array_numpy(text_ranks)
    for i in range(len(sa_full)):
        assert ssa.get(i) == sa_full[i], i


def test_run_apply_replacement():
    # Port of indexing.rs test_replacement semantics: short runs replaced
    # base-by-base (originals recorded), runs >= 20 become 'X'
    from mapad_tpu.utils.rand_compat import StdRngCompat

    rng = StdRngCompat(1234)
    seq = bytearray(b"ACGT" + b"N" * 3 + b"ACGT" + b"N" * 25 + b"GGCC" + b"U")
    orig = run_apply(seq, 20, rng)
    assert set(orig.keys()) == {4, 5, 6, len(seq) - 1}
    assert all(chr(seq[k]) in "ACGT" for k in (4, 5, 6))
    assert seq[-1] == ord("T")  # U -> T deterministic
    assert bytes(seq[7:11]) == b"ACGT"
    assert bytes(seq[11:36]) == b"X" * 25
    assert bytes(seq[36:40]) == b"GGCC"
    assert orig[4] == ord("N") and orig[len(seq) - 1] == ord("U")


def test_index_roundtrip(tmp_path):
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\nGATTACAGATTACA\n>chr2 description\nCCCGGGTTTAAA\n")
    index_run(str(fasta), seed=1234)
    idx = load_index(str(fasta))
    assert idx.meta["version"] == 1
    assert [c.identifier for c in idx.id_pos_map] == ["chr1", "chr2"]
    assert [(c.start, c.end) for c in idx.id_pos_map] == [(0, 13), (14, 25)]
    # text = 26 bases + '$' + 26 bases + '$'
    assert len(idx.fmd) == 54
    # search for GATTACA via loaded index
    iv = idx.fmd.init_interval()
    for a in reversed(b"GATTACA"):
        iv = idx.fmd.backward_ext(iv, a)
    assert iv.size == 2
    positions = sorted(idx.suffix_array.get(i) for i in iv.range_fwd())
    assert positions == [0, 7]
    # contig boundary rejection
    assert idx.id_pos_map.get_reference_identifier(0, 14) == (0, 0, "chr1")
    assert idx.id_pos_map.get_reference_identifier(10, 8) is None
    tids, rels = idx.id_pos_map.get_reference_identifier_batch([0, 10, 14], [14, 8, 3])
    assert list(tids) == [0, -1, 1]
    assert rels[0] == 0 and rels[2] == 0


def test_native_sais_matches_numpy():
    from mapad_tpu.index import sais_native

    if not sais_native.available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    for n in [1, 2, 100, 5000]:
        t = rng.integers(0, 6, size=n).astype(np.uint8)
        assert np.array_equal(
            sais_native.suffix_array(t), suffix_array_numpy(t)
        )
