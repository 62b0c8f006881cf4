"""Oracle search tests: ports of reference mapping.rs unit tests.

The reference asserts BinaryHeap iteration order for scores (layout-specific);
here hit score multisets, the best-scoring hit, and SA position sets are
asserted instead, with exact f32 values.
"""

import numpy as np
import pytest

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.map import AlignmentParameters
from mapad_tpu.map.oracle import k_mismatch_search
from mapad_tpu.models import (
    Discrete,
    SimpleAncientDnaModel,
    TestBound,
    TestDifferenceModel,
    VindijaPwm,
)


def positions_of(intervals, sa):
    out = []
    for hit in intervals:
        out.extend(int(sa[i]) for i in hit.interval.range_fwd())
    return sorted(out)


def best_hit(intervals):
    return max(intervals, key=lambda h: h.alignment_score)


def test_inexact_search():
    # reference mapping.rs:1401-1455
    dm = TestDifferenceModel(deam_score=-0.5, mm_score=-1.0, match_score=0.0)
    mmb = TestBound(threshold=-1.0, representative_mm_bound=-1.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, sa = build_auxiliary_structures(b"ACGTACGTACGTACGT", b"ACGT")
    intervals = k_mismatch_search(b"GTTC", [0] * 4, params, fmd, dm, mmb)
    scores = [float(h.alignment_score) for h in intervals]
    assert scores == [-1.0]
    assert positions_of(intervals, sa) == [2, 6, 10, 19, 23, 27]


def test_reverse_strand_search():
    # reference mapping.rs:1458-1510
    dm = TestDifferenceModel(deam_score=-10.0, mm_score=-10.0, match_score=0.0)
    mmb = TestBound(threshold=-1.0, representative_mm_bound=-10.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-20.0,
        penalty_gap_extend=-10.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, sa = build_auxiliary_structures(b"GAAAAG", b"ACGT")
    intervals = k_mismatch_search(b"TTTT", [0] * 4, params, fmd, dm, mmb)
    assert positions_of(intervals, sa) == [8]


def test_gapped_alignment():
    # reference mapping.rs:1512-1564
    dm = TestDifferenceModel(deam_score=-10.0, mm_score=-10.0, match_score=0.0)
    mmb = TestBound(threshold=-3.0, representative_mm_bound=-10.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, sa = build_auxiliary_structures(b"TAT", b"ACGT")
    intervals = k_mismatch_search(b"TT", [0] * 2, params, fmd, dm, mmb)
    assert positions_of(intervals, sa) == [0, 2, 5]


def test_gapped_alignment_read_end():
    # reference mapping.rs:1566-1640
    dm = TestDifferenceModel(deam_score=-10.0, mm_score=-10.0, match_score=0.0)
    mmb = TestBound(threshold=-6.0, representative_mm_bound=-10.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, sa = build_auxiliary_structures(b"AAAAAAGGGGAAAAAA", b"ACGT")

    # Gap in the middle of the read (allowed)
    intervals = k_mismatch_search(b"AAAAAAAAAAAA", [0] * 12, params, fmd, dm, mmb)
    assert len(positions_of(intervals, sa)) > 0

    # Gap near the read end (not allowed)
    intervals = k_mismatch_search(b"AGGGAAAAAA", [0] * 10, params, fmd, dm, mmb)
    assert positions_of(intervals, sa) == []


def test_gap_open_limit():
    # reference mapping.rs:1642-1722
    dm = TestDifferenceModel(deam_score=-10.0, mm_score=-10.0, match_score=0.0)
    mmb = TestBound(threshold=-6.0, representative_mm_bound=-10.0)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=5,
        stack_limit_abort=False, max_num_gaps_open=1,
    )
    ref = b"CTAGCCAGCGATTTACATGCTCTCGGAATATCGACATGTA"
    fmd, sa = build_auxiliary_structures(ref, b"ACGT")

    # One gap (allowed)
    pattern = b"CTAGCCAGCGAACATGCTCTCGGAATATCGACATGTA"
    intervals = k_mismatch_search(pattern, [0] * len(pattern), params, fmd, dm, mmb)
    assert 0 in positions_of(intervals, sa)

    # Two gaps (not allowed)
    pattern = b"CTAGCCAGCGATTACATGCTCTCGGAATTCGACATGTA"
    intervals = k_mismatch_search(pattern, [0] * len(pattern), params, fmd, dm, mmb)
    assert positions_of(intervals, sa) == []


def test_vindija_pwm_alignment():
    # reference mapping.rs:1724-1833
    dm = VindijaPwm()
    mmb = TestBound(
        threshold=-30.0,
        representative_mm_bound=dm.get_representative_mismatch_penalty(),
    )
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-200.0,
        penalty_gap_extend=-100.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, sa = build_auxiliary_structures(b"CCCCCC", b"ACGT")

    intervals = k_mismatch_search(b"TTCCCT", [40] * 6, params, fmd, dm, mmb)
    assert abs(float(best_hit(intervals).alignment_score) - (-4.641691)) < 1e-6
    assert positions_of(intervals, sa) == [0]

    intervals = k_mismatch_search(b"CCCCCC", [0] * 6, params, fmd, dm, mmb)
    assert float(best_hit(intervals).alignment_score) == 0.0
    assert positions_of(intervals, sa) == [0]

    # "Normal" mismatch
    fmd, sa = build_auxiliary_structures(b"AAAAAA", b"ACGT")
    intervals = k_mismatch_search(b"AAGAAA", [0] * 6, params, fmd, dm, mmb)
    assert abs(float(best_hit(intervals).alignment_score) - (-10.965062)) < 1e-6


def test_corner_cases():
    # reference mapping.rs:1874-1935
    dm = VindijaPwm()
    repr_mm = dm.get_representative_mismatch_penalty()
    mmb = Discrete(0.01, 0.02, repr_mm)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb,
        penalty_gap_open=np.float32(3.0) * repr_mm,
        penalty_gap_extend=np.float32(0.6) * repr_mm,
        chunk_size=1, gap_dist_ends=0, stack_limit_abort=False,
        max_num_gaps_open=2,
    )
    ref = (
        b"GTTGTATTTTTAGTAGAGACAGGGTTTCATCATGTTGGCCAG"
        + b"A" * 20
        + b"TTTGTATTTTTAGTAGAGACAGGCTTTCATCATGTTGGCCAG"
    )
    fmd, sa = build_auxiliary_structures(ref, b"ACGT")
    pattern = b"GTTGTATTTTTAGTAGAGACAGGCTTTCATCATGTTGGCCAG"
    intervals = k_mismatch_search(pattern, [40] * len(pattern), params, fmd, dm, mmb)

    scores = sorted(float(h.alignment_score) for h in intervals)
    expected = sorted([-10.936638, -39.474224, -10.965062])
    assert len(scores) == 3
    for got, want in zip(scores, expected):
        assert abs(got - want) < 1e-6, (got, want)
    assert positions_of(intervals, sa) == [0, 62, 63]

    best = best_hit(intervals)
    assert [int(sa[i]) for i in best.interval.range_fwd()] == [0]
