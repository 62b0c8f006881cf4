"""CIGAR/MD/NM generation tests (ports of reference mapping.rs/record.rs tests)."""

import os

import numpy as np

from mapad_tpu.index.builder import build_auxiliary_structures
from mapad_tpu.index.runtime import OriginalSymbols
from mapad_tpu.map import (
    OP_DELETION,
    OP_INSERTION,
    OP_MATCH,
    OP_MISMATCH,
    AlignmentParameters,
    EditOperation,
)
from mapad_tpu.map.oracle import k_mismatch_search
from mapad_tpu.map.record import effective_len, to_bam_fields
from mapad_tpu.models import Discrete, SimpleAncientDnaModel, TestBound, TestDifferenceModel

HERE = os.path.dirname(os.path.abspath(__file__))
NO_ORIG = OriginalSymbols.from_dict({})


def _params(dm, mmb, **kw):
    defaults = dict(
        difference_model=dm, mismatch_bound=mmb, penalty_gap_open=-2.0,
        penalty_gap_extend=-1.0, chunk_size=1, gap_dist_ends=0,
        stack_limit_abort=False, max_num_gaps_open=2,
    )
    defaults.update(kw)
    return AlignmentParameters(**defaults)


def best_hit(intervals):
    return max(intervals, key=lambda h: h.alignment_score)


def test_edop_effective_len():
    # record.rs:506-539
    track = [
        EditOperation(OP_MATCH, 0, 0), EditOperation(OP_MISMATCH, 1, ord("C")),
        EditOperation(OP_MATCH, 2, 0), EditOperation(OP_INSERTION, 3, 0),
        EditOperation(OP_MATCH, 4, 0), EditOperation(OP_DELETION, 5, ord("A")),
        EditOperation(OP_DELETION, 6, ord("G")), EditOperation(OP_MATCH, 7, 0),
        EditOperation(OP_MATCH, 8, 0), EditOperation(OP_MATCH, 9, 0),
        EditOperation(OP_MATCH, 10, 0), EditOperation(OP_INSERTION, 11, 0),
        EditOperation(OP_MISMATCH, 10, ord("C")),
    ]
    assert effective_len(track) == 11
    assert effective_len([EditOperation(OP_INSERTION, i, 0) for i in range(3)]) == 0
    assert (
        effective_len(
            [EditOperation(OP_DELETION, i, b) for i, b in enumerate(b"ACGT")]
        )
        == 4
    )


def test_cigar_indels():
    # mapping.rs:1937-2229
    dm = TestDifferenceModel(deam_score=-10.0, mm_score=-10.0, match_score=0.0)
    mmb = TestBound(threshold=-4.0, representative_mm_bound=-10.0)
    params = _params(dm, mmb)

    # Deletion
    fmd, _ = build_auxiliary_structures(b"GATTAGCA", b"ACGT")
    hits = k_mismatch_search(b"ATTACA", [0] * 6, params, fmd, dm, mmb)
    cigar, _, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert cigar == [(4, "M"), (1, "D"), (2, "M")]

    # 2-base deletion
    fmd, _ = build_auxiliary_structures(b"GATTACAG", b"ACGT")
    hits = k_mismatch_search(b"GATCAG", [0] * 6, params, fmd, dm, mmb)
    hit = best_hit(hits)
    cigar, _, _ = to_bam_fields(hit.edit_operations, True, 0, NO_ORIG)
    assert float(hit.alignment_score) == -4.0
    assert cigar == [(3, "M"), (2, "D"), (3, "M")]

    # Insertion
    fmd, _ = build_auxiliary_structures(b"GATTACA", b"ACGT")
    hits = k_mismatch_search(b"GATTAGCA", [0] * 8, params, fmd, dm, mmb)
    hit = best_hit(hits)
    cigar, _, _ = to_bam_fields(hit.edit_operations, True, 0, NO_ORIG)
    assert float(hit.alignment_score) == -3.0
    assert cigar == [(5, "M"), (1, "I"), (2, "M")]

    # 2-base insertion
    hits = k_mismatch_search(b"GATTAGGCA", [0] * 9, params, fmd, dm, mmb)
    hit = best_hit(hits)
    cigar, _, _ = to_bam_fields(hit.edit_operations, True, 0, NO_ORIG)
    assert float(hit.alignment_score) == -4.0
    assert cigar == [(5, "M"), (2, "I"), (2, "M")]

    # 3-base insertion
    mmb = TestBound(
        threshold=-5.0,
        representative_mm_bound=dm.get_representative_mismatch_penalty(),
    )
    params = _params(dm, mmb)
    hits = k_mismatch_search(b"GATTAGTGCA", [0] * 10, params, fmd, dm, mmb)
    hit = best_hit(hits)
    cigar, _, _ = to_bam_fields(hit.edit_operations, True, 0, NO_ORIG)
    assert float(hit.alignment_score) == -5.0
    assert cigar == [(5, "M"), (3, "I"), (2, "M")]


def test_md_tag():
    # mapping.rs:2232-2440
    dm = TestDifferenceModel(deam_score=-1.0, mm_score=-2.0, match_score=0.0)
    mmb = TestBound(threshold=-1.0, representative_mm_bound=-2.0)
    params = _params(dm, mmb)

    # Mutation
    fmd, _ = build_auxiliary_structures(b"GATTACA", b"ACGT")
    hits = k_mismatch_search(b"GATTATA", [40] * 7, params, fmd, dm, mmb)
    _, md, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert md == b"5C1"

    # Deletion
    mmb = TestBound(
        threshold=-4.0,
        representative_mm_bound=dm.get_representative_mismatch_penalty(),
    )
    params = _params(dm, mmb)
    fmd, _ = build_auxiliary_structures(b"GATTAGCA", b"ACGT")
    hits = k_mismatch_search(b"ATTACA", [0] * 6, params, fmd, dm, mmb)
    _, md, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert md == b"4^G2"

    # 2-base deletion
    fmd, _ = build_auxiliary_structures(b"GATTACAG", b"ACGT")
    hits = k_mismatch_search(b"GATCAG", [0] * 6, params, fmd, dm, mmb)
    _, md, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert md == b"3^TA3"

    # Insertion
    fmd, _ = build_auxiliary_structures(b"GATTACA", b"ACGT")
    hits = k_mismatch_search(b"GATTAGCA", [0] * 8, params, fmd, dm, mmb)
    _, md, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert md == b"7"

    # 2-base insertion
    hits = k_mismatch_search(b"GATTAGGCA", [0] * 9, params, fmd, dm, mmb)
    _, md, _ = to_bam_fields(best_hit(hits).edit_operations, True, 0, NO_ORIG)
    assert md == b"7"


def test_reverse_strand_search_2():
    # mapping.rs:2443-2514
    dm = TestDifferenceModel(deam_score=-1.0, mm_score=-1.0, match_score=0.0)
    mmb = TestBound(threshold=0.0, representative_mm_bound=-1.0)
    params = _params(dm, mmb, penalty_gap_open=-3.0)
    fmd, sa = build_auxiliary_structures(b"AAAGCGTTTGCG", b"ACGT")
    hits = k_mismatch_search(b"TTT", [0] * 3, params, fmd, dm, mmb)
    hit = best_hit(hits)
    strand_len = len(sa) // 2
    fwd = [
        (int(sa[i]), "F")
        for i in hit.interval.range_fwd()
        if sa[i] < strand_len
    ]
    rev = [
        (int(sa[i]), "R")
        for i in range(hit.interval.lower_rev, hit.interval.lower_rev + hit.interval.size)
        if sa[i] < strand_len
    ]
    assert fwd + rev == [(6, "F"), (0, "R")]


def test_edit_operations_reverse_strand():
    # mapping.rs:2516-2590
    dm = TestDifferenceModel(deam_score=-1.0, mm_score=-1.0, match_score=0.0)
    mmb = TestBound(threshold=-1.0, representative_mm_bound=-1.0)
    params = _params(dm, mmb, penalty_gap_open=-3.0)
    fmd, sa = build_auxiliary_structures(b"GATTACA", b"ACGT")
    hits = k_mismatch_search(b"TAGT", [0] * 4, params, fmd, dm, mmb)
    hit = best_hit(hits)
    strand_len = len(sa) // 2
    fwd = [(int(sa[i]), "F") for i in hit.interval.range_fwd() if sa[i] < strand_len]
    rev = [
        (int(sa[i]), "R")
        for i in range(hit.interval.lower_rev, hit.interval.lower_rev + hit.interval.size)
        if sa[i] < strand_len
    ]
    assert fwd + rev == [(1, "R")]

    _, md, nm = to_bam_fields(hit.edit_operations, False, 0, NO_ORIG)
    assert md == b"1T2"
    assert nm == 1


def test_n():
    # mapping.rs:2593-2667
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    mmb = TestBound(threshold=-14.0, representative_mm_bound=repr_mm)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb,
        penalty_gap_open=np.log2(np.float32(0.001)), penalty_gap_extend=repr_mm,
        chunk_size=1, gap_dist_ends=0, stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, _ = build_auxiliary_structures(b"GATTACAGATTACAGATTACA", b"ACGT")

    hits = k_mismatch_search(b"NNNNNNNNNN", [40] * 10, params, fmd, dm, mmb)
    assert len(hits) == 0

    hits = k_mismatch_search(b"AGATNACAG", [40] * 9, params, fmd, dm, mmb)
    assert len(hits) == 1


def test_bench_reads():
    # mapping.rs:2669-2957: endogenous/exogenous suites on a 10kb reference
    ref = open(os.path.join(HERE, "data", "bench_ref.txt")).read().strip().encode()
    reads = [
        l.strip().encode()
        for l in open(os.path.join(HERE, "data", "bench_reads.txt"))
    ]
    dm = SimpleAncientDnaModel(
        ("single_stranded", 0.475, 0.475), 0.001, 0.9,
        np.float32(0.02) / np.float32(3.0), False,
    )
    repr_mm = dm.get_representative_mismatch_penalty()
    mmb = Discrete(0.04, 0.02, repr_mm)
    params = AlignmentParameters(
        difference_model=dm, mismatch_bound=mmb,
        penalty_gap_open=np.log2(np.float32(0.00001)), penalty_gap_extend=repr_mm,
        chunk_size=1, gap_dist_ends=5, stack_limit_abort=False, max_num_gaps_open=2,
    )
    fmd, _ = build_auxiliary_structures(ref, b"ACGT")
    expected_hits = [0, 0, 1, 1, 1, 1, 1]
    for pattern, expect in zip(reads, expected_hits):
        hits = k_mismatch_search(pattern, [40] * len(pattern), params, fmd, dm, mmb)
        assert len(hits) == expect, pattern[:20]
