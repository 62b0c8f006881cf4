"""PrRange permutation tests (reference prrange.rs:186-261)."""

import pytest

from mapad_tpu.map.prrange import PrRange


def test_large_numbers():
    start, end = 6100000000, 6100000005
    got = sorted(PrRange.try_new(start, end, 1234))
    assert got == list(range(start, end))


def test_try_from_range():
    got = sorted(PrRange.try_new(13, 23, 1234))
    assert got == list(range(13, 23))


def test_itw_bug_case_1():
    pr = PrRange.try_new(5233065207, 5233065216, 400636091)
    assert sum(1 for _ in pr) == 9


def test_small_range():
    assert sorted(PrRange.try_new(1, 2, 1234)) == [1]


def test_invalid_ranges():
    assert PrRange.try_new(1, 0, 1234) is None
    assert PrRange.try_new(1, 1, 1234) is None


def test_seeds():
    # Exhaustive (reduced bound vs reference for wall-clock: 0..=40)
    to = 40
    for start in range(to + 1):
        for end in range(start + 1, to + 1):
            for seed in range(to + 1):
                pr = PrRange.try_new(start, end, seed)
                got = sorted(pr)
                assert got == list(range(start, end)), (start, end, seed)
