"""Golden tests for mismatch bounds (reference mismatch_bounds.rs:283-378)."""

import numpy as np

from mapad_tpu.models import Discrete, SimpleAncientDnaModel, VindijaPwm


def test_allowed_mismatches():
    repr_mm = VindijaPwm().get_representative_mismatch_penalty()
    mb = Discrete(0.04, 0.02, repr_mm)
    expected = [
        (156, 6.0), (124, 6.0), (123, 5.0), (93, 5.0), (92, 4.0), (64, 4.0),
        (63, 3.0), (38, 3.0), (37, 2.0), (17, 2.0), (16, 0.0), (15, 0.0),
        (3, 0.0), (2, 0.0), (0, 0.0),
    ]
    for length, k in expected:
        assert float(mb.get(length)) == k, (length, float(mb.get(length)), k)


def test_allowed_mismatches_bwa_ancient_parameters():
    repr_mm = VindijaPwm().get_representative_mismatch_penalty()
    mb = Discrete(0.01, 0.02, repr_mm)
    expected = [
        (207, 10.0), (176, 9.0), (146, 8.0), (117, 7.0), (90, 6.0), (64, 5.0),
        (42, 4.0), (22, 3.0), (17, 2.0), (8, 0.0), (1, 0.0),
    ]
    for length, k in expected:
        assert float(mb.get(length)) == k, (length, float(mb.get(length)), k)


def test_display():
    repr_mm = VindijaPwm().get_representative_mismatch_penalty()
    mb = Discrete(0.06, 0.02, repr_mm)
    assert str(mb) == (
        " 17 bp:\t1 mismatch\n"
        " 20 bp:\t2 mismatches\n"
        " 45 bp:\t3 mismatches\n"
        " 73 bp:\t4 mismatches\n"
        "104 bp:\t5 mismatches\n"
        "137 bp:\t6 mismatches\n"
        "172 bp:\t7 mismatches\n"
        "208 bp:\t8 mismatches\n"
        "244 bp:\t9 mismatches"
    )


def test_display_2():
    model = SimpleAncientDnaModel(
        ("single_stranded", 0.4, 0.4), 0.02, 1.0, 0.02, False
    )
    mb = Discrete(0.03, 0.02, model.get_representative_mismatch_penalty())
    assert str(mb) == (
        " 17 bp:\t2 mismatches\n"
        " 34 bp:\t3 mismatches\n"
        " 58 bp:\t4 mismatches\n"
        " 86 bp:\t5 mismatches\n"
        "116 bp:\t6 mismatches\n"
        "147 bp:\t7 mismatches\n"
        "180 bp:\t8 mismatches\n"
        "213 bp:\t9 mismatches\n"
        "248 bp:\t10 mismatches"
    )


def test_reject_iterative():
    repr_mm = np.float32(-7.0)
    mb = Discrete(0.04, 0.02, repr_mm)
    assert mb.reject_iterative(-10.1, -3.0)
    assert not mb.reject_iterative(-9.9, -3.0)
