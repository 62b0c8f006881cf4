"""Golden-value tests for the aDNA scoring model.

Golden values are extracted from the reference's own unit tests
(sequence_difference_models.rs:451-1277) into tests/data/adna_goldens.json.
Tolerance 1e-6 matches the reference's assert_approx_eq.
"""

import json
import os

import numpy as np
import pytest

from mapad_tpu.models import SimpleAncientDnaModel, VindijaPwm

HERE = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(HERE, "data", "adna_goldens.json")) as f:
    GOLDENS = json.load(f)

DIV = np.float32(0.02) / np.float32(3.0)


def _model(params):
    if params["lib"] == "ss":
        lib = ("single_stranded", params["five"], params["three"])
    else:
        lib = ("double_stranded", params["overhang"])
    return SimpleAncientDnaModel(
        lib, params["ds_rate"], params["ss_rate"], DIV, params["ignore_bq"]
    )


@pytest.mark.parametrize("key", ["ss", "ds"])
def test_simple_adna_model_goldens(key):
    data = GOLDENS[key]
    model = _model(data["params"])
    failures = []
    for expected, i, length, frm, to, qual in data["golden"]:
        got = float(model.get(i, length, ord(frm), ord(to), qual))
        if abs(got - expected) > 1e-6:
            failures.append((i, length, frm, to, qual, expected, got))
    assert not failures, f"{len(failures)} mismatches, first: {failures[:5]}"


@pytest.mark.parametrize("key", ["ss", "ds"])
def test_vectorized_matches_scalar(key):
    data = GOLDENS[key]
    model = _model(data["params"])
    rng = np.random.default_rng(0)
    L = 37
    pattern = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=L)
    quals = rng.integers(2, 41, size=L).astype(np.uint8)
    lut = model.score_lut(pattern, quals)
    opt = model.optimal_penalties(pattern, quals)
    for i in range(L):
        got_opt = model.get_min_penalty(i, L, int(pattern[i]), int(quals[i]), False)
        assert np.float32(got_opt) == opt[i]
        for b_idx, b in enumerate(b"ACGT"):
            raw = model.get(i, L, b, int(pattern[i]), int(quals[i]))
            assert np.float32(raw - opt[i]) == lut[i, b_idx]


def test_simple_adna_wo_deam():
    # reference :1279-1304
    model = SimpleAncientDnaModel(("single_stranded", 0.0, 0.0), 0.0, 0.0, DIV, False)
    assert model.get(0, 25, ord("C"), ord("T"), 40) == model.get(
        13, 25, ord("T"), ord("A"), 40
    )
    assert model.get(24, 25, ord("C"), ord("T"), 40) == model.get(
        13, 25, ord("T"), ord("A"), 40
    )
    assert model.get(13, 25, ord("C"), ord("C"), 40) == model.get(
        0, 25, ord("C"), ord("C"), 40
    )


def test_display():
    # reference :1306-1339
    model_ss = SimpleAncientDnaModel(("single_stranded", 0.4, 0.3), 0.02, 1.0, DIV, False)
    assert str(model_ss) == (
        '"Ordinary" mismatch: -7.20\n'
        "Central C->T / G->A: -5.25\n"
        "5' C->T: -1.29 -2.48 -3.52 -4.30 -4.80 -5.05 -5.17 -5.22 -5.24 -5.25 ...\n"
        "3' C->T: -1.68 -3.16 -4.27 -4.88 -5.13 -5.22 -5.24 -5.25 -5.25 -5.25 ..."
    )
    model_ds = SimpleAncientDnaModel(("double_stranded", 0.4), 0.02, 1.0, DIV, False)
    assert str(model_ds) == (
        '"Ordinary" mismatch: -7.20\n'
        "Central C->T / G->A: -5.25\n"
        "5' C->T: -1.29 -2.48 -3.52 -4.30 -4.80 -5.05 -5.17 -5.22 -5.24 -5.25 ...\n"
        "3' G->A: -1.29 -2.48 -3.52 -4.30 -4.80 -5.05 -5.17 -5.22 -5.24 -5.25 ..."
    )


def test_vindija_pwm():
    # reference :427-448
    pwm = VindijaPwm()
    rl = 35
    assert abs(pwm.get(0, rl, ord("C"), ord("T"), 40) - (-1.321928)) < 1e-6
    assert abs(pwm.get(0, rl, ord("C"), ord("C"), 40) - (-0.736965)) < 1e-6
    assert abs(pwm.get(15, rl, ord("C"), ord("T"), 40) - (-5.643856)) < 1e-6
    assert abs(pwm.get(15, rl, ord("G"), ord("C"), 40) - (-10.965784)) < 1e-6
    assert abs(pwm.get(15, rl, ord("A"), ord("A"), 40) - (-0.000721)) < 1e-6


def test_find_alignment_start():
    model = _model(GOLDENS["ss"]["params"])
    assert model.find_alignment_start(80) == 80
    pwm = VindijaPwm()
    assert pwm.find_alignment_start(80) == 40


def test_raw_grid_fast_path_bit_equal():
    """SimpleAncientDnaModel.raw_grid (single-pass LUT grid) must be
    bit-identical to the generic stack-of-get_vec fallback."""
    import numpy as np

    from mapad_tpu.models import SimpleAncientDnaModel
    from mapad_tpu.models.adna import SequenceDifferenceModel

    for prep in (("single_stranded", 0.6, 0.55), ("double_stranded", 0.45)):
        dm = SimpleAncientDnaModel(prep, 0.01, 1.0,
                                   np.float32(0.02 / 3.0), False)
        rng = np.random.default_rng(3)
        L, M = 37, 61
        seqs = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(L, M))
        quals = rng.integers(2, 41, size=(L, M)).astype(np.uint8)
        n = rng.integers(10, M + 1, size=L)
        j = np.broadcast_to(np.arange(M, dtype=np.int64), (L, M))
        ng = np.maximum(
            np.broadcast_to(n[:, None].astype(np.int64), (L, M)), j + 1
        )
        fast = dm.raw_grid(j, ng, seqs, quals)
        slow = SequenceDifferenceModel.raw_grid(dm, j, ng, seqs, quals)
        assert fast.dtype == slow.dtype == np.float32
        assert np.array_equal(fast, slow), prep
