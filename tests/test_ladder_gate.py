"""The BASELINE config-ladder gate (tools/ladder.py::evaluate_rung) must
FAIL loudly on real regressions and pass the committed artifacts' regime.

The gate compares two SAME-TAPE renders of the first ref_spp passes on
different backends (deterministic parity, sub-percent bounds) plus
finiteness of the full-config artifact render — see the tool docstring
for why a statistical low-spp reference was measured unsound (shared-VPL
passes swing few-pass image means 2-3x).
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

from ladder import (  # noqa: E402
    RUNGS,
    evaluate_inverse_rung,
    evaluate_rung,
)


def _fake_pair(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(0.05, 1.0, (h, w, 3)).astype(np.float32)
    # cross-backend float drift + a couple of knife-edge decision flips
    head = ref * (1 + rng.normal(0, 1e-6, ref.shape).astype(np.float32))
    head[3, 7] = ref[3, 7] * 1.5
    head[40, 22] = 0.0
    return head, ref


class TestLadderGate:
    def test_parity_regime_passes(self):
        head, ref = _fake_pair()
        res, ok = evaluate_rung(head, head, ref)
        assert ok, res["checks"]

    def test_brightness_regression_fails(self):
        # e.g. a dropped (direct+vpl)/2 halving or a gain bug
        head, ref = _fake_pair()
        res, ok = evaluate_rung(head, head * 1.1, ref)
        assert not ok
        assert not res["checks"]["global_mean<=1%"]

    def test_structural_regression_fails(self):
        # e.g. wrong tape window / shuffled tiles: decorrelated content
        head, ref = _fake_pair()
        rng = np.random.default_rng(1)
        shuffled = ref[rng.permutation(ref.shape[0])]
        res, ok = evaluate_rung(head, shuffled, ref)
        assert not ok
        assert not res["checks"]["ncc>=0.999"]

    def test_nonfinite_full_render_fails(self):
        head, ref = _fake_pair()
        bad = head.copy()
        bad[0, 0, 0] = np.nan
        res, ok = evaluate_rung(bad, head, ref)
        assert not ok
        assert not res["checks"]["finite"]

    @pytest.mark.artifact
    def test_committed_artifact_passes_and_covers_all_rungs(self):
        path = os.path.join(REPO, "artifacts", "LADDER.json")
        with open(path) as f:
            d = json.load(f)
        want = set(RUNGS) | {"inverse"}
        assert set(d) == want, (set(d), want)
        for name, res in d.items():
            assert res["passed"], (name, res["checks"])
            if name != "inverse":
                assert res["ncc_cells"] >= 0.999


class TestInverseRungGate:
    """evaluate_inverse_rung (the ladder's final rung, BASELINE.md:25)
    must fail on non-recovery and pass a genuine recovery."""

    GOOD = {
        "loss_start": 2.0, "loss_final": 0.05,
        "pos_err_final": 0.6, "rad_err_final": 0.1,
        "albedo_err_final": 0.05,
    }

    def test_good_recovery_passes(self):
        res, ok = evaluate_inverse_rung(dict(self.GOOD))
        assert ok, res["checks"]

    @pytest.mark.parametrize("field,value,check", [
        ("loss_final", 1.5, "loss_reduced"),
        ("pos_err_final", 3.0, "pos_err<=1.2"),
        ("rad_err_final", 2.0, "rad_err<=0.6"),
        ("albedo_err_final", 0.3, "albedo_err<=0.10"),
        ("loss_final", float("nan"), "finite"),
    ])
    def test_non_recovery_fails(self, field, value, check):
        bad = dict(self.GOOD)
        bad[field] = value
        res, ok = evaluate_inverse_rung(bad)
        assert not ok
        assert not res["checks"][check], res["checks"]
