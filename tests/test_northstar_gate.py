"""North-star acceptance gate (tools/northstar.py::evaluate_gate).

The BASELINE.md north-star bar is enforced by `--leg compare`, which now
FAILS (nonzero exit) when TPU-vs-CPU parity regresses. The gate's bounds
come from the decision-flip model (see evaluate_gate's docstring and
artifacts/CLASSIFY.json): strict allclose cannot pass across backends at
1024 accumulated passes, but flips are rare, bounded, and signal-
uncorrelated — so NCC, energy, offender fraction, and magnitude are what
a regression moves.

These tests assert (1) the committed north-star artifacts PASS the gate,
(2) representative regressions FAIL it: a global brightness error (the
round-2 stale-window class of bug), a wrong-constant arithmetic error,
and structural noise.
"""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")

spec = importlib.util.spec_from_file_location(
    "northstar", os.path.join(REPO, "tools", "northstar.py"))
northstar = importlib.util.module_from_spec(spec)
spec.loader.exec_module(northstar)


@pytest.fixture(scope="module")
def legs():
    a = np.load(os.path.join(ART, "northstar_tpu.npy"))
    b = np.load(os.path.join(ART, "northstar_cpu.npy"))
    return a, b


class TestGate:
    @pytest.mark.artifact
    def test_committed_artifacts_pass(self, legs):
        a, b = legs
        metrics, ok = northstar.evaluate_gate(a, b)
        assert ok, metrics["checks"]

    def test_brightness_regression_fails(self, legs):
        # The ~9% stale-VPL-window class of defect: global gain error.
        a, b = legs
        _, ok = northstar.evaluate_gate(a * 1.05, b)
        assert not ok

    def test_constant_regression_fails(self, legs):
        # A wrong arithmetic constant shifts every pixel a little: the
        # offender fraction saturates even though NCC stays high.
        a, b = legs
        _, ok = northstar.evaluate_gate(a + 0.02, b)
        assert not ok

    def test_structural_noise_fails(self, legs):
        a, b = legs
        rng = np.random.default_rng(0)
        noisy = a + rng.normal(0.0, 0.2, size=a.shape).astype(a.dtype)
        _, ok = northstar.evaluate_gate(noisy, b)
        assert not ok

    def test_self_comparison_is_clean(self, legs):
        a, _ = legs
        metrics, ok = northstar.evaluate_gate(a, a)
        assert ok
        assert metrics["offender_pixel_fraction"] == 0.0
        assert metrics["allclose_rtol_1e-3_atol_1e-4"]
