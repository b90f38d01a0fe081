"""utils: debug guards and profiling meter."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import IntegratorConfig
from gpu_bidirectional_raytracer_tpu.render.progressive import init_state
from gpu_bidirectional_raytracer_tpu.utils import debug
from gpu_bidirectional_raytracer_tpu.utils.profiling import ThroughputMeter


def test_check_state_detects_nan():
    state = init_state(4, 4, IntegratorConfig())
    debug.check_state(state)  # clean passes
    bad = state.colors.at[0, 0, 0].set(jnp.nan)
    import dataclasses

    broken = dataclasses.replace(state, colors=bad)
    with pytest.raises(FloatingPointError):
        debug.check_state(broken, "test")


def test_finite_or_zero():
    x = jnp.array([1.0, jnp.nan, jnp.inf, -2.0])
    np.testing.assert_array_equal(debug.finite_or_zero(x),
                                  [1.0, 0.0, 0.0, -2.0])


def test_image_stats():
    s = debug.image_stats(jnp.array([[0.5, -1.0, jnp.inf]]))
    assert s["nonfinite"] == 1 and s["negative"] == 1


def test_throughput_meter_format():
    m = ThroughputMeter(pixels_per_pass=1000)
    with m:
        pass
    r = m.report()
    assert "Sample/sec" in r and "pass 1" in r
    assert m.samples_per_sec > 0
