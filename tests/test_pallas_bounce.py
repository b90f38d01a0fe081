"""Per-depth fused bounce kernel (`ops.pallas_bounce.trace_pallas_bounce`):
the many-sphere megakernel. Parity vs the XLA tracer on the same tape;
interpret mode on CPU (cornell-scale scenes keep the unrolled-body
compiles test-feasible — the 783-sphere configuration is exercised on
real hardware by tools/bench_complex.py: 25.0 vs 66.7 ms/sample, 2.67x).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod, rng
from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer, path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce import trace_pallas_bounce
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _setup(w=24, h=18, seed=0):
    scene = builtin.cornell_box()
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    li = static_light_indices(scene)
    key = jax.random.key(seed)
    n = w * h
    u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
    px, py = cam_mod.pixel_grid(w, h)
    rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
    return scene, li, key, rays, n


def _bad(a, b, atol=2e-3):
    err = np.abs(a - b)
    return np.any(err > (atol + 2e-3 * np.abs(a)), axis=-1).mean()


class TestBounceKernelParity:
    def test_unidirectional(self):
        scene, li, key, rays, n = _setup()
        cfg = IntegratorConfig(use_vpl=False)
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0)))
        b = np.asarray(trace_pallas_bounce(scene, cfg, li, rays, key,
                                           jnp.int32(0)))
        assert np.isfinite(b).all()
        assert _bad(a, b) <= 0.02, _bad(a, b)
        assert abs(a.mean() - b.mean()) < 1e-3 * max(a.mean(), 1e-6)

    def test_bidirectional_on_surface_vpls(self):
        # 12% lane-flip allowance for on-surface VPL vacuum shadows —
        # same policy as the golden-parity and scan-backend suites.
        scene, li, key, rays, n = _setup()
        cfg = IntegratorConfig()
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(0))
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0), vpls=vpls,
                                         vlp_index=jnp.int32(0)))
        b = np.asarray(trace_pallas_bounce(scene, cfg, li, rays, key,
                                           jnp.int32(0), vpls=vpls,
                                           vlp_index=jnp.int32(0)))
        assert _bad(a, b) <= 0.12, _bad(a, b)
        assert abs(a.mean() - b.mean()) < 2e-3 * max(a.mean(), 1e-6)

    def test_direct_only(self):
        scene, li, key, rays, n = _setup()
        cfg = IntegratorConfig(use_vpl=False)
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0), direct_only=True))
        b = np.asarray(trace_pallas_bounce(scene, cfg, li, rays, key,
                                           jnp.int32(0), direct_only=True))
        assert _bad(a, b) <= 0.02, _bad(a, b)

    def test_matches_megakernel(self):
        # Same _bounce_step body as the fused megakernel — per-pixel
        # agreement should be essentially exact (fma re-fusion only).
        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
            trace_pallas,
        )

        scene, li, key, rays, n = _setup()
        cfg = IntegratorConfig(use_vpl=False)
        m = np.asarray(trace_pallas(scene, cfg, li, rays, key, jnp.int32(0),
                                    interpret=True))
        b = np.asarray(trace_pallas_bounce(scene, cfg, li, rays, key,
                                           jnp.int32(0)))
        assert _bad(m, b, atol=1e-5) <= 0.005, _bad(m, b, atol=1e-5)

    def test_banded_lane_window(self):
        import jax.tree_util as jtu

        scene, li, key, rays, n = _setup(w=16, h=12, seed=1)
        cfg = IntegratorConfig(use_vpl=False)
        full = np.asarray(trace_pallas_bounce(scene, cfg, li, rays, key,
                                              jnp.int32(0)))
        half = n // 2
        band = jtu.tree_map(lambda x: x[half:], rays)
        got = np.asarray(trace_pallas_bounce(
            scene, cfg, li, band, key, jnp.int32(0),
            lane_offset=jnp.int32(half), lane_total=n))
        np.testing.assert_array_equal(full[half:], got)

    def test_block_tiled_layout_bitwise(self):
        """frame_dims block tiling (the VERDICT r4 #4 broad phase) is a
        pure lane permutation: bitwise-equal image, every lane on its
        pixel's tape columns."""
        from gpu_bidirectional_raytracer_tpu.integrators import light_tracer

        scene, li, key, rays, n = _setup(w=128, h=32, seed=2)
        cfg = IntegratorConfig()
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(3))
        plain = np.asarray(trace_pallas_bounce(
            scene, cfg, li, rays, key, jnp.int32(3), vpls=vpls,
            vlp_index=jnp.int32(0)))
        blocked = np.asarray(trace_pallas_bounce(
            scene, cfg, li, rays, key, jnp.int32(3), vpls=vpls,
            vlp_index=jnp.int32(0), frame_dims=(128, 32)))
        np.testing.assert_array_equal(blocked, plain)

    def test_block_tiled_aux_facts_bitwise(self):
        """The facts kernel (fwd+bwd hybrid) under block tiling returns
        facts in PIXEL order, identical to the natural layout."""
        from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce_grad import (
            trace_bounce_aux,
        )

        scene, li, key, rays, n = _setup(w=128, h=32, seed=4)
        cfg = IntegratorConfig(use_vpl=False)
        (hid_a, occ_a, _), rad_a = trace_bounce_aux(
            scene, cfg, li, rays, key, jnp.int32(0))
        (hid_b, occ_b, _), rad_b = trace_bounce_aux(
            scene, cfg, li, rays, key, jnp.int32(0), frame_dims=(128, 32))
        np.testing.assert_array_equal(np.asarray(hid_b), np.asarray(hid_a))
        np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_a))
        np.testing.assert_array_equal(np.asarray(rad_b), np.asarray(rad_a))
