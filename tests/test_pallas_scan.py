"""Per-bounce scan kernels + lane compaction (`ops.pallas_scan`,
`path_tracer.trace(scan_backend='pallas')`): the many-sphere fast path.

Runs in interpret mode on CPU. complex.scn itself (783 spheres, depth 7)
is too large for CPU interpret compiles (~20+ min); a 96-sphere synthetic
scene exercises the identical code path at test-feasible cost, and the
783-sphere configuration is covered on real hardware by bench/TPU runs.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod, rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Scene,
)
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer, path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _trace_pair(scene, cfg, w=24, h=18, seed=0, with_vpls=False,
                **kwargs):
    key = jax.random.key(seed)
    li = static_light_indices(scene)
    n = w * h
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    px, py = cam_mod.pixel_grid(w, h)
    u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
    rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
    vpls, vi = (None, None)
    if with_vpls:
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(0))
        vi = jnp.int32(0)
    a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                     jnp.int32(0), vpls=vpls, vlp_index=vi))
    b = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                     jnp.int32(0), vpls=vpls, vlp_index=vi,
                                     scan_backend="pallas", **kwargs))
    return a, b


def _bad_frac(a, b):
    err = np.abs(a - b)
    return np.any(err > (2e-3 + 2e-3 * np.abs(a)), axis=-1).mean()


def _many_sphere_scene(s=96, seed=3):
    """Random diffuse cloud + ground + one emitter: > _UNROLL_CAP spheres,
    cheap enough for CPU interpret compiles."""
    r = np.random.RandomState(seed)
    rad = np.concatenate([[1000.0], 2.0 + 3.0 * r.rand(s - 2), [8.0]])
    p = np.concatenate([
        [[0.0, -1000.0, 0.0]],
        np.stack([80 * r.rand(s - 2) - 40, 40 * r.rand(s - 2),
                  80 * r.rand(s - 2) - 40], axis=1),
        [[0.0, 60.0, 0.0]]])
    e = np.zeros((s, 3)); e[-1] = (12.0, 12.0, 12.0)
    c = 0.2 + 0.6 * r.rand(s, 3); c[-1] = 0.0
    return Scene(rad=jnp.asarray(rad, jnp.float32),
                 p=jnp.asarray(p, jnp.float32),
                 e=jnp.asarray(e, jnp.float32),
                 c=jnp.asarray(c, jnp.float32),
                 refl=jnp.zeros((s,), jnp.int32))


class TestScanBackendParity:
    def test_cornell_no_vpl(self):
        a, b = _trace_pair(builtin.cornell_box(),
                           IntegratorConfig(use_vpl=False))
        assert np.isfinite(b).all()
        assert _bad_frac(a, b) <= 0.02, _bad_frac(a, b)
        assert abs(a.mean() - b.mean()) < 1e-3 * max(a.mean(), 1e-6)

    def test_cornell_bidirectional_on_surface_vpls(self):
        # On-surface VPLs make every vacuum shadow segment a knife edge;
        # the golden-parity suite allows 12% lane flips for this case
        # (tests/test_golden_parity.py) — same policy here. Energy must
        # still agree tightly.
        a, b = _trace_pair(builtin.cornell_box(), IntegratorConfig(),
                           with_vpls=True)
        assert _bad_frac(a, b) <= 0.12, _bad_frac(a, b)
        assert abs(a.mean() - b.mean()) < 2e-3 * max(a.mean(), 1e-6)

    def test_many_sphere_scene(self):
        scene = _many_sphere_scene()
        cfg = dataclasses.replace(IntegratorConfig(use_vpl=False),
                                  max_depth=3)
        a, b = _trace_pair(scene, cfg, w=16, h=12)
        assert np.isfinite(b).all()
        assert b.max() > 0.0
        assert _bad_frac(a, b) <= 0.04, _bad_frac(a, b)

    def test_compaction_is_bitwise_invariant(self):
        # scan_compact permutes lanes every bounce; per-pixel values must
        # be EXACTLY unchanged (the tape follows the pixel id and every
        # per-lane op is elementwise).
        scene = builtin.cornell_box()
        cfg = IntegratorConfig(use_vpl=False)
        key = jax.random.key(2)
        li = static_light_indices(scene)
        w, h = 16, 12
        n = w * h
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        px, py = cam_mod.pixel_grid(w, h)
        u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0),
                                         scan_backend="pallas",
                                         scan_compact=False))
        b = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0),
                                         scan_backend="pallas",
                                         scan_compact=True))
        np.testing.assert_array_equal(a, b)

    def test_banded_lane_window_matches_monolithic(self):
        # The compacting tracer must keep the banded/global-tape contract:
        # tracing a band with lane_offset equals the band of the full
        # trace (the compaction permutation is internal).
        scene = builtin.cornell_box()
        cfg = IntegratorConfig(use_vpl=False)
        key = jax.random.key(1)
        li = static_light_indices(scene)
        w, h = 16, 12
        n = w * h
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        px, py = cam_mod.pixel_grid(w, h)
        u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        full = np.asarray(path_tracer.trace(
            scene, cfg, li, rays, key, jnp.int32(0), scan_backend="pallas"))
        half = n // 2
        import jax.tree_util as jtu
        band = jtu.tree_map(lambda x: x[half:], rays)
        got = np.asarray(path_tracer.trace(
            scene, cfg, li, band, key, jnp.int32(0), scan_backend="pallas",
            lane_offset=jnp.int32(half), lane_total=n))
        np.testing.assert_array_equal(full[half:], got)


class TestLaneIdsTape:
    def test_site_uniforms_lane_ids_gather(self):
        key = jax.random.key(7)
        full = rng.site_uniforms(key, 0, 2, rng.DIFF_UV, 2, 64)
        perm = jnp.asarray(np.random.RandomState(0).permutation(64))
        got = rng.site_uniforms(key, 0, 2, rng.DIFF_UV, 2, 64,
                                lane_ids=perm, lane_total=64)
        np.testing.assert_array_equal(np.asarray(full)[:, np.asarray(perm)],
                                      np.asarray(got))
