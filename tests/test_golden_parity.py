"""Golden-model parity: the vectorized TPU-path integrators vs the scalar
oracle (`integrators/golden.py`, the ``geomfunc.h`` role) on identical
random tapes.

Because both implementations draw from the same counter-addressed streams,
per-pixel radiance must agree to float32 tolerance except on the
measure-zero set of pixels where a float32-vs-float64 rounding difference
flips a discrete decision (hit id at a grazing angle, Fresnel RR at the
threshold). We therefore assert a high quantile agreement plus a tight
mean error, not exact allclose.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod
from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Rays,
)
from gpu_bidirectional_raytracer_tpu.integrators import (
    golden,
    intersect as isect,
    light_tracer,
    path_tracer,
)
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _assert_mostly_close(ours, ref, atol=2e-3, rtol=2e-3, max_bad_frac=0.01):
    ours, ref = np.asarray(ours, np.float64), np.asarray(ref, np.float64)
    err = np.abs(ours - ref)
    bad = err > (atol + rtol * np.abs(ref))
    bad_pixels = np.any(bad.reshape(bad.shape[0], -1), axis=-1)
    frac = bad_pixels.mean()
    assert frac <= max_bad_frac, (
        f"{frac:.3%} of pixels disagree (>{max_bad_frac:.1%} allowed); "
        f"max err {err.max():.4g}")
    # Decision-flip pixels (counted above) can carry O(1) error; the rest
    # must agree tightly.
    good = ~bad_pixels
    assert np.mean(err[good]) < atol, f"mean err on agreeing pixels " \
        f"{np.mean(err[good]):.4g}"


@pytest.fixture(scope="module")
def cornell():
    scene = builtin.cornell_box()
    return scene, golden.scene_to_np(scene)


class TestIntersectParity:
    def test_nearest_hit_matches_golden(self, cornell, rng_np):
        scene, scene_np = cornell
        n = 256
        o = rng_np.uniform([5, 5, 5], [95, 75, 165], (n, 3)).astype(np.float32)
        d = rng_np.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        hit, t, hid = isect.intersect(scene, jnp.asarray(o), jnp.asarray(d))
        hit, t, hid = np.asarray(hit), np.asarray(t), np.asarray(hid)
        for i in range(n):
            g_hit, g_t, g_id = golden._intersect(scene_np, o[i].astype(np.float64),
                                                 d[i].astype(np.float64))
            assert hit[i] == g_hit
            if g_hit:
                assert abs(t[i] - g_t) < 1e-2 * max(1.0, g_t), (i, t[i], g_t)
                # id can differ only if two surfaces are within tolerance
                if hid[i] != g_id:
                    d2 = golden._sphere_intersect(
                        scene_np["rad"][hid[i]], scene_np["p"][hid[i]],
                        o[i].astype(np.float64), d[i].astype(np.float64))
                    assert abs(d2 - g_t) < 1e-2 * max(1.0, g_t)

    def test_mxu_formulation_close_to_direct(self, cornell, rng_np):
        scene, _ = cornell
        n = 512
        o = rng_np.uniform([5, 5, 5], [95, 75, 165], (n, 3)).astype(np.float32)
        d = rng_np.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        td = isect.sphere_distances(scene, jnp.asarray(o), jnp.asarray(d),
                                    method="direct")
        tm = isect.sphere_distances(scene, jnp.asarray(o), jnp.asarray(d),
                                    method="mxu")
        # same hit/miss pattern except near-tangent rays; distances close
        agree = np.mean((np.asarray(td) > 0) == (np.asarray(tm) > 0))
        assert agree > 0.999
        both = (np.asarray(td) > 0) & (np.asarray(tm) > 0)
        np.testing.assert_allclose(np.asarray(tm)[both], np.asarray(td)[both],
                                   rtol=1e-3, atol=1e-2)


def _run_parity(scene, scene_np, cfg, cam_orig, cam_target, w, h, seed,
                vpls=None, vlp_index=0, direct_only=False, **tol):
    key = jax.random.key(seed)
    sample = jnp.int32(0)
    n = w * h
    light_idx = static_light_indices(scene)

    cam = Camera.make(cam_orig, cam_target, w, h)
    tape = golden.make_tape(key, 0, n, len(light_idx), cfg)
    px, py = cam_mod.pixel_grid(w, h)
    rays = cam_mod.primary_rays(cam, w, h,
                                jnp.asarray(tape["cam"][0]),
                                jnp.asarray(tape["cam"][1]), px, py)

    ours = np.asarray(path_tracer.trace(
        scene, cfg, light_idx, rays, key, sample,
        vpls=vpls, vlp_index=jnp.int32(vlp_index), direct_only=direct_only))

    o_np = np.asarray(rays.o, np.float64)
    d_np = np.asarray(rays.d, np.float64)
    vpls_np = golden.vpls_to_np(vpls) if vpls is not None else None
    ref = np.stack([
        golden.radiance_path_tracing(scene_np, cfg, o_np[i], d_np[i], tape, i,
                                     vpls=vpls_np, vlp_index=vlp_index,
                                     direct_only=direct_only)
        for i in range(n)
    ])
    _assert_mostly_close(ours, ref, **tol)
    return ours, ref


class TestPathTracerParity:
    def test_simple_scene_cpu_config(self):
        from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "scenes", "simple.scn")
        orig, target, scene = load_scene(path)
        cfg = IntegratorConfig.cpu_golden()
        ours, ref = _run_parity(scene, golden.scene_to_np(scene), cfg,
                                orig, target, 24, 18, seed=1)
        assert np.asarray(ours).max() > 0.01  # image is not black

    def test_cornell_cpu_config(self, cornell):
        scene, scene_np = cornell
        cfg = IntegratorConfig.cpu_golden()
        ours, _ = _run_parity(scene, scene_np, cfg,
                              builtin.DEFAULT_CAMERA_ORIG,
                              builtin.DEFAULT_CAMERA_TARGET, 20, 16, seed=2,
                              max_bad_frac=0.02)
        assert np.asarray(ours).max() > 0.01

    def test_cornell_direct_lighting(self, cornell):
        scene, scene_np = cornell
        cfg = IntegratorConfig.cpu_golden()
        _run_parity(scene, scene_np, cfg,
                    builtin.DEFAULT_CAMERA_ORIG,
                    builtin.DEFAULT_CAMERA_TARGET, 16, 12, seed=3,
                    direct_only=True, max_bad_frac=0.02)

    def test_cornell_gpu_config_with_vpls(self, cornell):
        # VPLs deposited by the light pass sit exactly ON surfaces, so every
        # virtual shadow ray's occlusion test (len - EPSILON vs a hit on the
        # 1e4-radius wall sphere) is a knife-edge decision that f32-vs-f64
        # rounding flips for a noticeable pixel fraction — a property of the
        # reference estimator itself. The 0.12 tolerance is JUSTIFIED by the
        # round-4 bidirectional census (tools/northstar.py --leg
        # classify-vpl, artifacts/CLASSIFY_VPL.json): the VPL-gather
        # occlusion flips at ~6% per shadow test between backends — the
        # wall-sphere det cancellation puts ~EPSILON-scale noise on the
        # blocker t at the endpoint gate — only on VALID (on-surface)
        # window VPLs, uniformly across depths, with every offending pixel
        # decomposing into flips + rim amplification (0 unexplained). With
        # a 7-depth walk the per-pixel any-flip probability is tens of
        # percent; 0.12 at thumbnail scale is the measured-regime bound,
        # not slack. The off-surface test below checks the gather math
        # tightly (no knife edge -> near-exact).
        scene, scene_np = cornell
        cfg = IntegratorConfig.gpu()
        key = jax.random.key(11)
        light_idx = static_light_indices(scene)
        vpls = light_tracer.trace_light_paths(scene, cfg, light_idx, key,
                                              jnp.int32(0))
        assert bool(np.asarray(vpls.valid).any()), "light pass deposited nothing"
        _run_parity(scene, scene_np, cfg,
                    builtin.DEFAULT_CAMERA_ORIG,
                    builtin.DEFAULT_CAMERA_TARGET, 16, 12, seed=4,
                    vpls=vpls, vlp_index=0, max_bad_frac=0.12)

    def test_cornell_gpu_config_floating_vpl(self, cornell):
        # A VPL floating mid-box: no knife-edge occlusion, parity is tight.
        from gpu_bidirectional_raytracer_tpu.core.types import VplBuffer

        scene, scene_np = cornell
        cfg = IntegratorConfig.gpu()
        vpls = VplBuffer.zeros(cfg.vpl_depth, cfg.light_points)
        vpls = VplBuffer(
            hp=vpls.hp.at[0, 0].set(jnp.array([60.0, 50.0, 90.0])),
            rad=vpls.rad.at[0, 0].set(jnp.array([2.0, 1.5, 1.0])),
            nl=vpls.nl.at[0, 0].set(jnp.array([0.0, -1.0, 0.0])),
            valid=vpls.valid.at[0, 0].set(True),
        )
        _run_parity(scene, scene_np, cfg,
                    builtin.DEFAULT_CAMERA_ORIG,
                    builtin.DEFAULT_CAMERA_TARGET, 16, 12, seed=5,
                    vpls=vpls, vlp_index=0, max_bad_frac=0.02)
