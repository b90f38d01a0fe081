"""Hand-written pallas adjoint vs XLA autodiff (ops/pallas_grad.py).

The kernel being adjointed is the eye-trace re-design of
``device.cu:544-791``; the gradient policy must match `jax.grad` of
`path_tracer.trace` (detached discrete structure, differentiable roots,
tangency clamp). Tests run at max_depth=2 on tiny frames: interpret-mode
compiles of the fully-unrolled reverse sweep are minutes at depth 7, and
the depth recursion is structurally identical at every depth.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Scene,
)
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer, path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.ops.pallas_grad import trace_pallas_diff
from gpu_bidirectional_raytracer_tpu.render.progressive import frame_rays
from gpu_bidirectional_raytracer_tpu.scene import builtin
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

SCENES = os.path.join(os.path.dirname(__file__), "..", "assets", "scenes")


def _setup(scene_name="simple", w=16, h=8, **cfg_kw):
    if scene_name == "cornell_builtin":
        scene = builtin.cornell_box()
        orig, target = builtin.DEFAULT_CAMERA_ORIG, builtin.DEFAULT_CAMERA_TARGET
    else:
        orig, target, scene = load_scene(
            os.path.join(SCENES, f"{scene_name}.scn"))
    cfg = IntegratorConfig(max_depth=2, **cfg_kw)
    cam = Camera.make(orig, target, w, h)
    li = static_light_indices(scene)
    key = jax.random.key(0)
    sample = jnp.int32(0)
    rays = frame_rays(cam, cfg, w, h, key, sample)
    return scene, cfg, li, rays, key, sample


def _max_rel(a, b):
    big = np.abs(a) > 1e-3 * max(np.abs(a).max(), 1e-9)
    if not big.any():
        return 0.0
    return float((np.abs(a - b) / np.maximum(np.abs(a), 1e-6))[big].max())


class TestPallasAdjoint:
    def test_forward_matches_xla_tracer(self):
        # Same cfg as the unidirectional grad test so the (cached)
        # pallas lowering is shared.
        scene, cfg, li, rays, key, sample = _setup(
            use_vpl=False, combine_half=False)
        ref = path_tracer.trace(scene, cfg, li, rays, key, sample)
        out = trace_pallas_diff(scene, cfg, li, rays, key, sample,
                                interpret=True, tile_rows=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-6)

    def test_grads_match_xla_autodiff_unidirectional(self):
        scene, cfg, li, rays, key, sample = _setup(
            use_vpl=False, combine_half=False)

        def loss_xla(sc):
            return jnp.sum(path_tracer.trace(sc, cfg, li, rays, key,
                                             sample) ** 2)

        def loss_pl(sc):
            return jnp.sum(trace_pallas_diff(sc, cfg, li, rays, key, sample,
                                             interpret=True,
                                             tile_rows=8) ** 2)

        gx = jax.grad(loss_xla, allow_int=True)(scene)
        gp = jax.grad(loss_pl, allow_int=True)(scene)
        for name in ("p", "rad", "e", "c"):
            a = np.asarray(getattr(gx, name))
            b = np.asarray(getattr(gp, name))
            assert np.isfinite(b).all(), name
            assert _max_rel(a, b) < 5e-3, (name, _max_rel(a, b))

    def test_grads_match_xla_autodiff_bidirectional(self):
        # Cornell: the VPL gather contributes real signal at depth 2.
        scene, cfg, li, rays, key, sample = _setup("cornell_builtin")

        def render(sc, tracer):
            vpls = light_tracer.trace_light_paths(sc, cfg, li, key, sample)
            return jnp.sum(tracer(sc, cfg, li, rays, key, sample, vpls=vpls,
                                  vlp_index=jnp.int32(0)) ** 2)

        pl_tracer = lambda *a, **k: trace_pallas_diff(
            *a, **k, interpret=True, tile_rows=8)
        gx = jax.grad(lambda s: render(s, path_tracer.trace),
                      allow_int=True)(scene)
        gp = jax.grad(lambda s: render(s, pl_tracer), allow_int=True)(scene)
        for name in ("p", "rad", "e", "c"):
            a = np.asarray(getattr(gx, name))
            b = np.asarray(getattr(gp, name))
            assert np.isfinite(b).all(), name
            assert _max_rel(a, b) < 2e-2, (name, _max_rel(a, b))

    def test_grads_match_xla_autodiff_visibility_unidirectional(self):
        # Occluder wedged between simple.scn's light and its ground plane
        # (same construction as tests/test_visibility_grad.py): the
        # straight-through carrier (cfg.vis_grad_tau) dominates the
        # blocker's p/rad gradients, so parity here proves the kernel's
        # hand-written soft-visibility adjoint, not just the detached path.
        orig, target, base = load_scene(os.path.join(SCENES, "simple.scn"))
        scene = Scene(
            rad=jnp.concatenate([base.rad, jnp.array([6.0])]),
            p=jnp.concatenate([base.p, jnp.array([[0.0, 40.0, 0.0]])]),
            e=jnp.concatenate([base.e, jnp.zeros((1, 3))]),
            c=jnp.concatenate([base.c, jnp.array([[0.5, 0.5, 0.5]])]),
            refl=jnp.concatenate([base.refl, jnp.array([0], jnp.int32)]),
        )
        w, h = 16, 12
        cfg = IntegratorConfig(max_depth=2, use_vpl=False,
                               combine_half=False, vis_grad_tau=2.0)
        cam = Camera.make(orig, target, w, h)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        sample = jnp.int32(0)
        rays = frame_rays(cam, cfg, w, h, key, sample)

        def loss_xla(sc):
            return jnp.sum(path_tracer.trace(sc, cfg, li, rays, key,
                                             sample) ** 2)

        def loss_pl(sc):
            return jnp.sum(trace_pallas_diff(sc, cfg, li, rays, key, sample,
                                             interpret=True,
                                             tile_rows=8) ** 2)

        gx = jax.grad(loss_xla, allow_int=True)(scene)
        gp = jax.grad(loss_pl, allow_int=True)(scene)
        oi = scene.num_spheres - 1
        # The carrier must actually fire: the occluder's gradients differ
        # from the detached (tau=0) estimator's.
        import dataclasses
        cfg0 = dataclasses.replace(cfg, vis_grad_tau=0.0)

        def loss_pl0(sc):
            return jnp.sum(trace_pallas_diff(sc, cfg0, li, rays, key, sample,
                                             interpret=True,
                                             tile_rows=8) ** 2)

        gp0 = jax.grad(loss_pl0, allow_int=True)(scene)
        assert not np.allclose(np.asarray(gp.p)[oi], np.asarray(gp0.p)[oi])
        for name in ("p", "rad", "e", "c"):
            a = np.asarray(getattr(gx, name))
            b = np.asarray(getattr(gp, name))
            assert np.isfinite(b).all(), name
            assert _max_rel(a, b) < 5e-3, (name, _max_rel(a, b))

    def test_grads_match_xla_autodiff_visibility_bidirectional(self):
        # Cornell + VPLs with the carrier on: exercises the vacuum
        # (virtual-shadow-ray) soft adjoint too.
        scene, cfg, li, rays, key, sample = _setup("cornell_builtin",
                                                   vis_grad_tau=2.0)

        def render(sc, tracer):
            vpls = light_tracer.trace_light_paths(sc, cfg, li, key, sample)
            return jnp.sum(tracer(sc, cfg, li, rays, key, sample, vpls=vpls,
                                  vlp_index=jnp.int32(0)) ** 2)

        pl_tracer = lambda *a, **k: trace_pallas_diff(
            *a, **k, interpret=True, tile_rows=8)
        gx = jax.grad(lambda s: render(s, path_tracer.trace),
                      allow_int=True)(scene)
        gp = jax.grad(lambda s: render(s, pl_tracer), allow_int=True)(scene)
        for name in ("p", "rad", "e", "c"):
            a = np.asarray(getattr(gx, name))
            b = np.asarray(getattr(gp, name))
            assert np.isfinite(b).all(), name
            assert _max_rel(a, b) < 2e-2, (name, _max_rel(a, b))

    def test_vpl_buffer_gradient_flows(self):
        # The custom_vjp returns d/d(vpl table): stopping it must change
        # the emission gradient (same probe as the XLA-side test).
        scene, cfg, li, rays, key, sample = _setup("cornell_builtin")

        def loss(sc, stop):
            vpls = light_tracer.trace_light_paths(sc, cfg, li, key, sample)
            if stop:
                vpls = jax.tree.map(jax.lax.stop_gradient, vpls)
            return jnp.sum(trace_pallas_diff(
                sc, cfg, li, rays, key, sample, vpls=vpls,
                vlp_index=jnp.int32(0), interpret=True, tile_rows=8) ** 2)

        g = jax.grad(lambda s: loss(s, False), allow_int=True)(scene)
        gs = jax.grad(lambda s: loss(s, True), allow_int=True)(scene)
        li0 = li[0]
        assert not np.allclose(np.asarray(g.e)[li0], np.asarray(gs.e)[li0])

    def test_primary_ray_gradients_flow(self):
        # The adjoint also returns d/d(rays) — the camera-optimization hook.
        scene, cfg, li, rays, key, sample = _setup(
            use_vpl=False, combine_half=False)

        def loss(r):
            return jnp.sum(trace_pallas_diff(scene, cfg, li, r, key, sample,
                                             interpret=True,
                                             tile_rows=8) ** 2)

        def loss_xla(r):
            return jnp.sum(path_tracer.trace(scene, cfg, li, r, key,
                                             sample) ** 2)

        gp = jax.grad(loss)(rays)
        gx = jax.grad(loss_xla)(rays)
        assert np.isfinite(np.asarray(gp.o)).all()
        assert np.abs(np.asarray(gp.d)).max() > 0
        assert _max_rel(np.asarray(gx.o), np.asarray(gp.o)) < 5e-3
        assert _max_rel(np.asarray(gx.d), np.asarray(gp.d)) < 5e-3


class TestFusedStep:
    """The fused l2 training-step kernel (VERDICT r4 #3): loss + scene
    gradients from ONE pallas call must match jax.grad of the l2 loss
    over the XLA tracer — same estimator, same tape, no separate
    forward kernel."""

    @pytest.mark.parametrize("vis_tau", [0.0, 2.0])
    def test_matches_xla_autodiff(self, vis_tau):
        import dataclasses

        from gpu_bidirectional_raytracer_tpu.diff import gradients as G

        scene = builtin.cornell_box()
        w, h = 16, 16
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = dataclasses.replace(IntegratorConfig(), max_depth=2,
                                  vis_grad_tau=vis_tau)
        li = static_light_indices(scene)
        key = jax.random.key(3)
        target = jnp.full((h, w, 3), 0.2)

        # routed automatically: l2 + pallas + spp 1 + sil off
        l_f, g_f = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "l2", "pallas")
        l_x, g_x = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "l2", "xla")
        assert abs(float(l_f) - float(l_x)) <= 1e-5 * max(
            1.0, abs(float(l_x)))
        for f in ("p", "rad", "c", "e"):
            a = np.asarray(getattr(g_x, f))
            b = np.asarray(getattr(g_f, f))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                       err_msg=f"{f} (vis_tau={vis_tau})")

    def test_log_loss_matches_xla_autodiff(self):
        """Round-5 extension of the fused step beyond l2: the log loss
        (diff.gradients.log_loss, the better-conditioned fitting loss)
        fuses the same way — targets pre-log1p'd, cotangent
        2 e / (1 + rad) / (3n) formed in-kernel."""
        import dataclasses

        from gpu_bidirectional_raytracer_tpu.diff import gradients as G

        scene = builtin.cornell_box()
        w, h = 16, 16
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = dataclasses.replace(IntegratorConfig(), max_depth=2)
        li = static_light_indices(scene)
        key = jax.random.key(3)
        target = jnp.full((h, w, 3), 0.2)

        # routed automatically: log + pallas + spp 1 + sil off
        l_f, g_f = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "log", "pallas")
        l_x, g_x = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "log", "xla")
        assert abs(float(l_f) - float(l_x)) <= 1e-5 * max(
            1.0, abs(float(l_x)))
        for f in ("p", "rad", "c", "e"):
            a = np.asarray(getattr(g_x, f))
            b = np.asarray(getattr(g_f, f))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                       err_msg=f)

    def test_unidirectional_config(self):
        """No-VPL estimator: the fused kernel's bidir branches are off
        and no light-subpath pullback runs."""
        import dataclasses

        from gpu_bidirectional_raytracer_tpu.diff import gradients as G

        scene = builtin.cornell_box()
        w, h = 16, 8
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  max_depth=2)
        li = static_light_indices(scene)
        key = jax.random.key(5)
        target = jnp.zeros((h, w, 3))
        l_f, g_f = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "l2", "pallas")
        l_x, g_x = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                      li, 1, "l2", "xla")
        assert abs(float(l_f) - float(l_x)) <= 1e-5 * max(
            1.0, abs(float(l_x)))
        for f in ("p", "rad", "c", "e"):
            a = np.asarray(getattr(g_x, f))
            b = np.asarray(getattr(g_f, f))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                       err_msg=f)


class TestInlineTapeDiff:
    """In-kernel mix32 tape in the DIFFERENTIABLE kernels (round 5):
    with a mix32 key, trace_pallas_diff / trace_pallas_loss_grad ship
    per-row site keys and regenerate the tape in-register in BOTH
    sweeps — loss and every gradient bitwise-equal to the
    precomputed-tape path (proven on-chip this session too)."""

    def test_fused_and_diff_bitwise(self):
        import dataclasses

        from gpu_bidirectional_raytracer_tpu import rng as rng_mod
        from gpu_bidirectional_raytracer_tpu.diff import gradients as G
        from gpu_bidirectional_raytracer_tpu.ops import pallas_trace as mk

        scene = builtin.cornell_box()
        w, h = 16, 16
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = dataclasses.replace(IntegratorConfig(), max_depth=2,
                                  vis_grad_tau=2.0)
        li = static_light_indices(scene)
        key = rng_mod.make_key(3)        # mix32 -> inline
        target = jnp.full((h, w, 3), 0.2)

        def run():
            # spp=1 routes to the fused kernel; spp=2 to the custom_vjp
            # diff kernel — cover both.
            l1, g1 = G.render_loss_grad(scene, cam, key, target, cfg,
                                        w, h, li, 1, "l2", "pallas")
            l2, g2 = G.render_loss_grad(scene, cam, key, target, cfg,
                                        w, h, li, 2, "l2", "pallas")
            return l1, g1, l2, g2

        li1, gi1, li2, gi2 = run()
        orig = mk._mix32_key_dtype
        mk._mix32_key_dtype = lambda k: False
        try:
            lp1, gp1, lp2, gp2 = run()
        finally:
            mk._mix32_key_dtype = orig
        assert float(li1) == float(lp1)
        assert float(li2) == float(lp2)
        for gi, gp in ((gi1, gp1), (gi2, gp2)):
            for f in ("p", "rad", "c", "e"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(gi, f)), np.asarray(getattr(gp, f)),
                    err_msg=f)
