"""Gradient checks: finite-difference validation of the differentiable
renderer (BASELINE.md "grad-check") and a small inverse-rendering fit."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

SCENES = os.path.join(os.path.dirname(__file__), "..", "assets", "scenes")


@pytest.fixture(scope="module")
def setup():
    orig, target, scene = load_scene(os.path.join(SCENES, "simple.scn"))
    w, h = 24, 18
    cam = Camera.make(orig, target, w, h)
    cfg = IntegratorConfig.cpu_golden()
    li = static_light_indices(scene)
    key = jax.random.key(0)
    return scene, cam, cfg, li, key, w, h


def _render(scene, cam, cfg, li, key, w, h, spp=2):
    return G.render_radiance(scene, cam, key, cfg, w, h, li, spp)


class TestGradChecks:
    def test_no_nans_in_gradient(self, setup):
        scene, cam, cfg, li, key, w, h = setup
        target = jnp.zeros((h, w, 3))
        loss, grads = G.render_loss_grad(scene, cam, key, target, cfg, w, h,
                                         li, spp=1)
        assert np.isfinite(float(loss))
        for name in ("p", "rad", "e", "c"):
            g = np.asarray(getattr(grads, name))
            assert np.isfinite(g).all(), f"NaN/inf in d/d{name}"
        # Some gradient must be nonzero.
        assert np.abs(np.asarray(grads.c)).max() > 0

    @pytest.mark.parametrize("param,index,eps", [
        ("c", (1, 0), 1e-3),     # red sphere albedo R
        ("e", (4, 1), 1e-2),     # light emission G
        ("rad", (0,), 1e-1),     # ground sphere radius (fills the frame)
        ("p", (0, 1), 1e-1),     # ground sphere height
        ("rad", (4,), 1e-2),     # light sphere radius (area term)
        ("p", (4, 1), 1e-1),     # light height (distance + cosine terms)
    ])
    def test_fd_matches_autodiff(self, setup, param, index, eps):
        # Geometry cases target the GROUND and LIGHT spheres: they fill
        # the frame / drive every NEE term, so FD has real signal (the
        # small spheres subtend ~1 pixel at 24x18 and both sides of the
        # check degenerate to 0 = 0). Shadow-dominated geometry cases,
        # where the detached estimator genuinely fails, live in
        # tests/test_visibility_grad.py.
        scene, cam, cfg, li, key, w, h = setup

        def render_fn(sc):
            return _render(sc, cam, cfg, li, key, w, h, spp=2)

        def scalar_loss(sc):
            return jnp.sum(render_fn(sc))

        auto = float(np.asarray(getattr(jax.grad(scalar_loss, allow_int=True)(scene), param))[index])
        fd = float(G.pixel_grad_fd(scene, render_fn, param, index, eps).sum())
        geo = param in ("rad", "p")
        denom = max(abs(fd), abs(auto), 1e-6)
        rel = abs(auto - fd) / denom
        limit = 0.1 if geo else 0.05
        assert rel < limit, (param, index, auto, fd, rel)
        if geo:
            assert abs(fd) > 1.0, "geometry FD case lost its signal"

    def test_emission_gradient_is_linear_exact(self, setup):
        # Radiance is linear in emission on purely diffuse transport, so
        # autodiff == FD to float precision.
        scene, cam, cfg, li, key, w, h = setup

        def scalar(sc):
            return jnp.sum(_render(sc, cam, cfg, li, key, w, h, spp=1))

        auto = float(np.asarray(jax.grad(scalar, allow_int=True)(scene).e)[4, 0])
        fd = float(G.pixel_grad_fd(
            scene, lambda sc: _render(sc, cam, cfg, li, key, w, h, spp=1),
            "e", (4, 0), eps=1e-1).sum())
        assert abs(auto - fd) / max(abs(fd), 1e-9) < 1e-3


class TestInverseRendering:
    def test_albedo_recovery_descends(self, setup):
        scene, cam, cfg, li, key, w, h = setup
        target_img = _render(scene, cam, cfg, li, key, w, h, spp=4)

        # Perturb albedo of the red sphere and recover it.
        # Perturb the ground sphere — it covers most of the frame at this
        # tiny resolution (the small spheres subtend ~1 pixel).
        wrong = scene.replace(c=scene.c.at[0].set(jnp.array([0.3, 0.5, 0.9])))
        # Fixed tape (resample=False, target's key/spp): the loss is then a
        # deterministic function of the albedo and must descend; a
        # stochastic fit at this tiny spp is dominated by emitter-pixel
        # variance.
        inv = G.InverseRenderer(scene=wrong, cam=cam, target=target_img,
                                cfg=cfg, width=w, height=h, lr=0.08,
                                spp=4, optimize=("c",), resample=False)
        losses = [inv.step() for _ in range(30)]
        assert losses[-1] < losses[0] * 0.5, losses[::6]
        got = np.asarray(inv.scene.c[0])
        want = np.asarray(scene.c[0])
        assert np.abs(got - want).max() < 0.25, (got, want)

    def test_backend_auto_resolves_and_pallas_steps(self, setup):
        # 'auto' picks XLA off-TPU; an explicit pallas backend must run a
        # step through the hand-written adjoint (interpret mode on CPU)
        # and produce a finite loss — the CLI `optimize --backend` plumb.
        scene, cam, cfg, li, key, w, h = setup
        target_img = _render(scene, cam, cfg, li, key, w, h, spp=1)
        inv = G.InverseRenderer(scene=scene, cam=cam, target=target_img,
                                cfg=cfg, width=w, height=h, spp=1,
                                optimize=("c",), resample=False)
        assert inv.backend == "xla"
        import dataclasses

        # depth-2: interpret-mode compiles of the unrolled reverse sweep
        # are minutes at depth 7 (see tests/test_pallas_grad.py).
        cfg2 = dataclasses.replace(cfg, max_depth=2)
        inv_pl = G.InverseRenderer(scene=scene, cam=cam, target=target_img,
                                   cfg=cfg2, width=w, height=h, spp=1,
                                   optimize=("c",), resample=False,
                                   backend="pallas")
        assert np.isfinite(inv_pl.step())


class TestUnbiasedLoss:
    def test_unbiased_loss_removes_variance_bias(self, setup):
        # On a stochastic fit, plain L2's optimum is darkened by the MC
        # variance term; the two-render product loss is not. Compare the
        # gradient of the ground albedo at the TRUE parameters: unbiased
        # should be ~centered on zero, plain L2 should push darker
        # (positive gradient on albedo).
        scene, cam, cfg, li, key, w, h = setup
        target = G.render_radiance(scene, cam, key, cfg, w, h, li, spp=4)
        g_plain = np.zeros(3)
        g_unb = np.zeros(3)
        n = 12
        for i in range(n):
            k = jax.random.fold_in(jax.random.key(99), i)
            _, gp = G.render_loss_grad(scene, cam, k, target, cfg, w, h, li,
                                       2, "l2")
            _, gu = G.render_loss_grad(scene, cam, k, target, cfg, w, h, li,
                                       2, "l2_unbiased")
            g_plain += np.asarray(gp.c[0]) / n
            g_unb += np.asarray(gu.c[0]) / n
        # plain L2 systematically pushes the albedo down (positive grad);
        # the unbiased estimator's mean gradient is much smaller.
        assert g_plain.mean() > 0
        assert abs(g_unb.mean()) < 0.5 * abs(g_plain.mean()), (g_unb, g_plain)


class TestBidirectionalGradients:
    """The framework's title capability: gradients THROUGH the VPL
    (bidirectional) estimator — light-subpath emission/throughput and the
    eye-side gather (the adjoint of device.cu:457-542)."""

    @pytest.fixture(scope="class")
    def vpl_setup(self):
        orig, target, scene = load_scene(os.path.join(SCENES, "simple.scn"))
        w, h = 24, 18
        cam = Camera.make(orig, target, w, h)
        cfg = IntegratorConfig()  # gpu intent: use_vpl=True, combine_half
        li = static_light_indices(scene)
        key = jax.random.key(0)
        return scene, cam, cfg, li, key, w, h

    @pytest.mark.parametrize("param,index,eps", [
        ("e", (4, 1), 1e-2),     # light emission G (feeds BOTH subpaths)
        ("c", (0, 1), 1e-3),     # ground albedo G (eye + light throughput)
        ("c", (1, 0), 1e-3),     # red sphere albedo R
    ])
    def test_fd_matches_through_vpl_estimator(self, vpl_setup, param,
                                              index, eps):
        scene, cam, cfg, li, key, w, h = vpl_setup

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, w, h, li, 2)

        def scalar(sc):
            return jnp.sum(render_fn(sc))

        auto = float(np.asarray(getattr(
            jax.grad(scalar, allow_int=True)(scene), param))[index])
        fd = float(G.pixel_grad_fd(scene, render_fn, param, index, eps).sum())
        denom = max(abs(fd), abs(auto), 1e-6)
        assert abs(auto - fd) / denom < 0.01, (param, auto, fd)

    def test_gradient_flows_through_light_subpaths(self, vpl_setup):
        # The VPL half must contribute: stop-gradienting the traced VPL
        # buffer has to CHANGE d(image)/d(emission). Otherwise the
        # "differentiable bidirectional" claim is the unidirectional half.
        from gpu_bidirectional_raytracer_tpu import camera as cam_mod
        from gpu_bidirectional_raytracer_tpu import rng
        from gpu_bidirectional_raytracer_tpu.integrators import (
            light_tracer,
            path_tracer,
        )

        scene, cam, cfg, li, key, w, h = vpl_setup
        px, py = cam_mod.pixel_grid(w, h)
        n = w * h
        jit_uv = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
        rays = cam_mod.primary_rays(cam, w, h, jit_uv[0], jit_uv[1], px, py)

        def total(sc, stop_vpls):
            vpls = light_tracer.trace_light_paths(sc, cfg, li, key,
                                                  jnp.int32(0))
            if stop_vpls:
                vpls = jax.tree.map(jax.lax.stop_gradient, vpls)
            rad = path_tracer.trace(sc, cfg, li, rays, key, jnp.int32(0),
                                    vpls=vpls, vlp_index=jnp.int32(0))
            return jnp.sum(rad)

        g_full = jax.grad(lambda sc: total(sc, False),
                          allow_int=True)(scene)
        g_stop = jax.grad(lambda sc: total(sc, True), allow_int=True)(scene)
        de_full = np.asarray(g_full.e)[4]
        de_stop = np.asarray(g_stop.e)[4]
        assert np.isfinite(de_full).all() and np.isfinite(de_stop).all()
        assert not np.allclose(de_full, de_stop), (de_full, de_stop)


class TestLaneWindowedCore:
    """`render_radiance_lanes` (round 3): the lane-windowed core shared by
    `render_radiance` and the sharded training step. A band render must be
    BITWISE-equal to the same lanes of the full-frame render (the global
    tape-window contract), including both straight-through carriers."""

    def test_band_bitwise_equal(self):
        import dataclasses

        from gpu_bidirectional_raytracer_tpu.scene import builtin

        scene = builtin.cornell_box()
        w, h = 16, 12
        n = w * h
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        li = static_light_indices(scene)
        key = jax.random.key(5)
        cfg = dataclasses.replace(IntegratorConfig(), vis_grad_tau=2.0,
                                  sil_grad_tau=1.0, max_depth=3)
        full = np.asarray(G.render_radiance(
            scene, cam, key, cfg, w, h, li, 2)).reshape(n, 3)
        off, cnt = 40, 64
        band = np.asarray(G.render_radiance_lanes(
            scene, cam, key, cfg, w, h, li, 2, "xla",
            lane_offset=jnp.int32(off), lane_count=cnt, lane_total=n))
        np.testing.assert_array_equal(band, full[off:off + cnt])
