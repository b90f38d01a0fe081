"""Visibility (cast-shadow) gradients: the straight-through relaxed
occlusion estimator (``IntegratorConfig.vis_grad_tau`` +
``intersect.soft_visibility``).

The detached-path estimator differentiates shading along fixed paths and
sees NO shadow motion; with ``vis_grad_tau > 0`` the NEE/VPL shadow terms
carry a zero-primal gradient term whose linearization moves blocker
silhouettes. These tests pin three facts:

1. the primal image is unchanged (the carrier is exactly zero);
2. shadow-dominated derivatives match finite differences where the
   detached estimator is badly wrong (the upgrade of the sphere-editing
   loop at display_func.c:347-369 into shadow-aware optimization);
3. an occluder position fit converges under the estimator.
"""

import dataclasses
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
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

SCENES = os.path.join(os.path.dirname(__file__), "..", "assets", "scenes")


def _occluder_scene():
    """simple.scn + a sphere wedged between its light (idx 4, at (0,60,0))
    and the ground plane: the ground shadow dominates the occluder's
    image footprint."""
    orig, tgt, scene = load_scene(os.path.join(SCENES, "simple.scn"))
    scene = Scene(
        rad=jnp.concatenate([scene.rad, jnp.array([6.0])]),
        p=jnp.concatenate([scene.p, jnp.array([[0.0, 40.0, 0.0]])]),
        e=jnp.concatenate([scene.e, jnp.zeros((1, 3))]),
        c=jnp.concatenate([scene.c, jnp.array([[0.5, 0.5, 0.5]])]),
        refl=jnp.concatenate([scene.refl, jnp.array([0], jnp.int32)]),
    )
    return orig, tgt, scene


@pytest.fixture(scope="module")
def setup():
    orig, tgt, scene = _occluder_scene()
    w, h = 32, 24
    cam = Camera.make(orig, tgt, w, h)
    li = static_light_indices(scene)
    key = jax.random.key(0)
    return scene, cam, li, key, w, h


class TestPrimalInvariance:
    def test_image_unchanged_unidirectional(self, setup):
        scene, cam, li, key, w, h = setup
        cfg = IntegratorConfig.cpu_golden()
        cfg_t = dataclasses.replace(cfg, vis_grad_tau=2.0)
        a = np.asarray(G.render_radiance(scene, cam, key, cfg, w, h, li, 2))
        b = np.asarray(G.render_radiance(scene, cam, key, cfg_t, w, h, li, 2))
        # The carrier is exactly 0.0 in the primal; bitwise equality holds
        # on this path.
        np.testing.assert_array_equal(a, b)

    def test_image_unchanged_bidirectional(self, setup):
        scene, cam, li, key, w, h = setup
        cfg = IntegratorConfig()  # use_vpl=True
        cfg_t = dataclasses.replace(cfg, vis_grad_tau=2.0)
        a = np.asarray(G.render_radiance(scene, cam, key, cfg, w, h, li, 2))
        b = np.asarray(G.render_radiance(scene, cam, key, cfg_t, w, h, li, 2))
        # The soft subgraph shares subexpressions with the gather, which
        # lets XLA re-fuse a handful of fmas: <= 1 ulp, not bitwise.
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


class TestShadowFdAgreement:
    """d(sum image)/d(occluder radius) is shadow-dominated: growing the
    sphere grows its cast shadow. FD is the oracle (eps=1 moves the
    penumbra across several pixels of the fixed tape)."""

    def _grads(self, setup, tau):
        scene, cam, li, key, w, h = setup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  vis_grad_tau=tau)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, w, h, li, 4)

        oi = scene.num_spheres - 1
        auto = jax.grad(lambda sc: jnp.sum(render_fn(sc)),
                        allow_int=True)(scene)
        return scene, render_fn, auto, oi

    def test_occluder_radius_matches_fd(self, setup):
        scene, render_fn, auto, oi = self._grads(setup, tau=2.0)
        fd = float(G.pixel_grad_fd(scene, render_fn, "rad", (oi,), 1.0).sum())
        got = float(np.asarray(auto.rad)[oi])
        assert abs(got - fd) / max(abs(fd), 1e-6) < 0.15, (got, fd)

    def test_detached_estimator_is_wrong_here(self, setup):
        # The motivation: without the carrier the same derivative misses
        # the shadow-area term by ~half. If this starts passing with a
        # small error, the detached estimator got smarter — re-evaluate
        # whether vis_grad_tau is still needed.
        scene, render_fn_t, auto0, oi = self._grads(setup, tau=0.0)
        # FD oracle must come from the SAME primal (primal is tau-invariant,
        # so reuse any render_fn).
        fd = float(G.pixel_grad_fd(scene, render_fn_t, "rad", (oi,),
                                   1.0).sum())
        got0 = float(np.asarray(auto0.rad)[oi])
        assert abs(got0 - fd) / max(abs(fd), 1e-6) > 0.3, (got0, fd)

    def test_occluder_position_sign(self, setup):
        # Lateral occluder motion: the image-sum derivative is dominated by
        # which albedo the shadow covers. The detached estimator has the
        # WRONG SIGN on this configuration; the straight-through one agrees
        # with FD.
        scene, render_fn, auto_t, oi = self._grads(setup, tau=2.0)
        _, _, auto_0, _ = self._grads(setup, tau=0.0)
        fd = float(G.pixel_grad_fd(scene, render_fn, "p", (oi, 0), 1.0).sum())
        got_t = float(np.asarray(auto_t.p)[oi, 0])
        got_0 = float(np.asarray(auto_0.p)[oi, 0])
        assert fd < 0
        assert got_t < 0, (got_t, fd)
        assert got_0 > 0, "detached estimator fixed? see comment above"


class TestShadowRecovery:
    def test_occluder_position_recovery_converges(self, setup):
        scene, cam, li, key, w, h = setup
        oi = scene.num_spheres - 1
        cfg0 = IntegratorConfig.cpu_golden()
        target = G.render_radiance(scene, cam, key, cfg0, w, h, li, 4)
        wrong = scene.replace(p=scene.p.at[oi, 0].add(8.0))
        cfg = dataclasses.replace(cfg0, vis_grad_tau=2.0)
        inv = G.InverseRenderer(scene=wrong, cam=cam, target=target,
                                cfg=cfg, width=w, height=h, lr=0.4, spp=4,
                                optimize=("p",), resample=False, loss="l2")
        e0 = abs(float(inv.scene.p[oi, 0] - scene.p[oi, 0]))
        for _ in range(40):
            inv.step()
        e1 = abs(float(inv.scene.p[oi, 0] - scene.p[oi, 0]))
        assert e0 == pytest.approx(8.0)
        assert e1 < 2.0, (e0, e1)

    def test_vpl_path_carries_visibility_gradient(self, setup):
        # The virtual-shadow-ray (vacuum) variant must also flow: with the
        # bidirectional config, switching tau on changes the occluder
        # gradient and keeps it finite.
        scene, cam, li, key, w, h = setup
        oi = scene.num_spheres - 1
        base = IntegratorConfig()  # use_vpl=True
        cfg_t = dataclasses.replace(base, vis_grad_tau=2.0)

        def g(cfg):
            return jax.grad(
                lambda sc: jnp.sum(G.render_radiance(sc, cam, key, cfg,
                                                     w, h, li, 2)),
                allow_int=True)(scene)

        g0 = np.asarray(g(base).p)[oi]
        g1 = np.asarray(g(cfg_t).p)[oi]
        assert np.isfinite(g0).all() and np.isfinite(g1).all()
        assert not np.allclose(g0, g1), (g0, g1)


class TestEndpointStraddle:
    """Two-sided shadow-endpoint carrier (round 3, VERDICT r2 #7): a
    blocker whose chord straddles the FAR end of the shadow segment (a
    sphere dipping into the span of light-sample endpoints) previously
    sat on the hard, stop-gradiented ``b < maxt`` gate — zero gradient
    for its motion along the segment, and none for the light pulling its
    endpoint across the blocker. The endpoint sigmoid in
    `intersect.soft_visibility` carries both.

    Geometry: floor + light (rad 5 at y=40) + a blocker overhead whose
    bottom (y=40) reaches the light's sample span. Measured calibration
    (round-3 probes): the detached estimator is BLIND to the blocker's
    vertical motion/growth (<=10% of FD). With the full-tau endpoint
    band the carrier overshot ~2x (sigmoid-bandwidth bias); the narrow
    band (`intersect.ENDPOINT_TAU_FRACTION` = tau/4, sweep-calibrated:
    ratio 2.36 -> 1.06 axial / 1.92 -> 0.94 radius at this tape,
    1.1-1.3 across tapes) brings blocker motion/growth into a
    [0.6, 1.6] band. Tradeoff: the LIGHT-position closure (additive on
    a large detached shading term) weakens at low spp — the narrow
    band sees fewer maxt crossings per tape (err-frac 0.69 at spp=8,
    0.50 at spp=32, vs ~0.3 at full tau) — accepted because blocker
    calibration is the endpoint carrier's primary job.
    """

    @pytest.fixture(scope="class")
    def esetup(self):
        scene = Scene(
            rad=jnp.array([1e4, 5.0, 6.0]),
            p=jnp.array([[0.0, -1e4, 0.0],
                         [0.0, 40.0, 0.0],     # light
                         [0.0, 46.0, 0.0]]),   # blocker straddling its top
            e=jnp.array([[0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0],
                         [0.0, 0.0, 0.0]]),
            c=jnp.array([[0.7, 0.7, 0.7],
                         [0.0, 0.0, 0.0],
                         [0.4, 0.4, 0.4]]),
            refl=jnp.array([0, 0, 0], jnp.int32),
        )
        w, h = 32, 24
        cam = Camera.make(jnp.array([0.0, 25.0, 70.0]),
                          jnp.array([0.0, 5.0, 0.0]), w, h)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        return scene, cam, li, key, w, h

    def _grads(self, esetup, tau, param, idx, eps, spp=8):
        scene, cam, li, key, w, h = esetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  vis_grad_tau=tau)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, w, h, li, spp)

        auto = jax.grad(lambda sc: jnp.sum(render_fn(sc)),
                        allow_int=True)(scene)
        fd = float(G.pixel_grad_fd(scene, render_fn, param, idx, eps).sum())
        return float(np.asarray(getattr(auto, param))[idx]), fd

    def test_blocker_axial_motion(self, esetup):
        got_det, fd = self._grads(esetup, 0.0, "p", (2, 1), 1.0)
        got_t, _ = self._grads(esetup, 1.0, "p", (2, 1), 1.0)
        assert abs(got_det) < 0.1 * abs(fd), (got_det, fd)     # blind
        assert np.sign(got_t) == np.sign(fd), (got_t, fd)
        assert 0.6 < got_t / fd < 1.6, (got_t, fd)   # measured 1.06

    def test_blocker_radius(self, esetup):
        got_det, fd = self._grads(esetup, 0.0, "rad", (2,), 1.0)
        got_t, _ = self._grads(esetup, 1.0, "rad", (2,), 1.0)
        assert abs(got_det) < 0.1 * abs(fd), (got_det, fd)
        assert np.sign(got_t) == np.sign(fd), (got_t, fd)
        assert 0.6 < got_t / fd < 1.6, (got_t, fd)   # measured 0.94

    def test_light_endpoint_gradient(self, esetup):
        # Moving the light moves every segment endpoint across the
        # blocker: the carrier must close a real part of the detached
        # estimator's FD gap (shading terms dominate the absolute
        # value). With the narrow endpoint band the closure at spp=8 is
        # 31% (err-frac 0.69; 50% at spp=32) — see the class docstring's
        # measured tradeoff.
        got_det, fd = self._grads(esetup, 0.0, "p", (1, 1), 1.0)
        got_t, _ = self._grads(esetup, 1.0, "p", (1, 1), 1.0)
        assert abs(got_t - fd) < 0.8 * abs(got_det - fd), (got_det, got_t,
                                                           fd)
