"""Many-sphere differentiable path (`ops.pallas_bounce_grad`): the
facts+re-walk hybrid that replaces the XLA-remat fallback above the
64-sphere pallas-adjoint cap.

Decomposed contract (module docstring of ops/pallas_bounce_grad.py):

1. the aux-conditioned re-walk (`path_tracer.trace(aux=...)`) fed its own
   XLA-collected facts reproduces the full-scan walk EXACTLY — value and
   gradient (the estimator detaches exactly the facts);
2. the pallas facts kernel agrees with the XLA collector on those facts
   (up to knife-edge float divergence — tested at cornell scale where
   interpret-mode compiles are cheap);
3. `diff.gradients.render_radiance(backend='pallas')` routes >64-sphere
   scenes through the hybrid and matches the XLA backend's gradients;
4. finite differences agree on continuous perturbations.

Scenes exceed the 64-sphere cap (except the kernel-facts test) so the
streamed kernel scans and the >64 routing are what is exercised; the
783-sphere configuration runs on real hardware via
tools/bench_bounce_grad.py.
"""

import dataclasses

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
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators import (
    light_tracer,
    path_tracer,
)
from gpu_bidirectional_raytracer_tpu.integrators.direct import (
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce_grad import (
    trace_bounce_aux,
    trace_bounce_diff,
)
from gpu_bidirectional_raytracer_tpu.scene import builtin

W, H = 24, 18


def _many_sphere_scene(k=80, seed=3):
    """Cornell box + k small diffuse spheres: past the 64-sphere cap."""
    base = builtin.cornell_box()
    pos = (jax.random.uniform(jax.random.key(seed), (k, 3))
           * jnp.array([60.0, 60.0, 60.0]) + jnp.array([20.0, 5.0, 20.0]))
    return Scene(
        rad=jnp.concatenate([base.rad, jnp.full((k,), 2.0)]),
        p=jnp.concatenate([base.p, pos]),
        e=jnp.concatenate([base.e, jnp.zeros((k, 3))]),
        c=jnp.concatenate([base.c, jnp.full((k, 3), 0.5)]),
        refl=jnp.concatenate([base.refl, jnp.zeros((k,), jnp.int32)]),
    )


def _rig(scene, w=W, h=H, seed=0):
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    li = static_light_indices(scene)
    key = jax.random.key(seed)
    n = w * h
    u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
    px, py = cam_mod.pixel_grid(w, h)
    rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
    return cam, li, key, rays


@pytest.fixture(scope="module")
def setup():
    scene = _many_sphere_scene()
    assert scene.num_spheres > 64
    cam, li, key, rays = _rig(scene)
    cfg = IntegratorConfig()
    vpls = light_tracer.trace_light_paths(scene, cfg, li, key, jnp.int32(0))
    return scene, cam, li, key, rays, cfg, vpls


class TestReWalkExact:
    """Leg 1: XLA facts fed back reproduce the full-scan walk exactly."""

    def test_forward_bitwise(self, setup):
        scene, cam, li, key, rays, cfg, vpls = setup
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0), vpls=vpls,
                                         vlp_index=jnp.int32(0)))
        b = np.asarray(trace_bounce_diff(scene, cfg, li, rays, key,
                                         jnp.int32(0), vpls=vpls,
                                         vlp_index=jnp.int32(0),
                                         facts="xla"))
        # Same elementwise float ops on both sides (sphere_root is the
        # scan's own quadratic); only XLA re-fusion can differ.
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)

    def test_gradients_match_full_scan(self, setup):
        scene, cam, li, key, rays, cfg, vpls = setup

        def g(fn):
            return jax.grad(lambda sc: jnp.mean(fn(sc) ** 2),
                            allow_int=True)(scene)

        gx = g(lambda sc: path_tracer.trace(
            sc, cfg, li, rays, key, jnp.int32(0), vpls=vpls,
            vlp_index=jnp.int32(0), remat=True))
        gh = g(lambda sc: trace_bounce_diff(
            sc, cfg, li, rays, key, jnp.int32(0), vpls=vpls,
            vlp_index=jnp.int32(0), facts="xla"))
        for f in ("p", "rad", "c", "e"):
            a = np.asarray(getattr(gx, f))
            b = np.asarray(getattr(gh, f))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(b, a, rtol=1e-4,
                                       atol=1e-6 * scale, err_msg=f)

    def test_unidirectional(self, setup):
        scene, cam, li, key, rays, _, _ = setup
        cfg = IntegratorConfig(use_vpl=False)
        a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0)))
        b = np.asarray(trace_bounce_diff(scene, cfg, li, rays, key,
                                         jnp.int32(0), facts="xla"))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)


class TestKernelFacts:
    """Leg 2: the pallas facts kernel vs the XLA collector (cornell scale
    keeps the interpret-mode unrolled-body compile cheap; the facts code
    path is identical at any sphere count — force_unroll)."""

    def test_facts_agree(self):
        scene = builtin.cornell_box()
        cam, li, key, rays = _rig(scene)
        cfg = IntegratorConfig()
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(0))
        aux_p, rad_p = trace_bounce_aux(scene, cfg, li, rays, key,
                                        jnp.int32(0), vpls=vpls,
                                        vlp_index=jnp.int32(0))
        rad_x, aux_x = path_tracer.trace(scene, cfg, li, rays, key,
                                         jnp.int32(0), vpls=vpls,
                                         vlp_index=jnp.int32(0),
                                         collect_aux=True)
        # Hit ids: identical walks up to float-ordering knife edges.
        hid_p, hid_x = np.asarray(aux_p[0]), np.asarray(aux_x[0])
        assert (hid_p != hid_x).mean() <= 0.02, (hid_p != hid_x).mean()
        # Occlusion masks on lanes where the walks agree.
        same = hid_p == hid_x
        occ_p = np.asarray(aux_p[1])[..., 0]
        occ_x = np.asarray(aux_x[1])[..., 0]
        assert (occ_p != occ_x)[same].mean() <= 0.02
        # Kernel's own radiance close to the XLA walk (existing policy).
        a, b = np.asarray(rad_x), np.asarray(rad_p)
        bad = np.any(np.abs(a - b) > (2e-3 + 2e-3 * np.abs(a)),
                     axis=-1).mean()
        assert bad <= 0.12, bad


class TestRouting:
    def test_render_radiance_routes_past_cap(self, setup):
        # diff.gradients routes backend='pallas' past 64 spheres to the
        # hybrid (facts='auto' -> xla collector on CPU); gradients must
        # match the XLA backend exactly.
        scene, cam, li, key, *_ = setup
        cfg = dataclasses.replace(IntegratorConfig(), max_depth=3)

        def g(backend):
            return jax.grad(
                lambda sc: jnp.sum(G.render_radiance(
                    sc, cam, key, cfg, 16, 12, li, 1, backend)),
                allow_int=True)(scene)

        gx = g("xla")
        gp = g("pallas")
        for f in ("p", "rad", "c"):
            a = np.asarray(getattr(gx, f))
            b = np.asarray(getattr(gp, f))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(b, a, rtol=1e-4,
                                       atol=1e-6 * scale, err_msg=f)


class TestFiniteDifferences:
    def test_albedo_fd(self, setup):
        # FD oracle on a small sphere's albedo: continuous perturbation,
        # no decision flips — autodiff through the hybrid must agree.
        scene, cam, li, key, rays, _, _ = setup
        cfg = IntegratorConfig(use_vpl=False)
        wts = jax.random.uniform(jax.random.key(7), (W * H, 3))

        def render(sc):
            return trace_bounce_diff(sc, cfg, li, rays, key, jnp.int32(0),
                                     facts="xla")

        auto = jax.grad(lambda sc: jnp.sum(wts * render(sc)),
                        allow_int=True)(scene)
        idx = (9, 1)  # albedo green channel of the first added sphere
        fd = float((np.asarray(wts) * G.pixel_grad_fd(
            scene, render, "c", idx, 5e-3)).sum())
        got = float(np.asarray(auto.c)[idx])
        assert abs(got - fd) / max(abs(fd), 1e-9) < 5e-2, (got, fd)
