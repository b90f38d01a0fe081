"""The MXU-matmul intersection path (``scan_backend='mxu'``).

`intersect.sphere_distances(method='mxu')` algebraically expands the two
ray-sphere dot products so the cross terms become ``[N,3] @ [3,S]`` matmuls
(and its VJP is matmuls too) — the DIFFERENTIABLE many-sphere fast path
that `diff.gradients.render_radiance(backend='pallas')` falls back to above
the 64-sphere pallas unroll cap. These tests pin:

- root agreement with the reference-exact 'direct' formulation
  (``geomfunc.h:31-58`` quadratic) on random rays;
- whole-image agreement of the 'mxu' tracer with the 'xla' tracer on the
  same tape (decision flips at knife edges allowed, energy must agree);
- many-sphere gradients: ``backend='mxu'`` must produce finite gradients
  that point the same way as the 'direct' XLA gradients above the
  64-sphere cap (and ``backend='pallas'`` must fall back cleanly there).

Measured on v5e (tools/bench_mxu_grad.py, complex.scn 512x384): fwd+bwd
218.4 ms/sample vs 221.6 direct (a wash), fwd 101.5 vs 66.9 (slower) —
so 'mxu' is an explicit opt-in, not the automatic fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import rng as prng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Scene,
)
from gpu_bidirectional_raytracer_tpu import camera as cam_mod
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.integrators import path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import (
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_mxu_roots_match_direct():
    scene = builtin.cornell_box()
    r = np.random.default_rng(7)
    n = 256
    o = r.uniform([5, 5, 5], [95, 75, 165], (n, 3)).astype(np.float32)
    d = _unit(r.normal(size=(n, 3))).astype(np.float32)
    ts_direct = np.asarray(isect.sphere_distances(scene, jnp.asarray(o),
                                                  jnp.asarray(d)))
    ts_mxu = np.asarray(isect.sphere_distances(scene, jnp.asarray(o),
                                               jnp.asarray(d), method="mxu"))
    # Same hit/miss pattern away from knife edges; roots to ~1e-2 absolute
    # at Cornell scale (1e4-radius wall spheres dominate conditioning).
    both = (ts_direct > 0) & (ts_mxu > 0)
    assert both.mean() > 0.5  # the rays do hit things
    np.testing.assert_allclose(ts_mxu[both], ts_direct[both],
                               rtol=1e-3, atol=2e-2)
    disagree = (ts_direct > 0) != (ts_mxu > 0)
    assert disagree.mean() < 0.01


def test_mxu_trace_matches_xla_energy():
    scene = builtin.cornell_box()
    cfg = IntegratorConfig.cpu_golden()
    li = static_light_indices(scene)
    w, h = 24, 18
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    key = jax.random.key(3)
    n = w * h
    jit_uv = prng.site_uniforms(key, jnp.int32(0), 0, prng.CAM_JITTER, 2, n)
    px, py = cam_mod.pixel_grid(w, h)
    rays = cam_mod.primary_rays(cam, w, h, jit_uv[0], jit_uv[1], px, py)
    a = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                     jnp.int32(0)))
    b = np.asarray(path_tracer.trace(scene, cfg, li, rays, key,
                                     jnp.int32(0), scan_backend="mxu"))
    assert np.isfinite(b).all()
    # Identical tape, identical estimator: only knife-edge decision flips
    # may differ. Energy agreement tight, per-lane flips bounded.
    assert abs(a.mean() - b.mean()) <= 0.02 * max(a.mean(), 1e-6)
    # Measured 3.2% at Cornell conditioning (1e4-radius walls): the
    # expanded quadratic loses ~3 digits where |p|^2 ~ 1e8 cancels.
    flips = np.any(~np.isclose(a, b, rtol=1e-3, atol=1e-4), axis=-1)
    assert flips.mean() < 0.05


def _many_sphere_scene(n_spheres=80):
    r = np.random.default_rng(42)
    rad = r.uniform(1.0, 6.0, n_spheres).astype(np.float32)
    p = r.uniform(-40, 40, (n_spheres, 3)).astype(np.float32)
    c = r.uniform(0.1, 0.9, (n_spheres, 3)).astype(np.float32)
    e = np.zeros((n_spheres, 3), np.float32)
    refl = np.zeros(n_spheres, np.int32)
    e[0] = [15, 15, 15]
    c[0] = 0
    return Scene(rad=jnp.asarray(rad), p=jnp.asarray(p), e=jnp.asarray(e),
                 c=jnp.asarray(c), refl=jnp.asarray(refl))


def test_many_sphere_mxu_gradients_agree_and_pallas_falls_back():
    scene = _many_sphere_scene(80)  # above the 64-sphere pallas cap
    w, h = 16, 12
    cam = Camera.make([0, 10, 120], [0, 0, 0], w, h)
    li = static_light_indices(scene)
    cfg = IntegratorConfig.cpu_golden()
    key = jax.random.key(0)
    target = jnp.zeros((h, w, 3))
    loss_m, g_m = G.render_loss_grad(scene, cam, key, target, cfg, w, h, li,
                                     1, backend="mxu")
    loss_x, g_x = G.render_loss_grad(scene, cam, key, target, cfg, w, h, li,
                                     1, backend="xla")
    # backend='pallas' above the cap must fall back cleanly (finite loss).
    loss_p, _ = G.render_loss_grad(scene, cam, key, target, cfg, w, h, li,
                                   1, backend="pallas")
    assert np.isfinite(float(loss_p))
    assert np.isfinite(float(loss_m))
    np.testing.assert_allclose(float(loss_m), float(loss_x), rtol=2e-2)
    for name in ("c", "e", "p", "rad"):
        gm = np.asarray(getattr(g_m, name)).ravel()
        gx = np.asarray(getattr(g_x, name)).ravel()
        assert np.isfinite(gm).all(), name
        denom = np.linalg.norm(gm) * np.linalg.norm(gx)
        if denom > 1e-12:
            cos = float(np.dot(gm, gx) / denom)
            assert cos > 0.98, (name, cos)
