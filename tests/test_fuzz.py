"""Property-based robustness: random scenes must never produce NaN/Inf or
negative radiance, with or without VPLs, gradients included."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
from gpu_bidirectional_raytracer_tpu.core.types import Camera, Scene
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices


def _random_scene(rng, n_spheres, with_light=True):
    rad = rng.uniform(0.5, 20.0, n_spheres).astype(np.float32)
    p = rng.uniform(-50, 50, (n_spheres, 3)).astype(np.float32)
    c = rng.uniform(0, 1, (n_spheres, 3)).astype(np.float32)
    e = np.zeros((n_spheres, 3), np.float32)
    refl = rng.integers(0, 3, n_spheres).astype(np.int32)
    if with_light:
        e[0] = rng.uniform(1, 20, 3)
        c[0] = 0
    return Scene(rad=jnp.asarray(rad), p=jnp.asarray(p), e=jnp.asarray(e),
                 c=jnp.asarray(c), refl=jnp.asarray(refl))


@pytest.mark.parametrize("seed", range(5))
def test_random_scene_renders_finite(seed):
    rng = np.random.default_rng(seed)
    scene = _random_scene(rng, int(rng.integers(2, 12)))
    r = Renderer(scene, [0, 10, 120], [0, 0, 0], 16, 12,
                 cfg=IntegratorConfig(), seed=seed)
    img = r.render(2)
    assert np.isfinite(img).all()
    assert (img >= 0).all()


@pytest.mark.parametrize("seed", range(3))
def test_random_scene_gradients_finite(seed):
    rng = np.random.default_rng(100 + seed)
    scene = _random_scene(rng, 6)
    w, h = 12, 9
    cam = Camera.make([0, 10, 120], [0, 0, 0], w, h)
    li = static_light_indices(scene)
    target = jnp.zeros((h, w, 3))
    loss, grads = G.render_loss_grad(scene, cam, jax.random.key(seed),
                                     target, IntegratorConfig.cpu_golden(),
                                     w, h, li, 1)
    assert np.isfinite(float(loss))
    for name in ("p", "rad", "e", "c"):
        assert np.isfinite(np.asarray(getattr(grads, name))).all(), name


def test_degenerate_inputs():
    # Camera inside a sphere; zero-radius-ish sphere; coincident spheres.
    scene = Scene.from_lists([
        (50.0, (0, 0, 0), (0, 0, 0), (0.7, 0.7, 0.7), 0),     # around camera
        (1e-3, (1, 1, 1), (0, 0, 0), (0.5, 0.5, 0.5), 0),
        (5.0, (10, 0, 0), (8, 8, 8), (0, 0, 0), 0),
        (5.0, (10, 0, 0), (0, 0, 0), (0.9, 0.9, 0.9), 2),     # coincident
    ])
    r = Renderer(scene, [0, 0, 0], [1, 0, 0], 12, 9, cfg=IntegratorConfig())
    img = r.render(2)
    assert np.isfinite(img).all()
