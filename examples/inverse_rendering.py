#!/usr/bin/env python
"""Inverse rendering example: recover corrupted albedos from one image.

Demonstrates the differentiable path end-to-end with the unbiased
two-render product loss (see diff/gradients.py for why plain L2 on noisy
Monte Carlo renders converges to a darkened scene).

Run (CPU is fine at this scale):
    python examples/inverse_rendering.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.render import film
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene


def main():
    w, h = 96, 72
    orig, tgt, scene_true = load_scene("assets/scenes/simple.scn")
    cam = Camera.make(orig, tgt, w, h)
    cfg = IntegratorConfig.cpu_golden()
    li = static_light_indices(scene_true)
    key = jax.random.key(0)

    target = G.render_radiance(scene_true, cam, key, cfg, w, h, li, spp=4)
    film.write_png(target, "inverse_target.png")

    wrong = scene_true.replace(
        c=scene_true.c.at[0].set(jnp.array([0.2, 0.3, 0.8])))
    film.write_png(G.render_radiance(wrong, cam, key, cfg, w, h, li, spp=4),
                   "inverse_start.png")

    inv = G.InverseRenderer(scene=wrong, cam=cam, target=target, cfg=cfg,
                            width=w, height=h, lr=0.05, spp=2,
                            optimize=("c",))
    t0 = time.time()
    for i in range(200):
        loss = inv.step()
        if i % 40 == 0:
            err = float(jnp.abs(inv.scene.c[0] - scene_true.c[0]).max())
            print(f"step {i:3d}  loss {loss:9.6f}  ground-albedo err {err:.3f}")
    print(f"done in {time.time() - t0:.1f}s")
    print("true ground albedo:", np.asarray(scene_true.c[0]))
    print("recovered:         ", np.asarray(inv.scene.c[0]))
    film.write_png(
        G.render_radiance(inv.scene, cam, key, cfg, w, h, li, spp=4),
        "inverse_recovered.png")


if __name__ == "__main__":
    main()
