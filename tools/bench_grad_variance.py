#!/usr/bin/env python
"""Gradient-variance comparison: bidirectional (VPL) vs unidirectional.

Quantifies the default-estimator choice in `diff/gradients.py`
(`render_radiance` docstring): across independent random tapes, how noisy
is d(loss)/d(param) under each estimator at equal sample count, and at
(approximately) equal wall-clock?

The VPL estimator shares each light subpath across every pixel, so its
gradient noise is CORRELATED across the frame — the mean-over-pixels loss
cannot average it away the way it averages independent per-pixel NEE
noise. This script measures that directly; run on TPU for the wall-clock
column, any platform for the variance columns.

Usage: python tools/bench_grad_variance.py [n_seeds] [width height spp]
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import (
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.scene import builtin


def grad_stats(scene, cam, cfg, li, w, h, spp, n_seeds):
    """Mean/std over independent tapes of d(sum image)/d(ground albedo),
    plus sustained per-grad wall-clock.

    The image-sum gradient (not a loss vs a target) keeps the two
    estimators comparable: both estimate the same d(radiance)/d(albedo),
    so mean agreement + std spread isolates estimator NOISE from estimator
    gain/bias differences.
    """

    def scalar(sc, key):
        return jnp.sum(G.render_radiance(sc, cam, key, cfg, w, h, li, spp))

    gfn = jax.jit(jax.grad(scalar, allow_int=True))
    gs = []
    jax.block_until_ready(gfn(scene, jax.random.key(0)).c)  # compile
    t0 = time.perf_counter()
    for i in range(n_seeds):
        key = jax.random.fold_in(jax.random.key(7), i)
        gs.append(np.asarray(gfn(scene, key).c[0]))
    dt = (time.perf_counter() - t0) / n_seeds
    gs = np.stack(gs)
    return {
        "grad_mean": float(gs.mean()),
        "grad_std": float(gs.std(axis=0).mean()),
        "ms_per_grad": dt * 1e3,
    }


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    scene = builtin.cornell_box()
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    li = static_light_indices(scene)

    # Matched gains (GPU intent): the ONLY difference is the estimator.
    uni = IntegratorConfig(use_vpl=False, combine_half=False)
    bi = IntegratorConfig()  # use_vpl=True, (direct+vpl)/2

    out = {
        "config": {"w": w, "h": h, "spp": spp, "n_seeds": n_seeds,
                   "platform": jax.default_backend()},
        "unidirectional": grad_stats(scene, cam, uni, li, w, h,
                                     spp, n_seeds),
        "bidirectional_vpl": grad_stats(scene, cam, bi, li, w, h,
                                        spp, n_seeds),
    }
    u, b = out["unidirectional"], out["bidirectional_vpl"]
    out["vpl_grad_std_ratio"] = (b["grad_std"] / u["grad_std"]
                                 if u["grad_std"] else float("inf"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
