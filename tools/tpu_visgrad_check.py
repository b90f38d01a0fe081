#!/usr/bin/env python
"""Real-TPU check of the pallas visibility-gradient adjoint.

Compiles and times the bidirectional fwd+bwd training step with
``vis_grad_tau=2.0`` on cornell 512x512, pallas vs XLA backend, and
sanity-checks the gradients (finite, nonzero geometry signal). The
kernel parity itself is proven CPU-side (tests/test_pallas_grad.py);
this script proves the Mosaic lowering and measures the speedup the
carrier support buys (before it, vis-grad training was XLA-only).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    orig, look, scene = load_scene(
        os.path.join(ROOT, "assets", "scenes", "cornell.scn"))
    w, h = 512, 512
    cfg = dataclasses.replace(IntegratorConfig(), vis_grad_tau=2.0)
    cam = Camera.make(orig, look, w, h)
    li = static_light_indices(scene)
    tgt = jnp.zeros((h, w, 3), jnp.float32)

    def fb(backend, i):
        # Salted key per call: identical dispatches are memoized
        # server-side over the tunnel (CLAUDE.md timing rules).
        key = jax.random.fold_in(jax.random.key(0), i)
        return G.render_loss_grad(scene, cam, key, tgt, cfg, w, h, li, 1,
                                  backend=backend)

    out = {}
    for be in ("pallas", "xla"):
        t0 = time.perf_counter()
        loss, grads = fb(be, 0)
        jax.block_until_ready(loss)
        out[f"{be}_compile_s"] = round(time.perf_counter() - t0, 1)
        gp = np.asarray(grads.p)
        assert np.isfinite(gp).all(), be
        assert np.abs(gp).max() > 0, be
        for i in (1, 2):      # warmup, salted
            jax.block_until_ready(fb(be, i)[0])
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            loss, grads = fb(be, 10 + i)
        jax.block_until_ready(loss)
        out[f"{be}_fwd_bwd_ms"] = round(
            (time.perf_counter() - t0) / iters * 1e3, 2)
        out[f"{be}_grad_p_norm"] = float(np.linalg.norm(np.asarray(grads.p)))
    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
