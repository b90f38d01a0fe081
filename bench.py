#!/usr/bin/env python
"""Benchmark: rays/sec/chip on cornell.scn (BASELINE.md metric).

Times the differentiable forward+backward render step (the framework's
"training step") and the forward-only progressive pass on the Cornell box.
Prints ONE JSON line with the headline metric. The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is reported against 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the TPU tunnel's remote compiles are
# minutes-long; cached executables make repeat bench runs seconds-long.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _sustained(step_fn, state, passes=32):
    """Chained progressive passes, one block at the end — the serving-mode
    throughput (per-pass dispatch latency amortizes away)."""
    state = jax.block_until_ready(step_fn(state))  # warm
    t0 = time.perf_counter()
    for _ in range(passes):
        state = step_fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / passes


def main() -> None:
    width = int(os.environ.get("BENCH_WIDTH", "512"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))

    from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
    from gpu_bidirectional_raytracer_tpu.diff import gradients as G
    from gpu_bidirectional_raytracer_tpu.integrators.direct import (
        static_light_indices,
    )
    from gpu_bidirectional_raytracer_tpu.render.progressive import (
        init_state,
        render_pass,
    )
    from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

    scn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "assets", "scenes", "cornell.scn")
    orig, target, scene = load_scene(scn)
    cfg = IntegratorConfig()
    cam = Camera.make(orig, target, width, height)
    light_idx = static_light_indices(scene)
    key = jax.random.key(0)
    n_rays = width * height

    # Forward-only progressive pass (the reference's eye-pass meter,
    # smallpt_cpu.c:284-287, was width*height / pass-time).
    state = init_state(width, height, cfg)

    # Two compiles total (remote TPU compiles are minutes each): the
    # pallas-backed pass (auto-falls back to XLA above 64 spheres) and the
    # training step. Set BENCH_XLA_FWD=1 for the extra XLA-only timing.
    def fwd(state):
        return render_pass(scene, cam, state, cfg, width, height, light_idx)

    def fwd_pallas(state):
        return render_pass(scene, cam, state, cfg, width, height, light_idx,
                           False, "pallas")

    try:
        t_fwd_pl = _timeit(fwd_pallas, state)
        t_sustained = _sustained(fwd_pallas, state)
    except Exception:
        t_fwd_pl = None
        t_sustained = _sustained(fwd, state)
    t_fwd = _timeit(fwd, state) if os.environ.get("BENCH_XLA_FWD") else None

    # Forward+backward training step.
    cfg_d = IntegratorConfig.cpu_golden()
    tgt = jnp.zeros((height, width, 3), jnp.float32)

    def fwd_bwd():
        return G.render_loss_grad(scene, cam, key, tgt, cfg_d,
                                  width, height, light_idx, 1)

    t_fb = _timeit(fwd_bwd)

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_fwd_bwd_cornell",
        "value": round(n_rays / t_fb, 1),
        "unit": "rays/s",
        "vs_baseline": 1.0,
        "extra": {
            "rays_per_sec_fwd": (
                round(n_rays / t_fwd, 1) if t_fwd else None),
            "rays_per_sec_fwd_pallas": (
                round(n_rays / t_fwd_pl, 1) if t_fwd_pl else None),
            "pass_ms_fwd": round(t_fwd * 1e3, 3) if t_fwd else None,
            "pass_ms_fwd_pallas": (
                round(t_fwd_pl * 1e3, 3) if t_fwd_pl else None),
            "rays_per_sec_sustained": round(n_rays / t_sustained, 1),
            "pass_ms_sustained": round(t_sustained * 1e3, 3),
            "pass_ms_fwd_bwd": round(t_fb * 1e3, 3),
            "resolution": f"{width}x{height}",
            "device": str(dev.device_kind),
            "platform": dev.platform,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
