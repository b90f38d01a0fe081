#!/usr/bin/env python
"""Many-sphere DIFFERENTIABLE fast path: complex.scn (783 spheres) with the
MXU-matmul intersection formulation (``scan_backend='mxu'``) vs the
reference-exact 'direct' one, forward AND fwd+bwd (the path the pallas
adjoint cannot take above its 64-sphere unroll cap).

Timing rules for the remote-TPU tunnel (CLAUDE.md): loops INSIDE one jit,
fresh time-salted key so the tunnel's memoization cannot fake a result.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_mxu_grad.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpu_bidirectional_raytracer_tpu import camera as cam_mod, rng  # noqa: E402
from gpu_bidirectional_raytracer_tpu.core.types import (  # noqa: E402
    Camera,
    IntegratorConfig,
)
from gpu_bidirectional_raytracer_tpu.integrators import (  # noqa: E402
    light_tracer,
    path_tracer,
)
from gpu_bidirectional_raytracer_tpu.integrators.direct import (  # noqa: E402
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene  # noqa: E402


def main() -> None:
    w, h = 512, 384
    fwd_iters = int(os.environ.get("BENCH_MXU_FWD_ITERS", "10"))
    bwd_iters = int(os.environ.get("BENCH_MXU_BWD_ITERS", "4"))
    here = os.path.dirname(os.path.abspath(__file__))
    orig, target, scene = load_scene(
        os.path.join(here, "..", "assets", "scenes", "complex.scn"))
    cfg = IntegratorConfig()  # bidirectional intent (use_vpl=True)
    cam = Camera.make(orig, target, w, h)
    li = static_light_indices(scene)
    n = w * h
    px, py = cam_mod.pixel_grid(w, h)
    salt = int(time.time())

    def one_render(sc, key, s, backend):
        u = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        vpls = light_tracer.trace_light_paths(sc, cfg, li, key, s)
        return path_tracer.trace(sc, cfg, li, rays, key, s, vpls=vpls,
                                 vlp_index=jnp.int32(0), remat=True,
                                 scan_backend=backend)

    def make_fwd(backend):
        @jax.jit
        def run(key):
            def one(s, acc):
                return acc + jnp.sum(one_render(scene, key, s, backend))
            return jax.lax.fori_loop(0, fwd_iters, one, jnp.float32(0))
        return run

    def make_bwd(backend):
        @jax.jit
        def run(key):
            def loss(sc, s):
                return jnp.mean(one_render(sc, key, s, backend) ** 2)

            def one(s, acc):
                g = jax.grad(loss, allow_int=True)(scene, s)
                return acc + jnp.sum(g.p) + jnp.sum(g.rad) + jnp.sum(g.c)
            return jax.lax.fori_loop(0, bwd_iters, one, jnp.float32(0))
        return run

    out = {"scene": "complex.scn", "spheres": int(scene.num_spheres),
           "resolution": f"{w}x{h}",
           "device": str(jax.devices()[0].device_kind)}
    for tag, maker, iters in (("fwd", make_fwd, fwd_iters),
                              ("fwd_bwd", make_bwd, bwd_iters)):
        for backend in ("xla", "mxu"):
            run = maker(backend)
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.key(salt)))
            compile_and_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.key(salt + 1)))
            dt = (time.perf_counter() - t0) / iters
            out[f"{tag}_{backend}_ms_per_sample"] = round(dt * 1e3, 2)
            out[f"{tag}_{backend}_first_s"] = round(compile_and_first, 1)
            print(json.dumps(out), flush=True)
    if out.get("fwd_bwd_xla_ms_per_sample"):
        out["fwd_bwd_speedup_mxu_vs_xla"] = round(
            out["fwd_bwd_xla_ms_per_sample"]
            / out["fwd_bwd_mxu_ms_per_sample"], 2)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
