#!/usr/bin/env python
"""Many-sphere DIFFERENTIABLE fast path, round 3: complex.scn (783
spheres) fwd+bwd with the facts+re-walk hybrid
(`ops.pallas_bounce_grad.trace_bounce_diff`) vs the XLA-remat fallback
that was the round-2 bound (221.6 ms/sample, tools/bench_mxu_grad.py).

Timing rules for the remote-TPU tunnel (CLAUDE.md): loops INSIDE one jit,
fresh time-salted key so the tunnel's memoization cannot fake a result.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_bounce_grad.py
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
from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce_grad import (  # noqa: E402
    trace_bounce_diff,
)
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene  # noqa: E402


def main() -> None:
    w, h = 512, 384
    bwd_iters = int(os.environ.get("BENCH_BG_BWD_ITERS", "4"))
    here = os.path.dirname(os.path.abspath(__file__))
    orig, target, scene = load_scene(
        os.path.join(here, "..", "assets", "scenes", "complex.scn"))
    cfg = IntegratorConfig()  # bidirectional intent (use_vpl=True)
    cam = Camera.make(orig, target, w, h)
    li = static_light_indices(scene)
    n = w * h
    px, py = cam_mod.pixel_grid(w, h)
    salt = int(time.time())
    print(f"complex.scn S={scene.num_spheres} {w}x{h} "
          f"bwd_iters={bwd_iters} salt={salt}", flush=True)

    def one_render(sc, key, s, kind):
        u = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n)
        rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
        vpls = light_tracer.trace_light_paths(sc, cfg, li, key, s)
        if kind == "hybrid":
            return trace_bounce_diff(sc, cfg, li, rays, key, s, vpls=vpls,
                                     vlp_index=jnp.int32(0))
        return path_tracer.trace(sc, cfg, li, rays, key, s, vpls=vpls,
                                 vlp_index=jnp.int32(0), remat=True)

    def make_bwd(kind):
        @jax.jit
        def run(key, n):
            def loss(sc, s):
                return jnp.mean(one_render(sc, key, s, kind) ** 2)

            def one(s, acc):
                g = jax.grad(loss, allow_int=True)(scene, s)
                return acc + jnp.sum(g.p) + jnp.sum(g.rad) + jnp.sum(g.c)
            return jax.lax.fori_loop(0, n, one, jnp.float32(0))
        return run

    def time_it(label, fn):
        # Differenced trip counts (dynamic n, one compile): the dispatch
        # RTT is common to both calls and cancels — a single timed call
        # of k iterations reports t + RTT/k (~20% high at k=4).
        n_s, n_l = bwd_iters, 3 * bwd_iters
        k = jax.random.key(salt)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k, jnp.int32(1)))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for r in range(2):
            k = jax.random.key(salt + 1 + r)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(k, jnp.int32(n_s)))
            t1 = time.perf_counter()
            jax.block_until_ready(fn(k, jnp.int32(n_l)))
            t2 = time.perf_counter()
            d = ((t2 - t1) - (t1 - t0)) / (n_l - n_s)
            if d > 0.0:  # nonpositive delta = tunnel noise (ADVICE r3)
                best = min(best, d)
        if best == float("inf"):
            raise RuntimeError("all timing reps nonpositive (tunnel noise)")
        print(f"{label}: {best * 1e3:.1f} ms/sample "
              f"(compile {compile_s:.0f}s)", flush=True)
        return best

    t_hybrid = time_it("fwd+bwd hybrid (pallas facts + re-walk)",
                       make_bwd("hybrid"))
    t_xla = (time_it("fwd+bwd XLA-remat", make_bwd("xla"))
             if os.environ.get("BENCH_BG_SKIP_XLA") != "1" else None)

    out = {
        "scene": "complex.scn",
        "spheres": int(scene.num_spheres),
        "resolution": f"{w}x{h}",
        "fwd_bwd_ms_hybrid": round(t_hybrid * 1e3, 1),
        "fwd_bwd_ms_xla_remat": (round(t_xla * 1e3, 1) if t_xla else None),
        "speedup": (round(t_xla / t_hybrid, 2) if t_xla else None),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(here, "..", "artifacts", "BOUNCE_GRAD.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
