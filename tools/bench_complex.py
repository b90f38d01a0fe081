#!/usr/bin/env python
"""Many-sphere fast-path benchmark: complex.scn (783 spheres, complex.scn:2)
with the per-bounce pallas scan kernels vs the all-pairs XLA tracer
(VERDICT r1 weak#7 — done = >=2x on TPU).

Measurement notes for this environment (remote-TPU tunnel):
- iterations run INSIDE one jit (`lax.fori_loop` over samples) — per-call
  host dispatches cost a full tunnel RTT (~90ms) and swamp compute;
- a fresh time-salted key defeats the tunnel's memoization of repeated
  identical computations (observed: re-running an identical pass chain
  reports ~0.1ms/pass).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_complex.py
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
    iters = int(os.environ.get("BENCH_COMPLEX_ITERS", "10"))
    here = os.path.dirname(os.path.abspath(__file__))
    orig, target, scene = load_scene(
        os.path.join(here, "..", "assets", "scenes", "complex.scn"))
    cfg = IntegratorConfig()  # bidirectional intent (use_vpl=True)
    cam = Camera.make(orig, target, w, h)
    li = static_light_indices(scene)
    n = w * h
    px, py = cam_mod.pixel_grid(w, h)
    salt = int(time.time())

    def make(backend: str):
        @jax.jit
        def run(key):
            def one(s, acc):
                u = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n)
                rays = cam_mod.primary_rays(cam, w, h, u[0], u[1], px, py)
                vpls = light_tracer.trace_light_paths(scene, cfg, li, key, s)
                if backend == "bounce":
                    from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce \
                        import trace_pallas_bounce

                    r = trace_pallas_bounce(scene, cfg, li, rays, key, s,
                                            vpls=vpls,
                                            vlp_index=jnp.int32(0),
                                            frame_dims=(w, h))
                else:
                    r = path_tracer.trace(scene, cfg, li, rays, key, s,
                                          vpls=vpls, vlp_index=jnp.int32(0),
                                          scan_backend=backend)
                return acc + jnp.sum(r)
            return jax.lax.fori_loop(0, iters, one, jnp.float32(0))
        return run

    out = {"scene": "complex.scn", "spheres": int(scene.num_spheres),
           "resolution": f"{w}x{h}",
           "device": str(jax.devices()[0].device_kind)}
    for label, backend in (("xla_ms_per_sample", "xla"),
                           ("scan_ms_per_sample", "pallas"),
                           ("pallas_ms_per_sample", "bounce")):
        run = make(backend)
        r = run(jax.random.key(salt))
        jax.block_until_ready(r)
        t0 = time.time()
        r = run(jax.random.key(salt + 9999))
        jax.block_until_ready(r)
        out[label] = round((time.time() - t0) / iters * 1e3, 2)
    out["speedup"] = round(out["xla_ms_per_sample"]
                           / out["pallas_ms_per_sample"], 2)
    out["mrays_s_pallas"] = round(n / out["pallas_ms_per_sample"] / 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
