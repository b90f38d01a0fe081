#!/usr/bin/env python
"""Component-level timing on the real chip: locate the hot spots."""

import time

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod, rng
from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.integrators import path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene import builtin


def timeit(label, fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    n = 512 * 512
    scene = builtin.cornell_box()
    cfg = IntegratorConfig()
    li = static_light_indices(scene)
    key = jax.random.key(0)
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, 512, 512)
    px, py = cam_mod.pixel_grid(512, 512)
    u = rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n)
    rays = jax.block_until_ready(
        jax.jit(cam_mod.primary_rays, static_argnums=(1, 2))(
            cam, 512, 512, u[0], u[1], px, py))

    # 1. RNG: all draw sites of one pass (7 depths x (2L+3) + 2 cam)
    @jax.jit
    def all_rng(key):
        tot = jnp.float32(0)
        tot += rng.site_uniforms(key, 0, 0, rng.CAM_JITTER, 2, n).sum()
        for d in range(7):
            tot += rng.site_uniforms(key, 0, d, rng.LIGHT_UV, 2, n).sum()
            tot += rng.site_uniforms(key, 0, d, rng.DIFF_UV, 2, n).sum()
            tot += rng.site_uniforms(key, 0, d, rng.REFR_RR, 1, n).sum()
        return tot

    timeit("rng all sites (1 pass)", all_rng, key)

    # 2. intersect x7 (direct + mxu)
    for method in ("direct", "mxu"):
        @jax.jit
        def seven_isect(o, d, method=method):
            acc = jnp.float32(0)
            for _ in range(7):
                ts = isect.sphere_distances(scene, o, d, method=method)
                acc += ts.sum()
                o = o + 1e-6  # defeat CSE
            return acc

        timeit(f"intersect x7 ({method})", seven_isect, rays.o, rays.d)

    # 3. full eye trace (no vpl)
    @jax.jit
    def full_trace(rays):
        return path_tracer.trace(scene, IntegratorConfig.cpu_golden(), li,
                                 rays, key, jnp.int32(0))

    timeit("full trace (7 depths, NEE)", full_trace, rays)

    # 4. trace without NEE? approximate: direct_only=False but depth=1
    @jax.jit
    def trace_d1(rays):
        cfg1 = IntegratorConfig(max_depth=1, use_vpl=False)
        return path_tracer.trace(scene, cfg1, li, rays, key, jnp.int32(0))

    timeit("trace depth=1", trace_d1, rays)


if __name__ == "__main__":
    main()
