#!/usr/bin/env python
"""Layout experiment: ray axis last ([S,N], [3,N]) vs ray axis first ([N,S])."""

import time

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import EPSILON
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.scene import builtin


def timeit(label, fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter() - t0) / iters * 1e3:8.3f} ms")


def distances_rays_last(px, py, pz, rad, ox, oy, oz, dx, dy, dz):
    """Same quadratic, arrays [S, N] — N in the lane axis."""
    opx = px[:, None] - ox[None, :]
    opy = py[:, None] - oy[None, :]
    opz = pz[:, None] - oz[None, :]
    b = opx * dx[None, :] + opy * dy[None, :] + opz * dz[None, :]
    opop = opx * opx + opy * opy + opz * opz
    det = b * b - opop + (rad * rad)[:, None]
    hit = det >= 0.0
    sq = jnp.where(hit, jnp.sqrt(jnp.where(hit, det, 1.0)), 0.0)
    t1 = b - sq
    t2 = b + sq
    t = jnp.where(t1 > EPSILON, t1, jnp.where(t2 > EPSILON, t2, 0.0))
    return jnp.where(hit, t, 0.0)


def main():
    n = 512 * 512
    scene = builtin.cornell_box()
    key = jax.random.key(0)
    o = jax.random.uniform(key, (n, 3), minval=5.0, maxval=90.0)
    d = jax.random.normal(jax.random.key(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def seven_nfirst(o, d):
        acc = jnp.float32(0)
        for _ in range(7):
            acc += isect.sphere_distances(scene, o, d).sum()
            o = o + 1e-6
        return acc

    timeit("intersect x7 [N,S] rays-first", seven_nfirst, o, d)

    p = scene.p
    comps = dict(px=p[:, 0], py=p[:, 1], pz=p[:, 2], rad=scene.rad)
    oT = o.T
    dT = d.T

    @jax.jit
    def seven_nlast(oT, dT):
        acc = jnp.float32(0)
        ox, oy, oz = oT
        dx, dy, dz = dT
        for _ in range(7):
            acc += distances_rays_last(comps["px"], comps["py"], comps["pz"],
                                       comps["rad"], ox, oy, oz,
                                       dx, dy, dz).sum()
            ox = ox + 1e-6
        return acc

    timeit("intersect x7 [S,N] rays-last", seven_nlast, oT, dT)

    # Transcendental probe: cos+sin at [N] scale
    u = jax.random.uniform(key, (n,))

    @jax.jit
    def trig7(u):
        acc = jnp.float32(0)
        for _ in range(7):
            acc += (jnp.cos(2 * jnp.pi * u) + jnp.sin(2 * jnp.pi * u)).sum()
            u = u + 1e-6
        return acc

    timeit("cos+sin x7 [N]", trig7, u)

    @jax.jit
    def sqrt_div7(u):
        acc = jnp.float32(0)
        for _ in range(7):
            acc += (jnp.sqrt(u) + 1.0 / (u + 1.0)).sum()
            u = u + 1e-6
        return acc

    timeit("sqrt+div x7 [N]", sqrt_div7, u)


if __name__ == "__main__":
    main()
