"""Sampling primitives: uniform sphere and cosine-weighted hemisphere.

Re-derivations of the reference's inline sampling code
(``geomfunc.h:81-89`` uniform sphere; the ONB + cosine scatter inlined at
every diffuse bounce, ``geomfunc.h:546-571``), batched over ray lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm


def uniform_sphere(u1: Array, u2: Array) -> Array:
    """Uniform point on the unit sphere from two uniforms ``[N] -> [N,3]``.

    Matches ``UniformSampleSphere`` (``geomfunc.h:81-89``):
    z = 1-2u1; r = sqrt(max(0, 1-z^2)); phi = 2 pi u2.
    """
    zz = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), zz], axis=-1)


def cosine_hemisphere(nl: Array, u1: Array, u2: Array) -> Array:
    """Cosine-weighted direction about unit normal ``nl [N,3]``.

    Matches the inlined scatter (``geomfunc.h:546-571``):
    r1 = 2 pi u1; r2 = u2; dir = u cos(r1) sqrt(r2) + v sin(r1) sqrt(r2)
    + w sqrt(1-r2), with (u, v) from the |w.x|>0.1 ONB trick.
    """
    r1 = 2.0 * jnp.pi * u1
    r2s = jnp.sqrt(u2)
    u, v = vm.orthonormal_basis(nl)
    return (vm.smul(jnp.cos(r1) * r2s, u)
            + vm.smul(jnp.sin(r1) * r2s, v)
            + vm.smul(jnp.sqrt(1.0 - u2), nl))
