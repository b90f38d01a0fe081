"""Batched 3-vector algebra on ``[..., 3]`` arrays.

TPU-native replacement for the reference's ``Vec`` struct + macro algebra
(``include/vec.h:12-34``). Where the reference operates on one scalar Vec per
CUDA thread, every function here operates on arbitrarily batched arrays whose
trailing axis is xyz, so XLA sees large fusible elementwise ops (VPU) and
dot products that can be batched into MXU matmuls.

All functions are shape-polymorphic and dtype-preserving; the renderer uses
float32 throughout (Cornell-scale scenes use 1e4-radius wall spheres, far
outside bfloat16's mantissa for stable quadratic roots).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def dot(a: Array, b: Array) -> Array:
    """Batched dot product over the trailing xyz axis (``vec.h:21``)."""
    return jnp.sum(a * b, axis=-1)


def norm(v: Array, eps: float = 0.0) -> Array:
    """Normalize over the trailing axis (``vec.h:22``).

    ``vnorm`` in the reference divides by the exact length; ``eps`` may be used
    by callers that can see zero-length vectors under masking.
    """
    len_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.reciprocal(jnp.sqrt(len_sq) + eps)


def length(v: Array) -> Array:
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def cross(a: Array, b: Array) -> Array:
    """Cross product over the trailing axis (``vec.h:23``)."""
    return jnp.cross(a, b)


def max_component(v: Array) -> Array:
    """``vfilter`` (``vec.h:24``): the largest of x, y, z."""
    return jnp.max(v, axis=-1)


def is_zero(v: Array) -> Array:
    """``viszero`` (``vec.h:25``): all components exactly zero."""
    return jnp.all(v == 0.0, axis=-1)


def smul(k: Array, v: Array) -> Array:
    """Scalar (batched) times vector: ``vsmul`` (``vec.h:20``)."""
    return jnp.asarray(k)[..., None] * v


def reflect(d: Array, n: Array) -> Array:
    """Mirror direction: ``d - 2*(n.d)*n`` (``geomfunc.h:579-581``)."""
    return d - smul(2.0 * dot(n, d), n)


def gamma_to_byte(x: Array) -> Array:
    """``toInt`` (``vec.h:34``): clamp, gamma 1/2.2, scale to [0,255], round."""
    g = jnp.power(jnp.clip(x, 0.0, 1.0), 1.0 / 2.2)
    return (g * 255.0 + 0.5).astype(jnp.uint8)


def orthonormal_basis(w: Array) -> tuple[Array, Array]:
    """Build (u, v) completing unit normal ``w`` to a right-handed frame.

    Reproduces the reference's branch trick (``geomfunc.h:554-564``):
    pick helper a = (0,1,0) when |w.x| > 0.1 else (1,0,0); u = norm(a x w);
    v = w x u. Branch-free via where().
    """
    big_x = jnp.abs(w[..., 0]) > 0.1
    a = jnp.where(
        big_x[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=w.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=w.dtype),
    )
    u = norm(cross(a, w))
    v = cross(w, u)
    return u, v
