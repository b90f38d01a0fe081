"""Masked-lane material scatter: DIFF / SPEC / REFR in one branch-free step.

Re-derivation of the material branches duplicated across all four reference
integrators (``geomfunc.h:535-642``, ``device.cu:663-770``): ideal diffuse
(cosine hemisphere), ideal mirror, and Fresnel dielectric (n=1.5) with
Russian-roulette reflect/refract. Where a CUDA thread takes one divergent
branch, every lane here evaluates all three cheaply and selects by material
code — the SIMT-friendly shape the reference was already reaching for when
it removed Russian-roulette path termination (``device.cu:276``).

All square roots and divisions are where-guarded so gradients stay finite on
masked lanes (the "double-where" rule).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
from gpu_bidirectional_raytracer_tpu.core.types import DIFF, REFR, SPEC
from gpu_bidirectional_raytracer_tpu.integrators.sampling import cosine_hemisphere

_NC = 1.0   # exterior IOR (geomfunc.h:597)
_NT = 1.5   # glass IOR (geomfunc.h:598)


class Scatter(NamedTuple):
    new_d: Array      # [N, 3] continuation direction
    tp_mul: Array     # [N, 3] throughput multiplier (albedo x RR weights)
    specular: Array   # [N] bool — next-segment specular flag


def _safe_sqrt(x: Array) -> Array:
    # Double-where keeps sqrt gradients finite at/below zero.
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def scatter(refl: Array, albedo: Array, d: Array, normal: Array, nl: Array,
            u_diff1: Array, u_diff2: Array, u_rr: Array,
            with_bits: bool = False):
    """One material interaction for every lane.

    ``refl [N]`` material codes; ``albedo [N,3]``; ``d [N,3]`` incoming unit
    direction; ``normal`` geometric unit normal; ``nl`` shading normal
    (flipped toward the incoming side); uniforms as documented in `rng`.

    ``with_bits=True`` additionally returns an ``[N] int32`` bitmask of
    the DISCRETE branch choices (bit0 = total internal reflection, bit1 =
    Fresnel-RR took reflection) — the remaining per-bounce decisions a
    cross-backend flip census must observe next to hit ids and occlusion
    (tools/northstar.py --leg classify).
    """
    # -- DIFF: cosine-weighted hemisphere about nl (geomfunc.h:546-571)
    diff_dir = cosine_hemisphere(nl, u_diff1, u_diff2)

    # -- SPEC: mirror about the geometric normal (geomfunc.h:578-581)
    spec_dir = vm.reflect(d, normal)

    # -- REFR: Fresnel dielectric with RR (geomfunc.h:587-641)
    into = vm.dot(normal, nl) > 0.0
    nnt = jnp.where(into, _NC / _NT, _NT / _NC)
    ddn = vm.dot(d, nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0

    kk = jnp.where(into, 1.0, -1.0) * (ddn * nnt + _safe_sqrt(cos2t))
    trans_dir = vm.norm(vm.smul(nnt, d) - vm.smul(kk, normal))

    r0 = ((_NT - _NC) / (_NT + _NC)) ** 2
    c1 = 1.0 - jnp.where(into, -ddn, vm.dot(trans_dir, normal))
    re = r0 + (1.0 - r0) * c1 ** 5
    tr = 1.0 - re
    p = 0.25 + 0.5 * re
    rp = re / p
    tp = tr / (1.0 - p)

    take_refl = tir | (u_rr < p)
    refr_dir = jnp.where(take_refl[:, None], spec_dir, trans_dir)
    rr_w = jnp.where(tir, 1.0, jnp.where(u_rr < p, rp, tp))

    # -- select by material code
    is_diff = (refl == DIFF)[:, None]
    is_spec = (refl == SPEC)[:, None]
    new_d = jnp.where(is_diff, diff_dir, jnp.where(is_spec, spec_dir, refr_dir))
    tp_mul = albedo * jnp.where(is_diff | is_spec, 1.0, rr_w[:, None])
    specular = refl != DIFF
    sc = Scatter(new_d=new_d, tp_mul=tp_mul, specular=specular)
    if with_bits:
        bits = tir.astype(jnp.int32) | (take_refl.astype(jnp.int32) << 1)
        return sc, bits
    return sc
