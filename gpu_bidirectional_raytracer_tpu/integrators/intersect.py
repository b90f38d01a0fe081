"""Vectorized ray-sphere intersection.

Re-derivation of the reference's quadratic solver + linear scans
(``geomfunc.h:31-150``, ``device.cu:80-154``) as all-pairs [N rays, S spheres]
batched math. TPU-first formulation: the two ray-sphere dot products are
decomposed so the cross terms become two ``[N,3] @ [3,S]`` matmuls that ride
the MXU —

    b    = op . d        = (p . d) - (o . d)         (p.d is a matmul)
    opop = |op|^2        = |p|^2 - 2 (o . p) + |o|^2 (o.p is a matmul)

with the remaining work elementwise on the VPU. The all-pairs min-reduce is
the same algorithm as the reference's per-thread scan (right for <=~800
spheres; complex.scn has 783) but with no divergence and full lane occupancy.

Semantics pinned to the reference:

- accept the smaller positive root if > EPSILON else the larger if > EPSILON
  else miss (``geomfunc.h:47-57``);
- nearest-hit strict '<' scan from i = S-1 down to 0 (``geomfunc.h:122-129``)
  — ties keep the higher index; we use argmin over distance which keeps the
  lower index, a measure-zero difference documented here;
- any-hit with max distance for shadow rays (``geomfunc.h:134-150``);
- "vacuum" any-hit that ignores emissive spheres so VPL shadow rays pass
  through lights (``device.cu:141-154``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core.types import EPSILON, Scene

_BIG = 1e20  # reference's 'inf' initializer (geomfunc.h:120)

# The FAR-endpoint relaxation of `soft_visibility` uses a NARROWER band
# than the silhouette relaxation: width = ENDPOINT_TAU_FRACTION * tau.
# Rationale (measured, round-3 sweep on the TestEndpointStraddle scene):
# the endpoint crossing is sampled densely — every shadow ray draws a
# fresh light-surface point, so maxt sweeps its span many times per
# pixel — while the silhouette band must bridge pixel-sparse coverage.
# The sigmoid-bandwidth bias is therefore avoidable here: carrier/FD
# ratio 2.36 (axial) / 1.92 (radius) at width tau=1, converging to
# 1.07 / 0.94 at tau/4 with no measurable variance penalty at spp=8.
# ops/pallas_grad.py mirrors this constant — keep in lockstep.
ENDPOINT_TAU_FRACTION = 0.25


def sphere_distances(scene: Scene, o: Array, d: Array,
                     eps: float = EPSILON, method: str = "direct") -> Array:
    """All-pairs hit distances ``[N, S]``; 0 where no hit (reference encoding).

    ``o``/``d``: ray origins/unit directions ``[N, 3]``.

    ``method='direct'`` evaluates ``op = p - o`` exactly as the reference
    quadratic does — bit-compatible with the golden model. ``method='mxu'``
    algebraically expands the two dot products so the cross terms become
    ``[N,3] @ [3,S]`` matmuls on the MXU; same roots to ~1e-3 absolute at
    Cornell scale (giant 1e4-radius wall spheres dominate the conditioning
    either way).
    """
    p, rad = scene.p, scene.rad
    if method == "mxu":
        p_dot_d = jnp.dot(d, p.T, preferred_element_type=jnp.float32)   # [N, S]
        o_dot_p = jnp.dot(o, p.T, preferred_element_type=jnp.float32)   # [N, S]
        o_dot_d = jnp.sum(o * d, axis=-1, keepdims=True)                # [N, 1]
        p_sq = jnp.sum(p * p, axis=-1)[None, :]                         # [1, S]
        o_sq = jnp.sum(o * o, axis=-1, keepdims=True)                   # [N, 1]
        b = p_dot_d - o_dot_d
        opop = p_sq - 2.0 * o_dot_p + o_sq
    else:
        op = p[None, :, :] - o[:, None, :]                              # [N, S, 3]
        b = jnp.sum(op * d[:, None, :], axis=-1)
        opop = jnp.sum(op * op, axis=-1)
    det = b * b - opop + (rad * rad)[None, :]

    hit = det >= 0.0
    # Two gradient guards on the root:
    # - double-where: sqrt'(0)=inf would leak NaN into missed pairs even
    #   though their primal is masked out;
    # - tangency clamp: rays grazing a sphere (det ~ 0+, ubiquitous when
    #   an optimizer drives spheres through each other) have unbounded
    #   d(sqrt det)/d(params); clamping det to >= 1e-6 bounds the gradient
    #   at the cost of ~1e-3 distance error exactly at tangency.
    sq = jnp.where(hit, jnp.sqrt(jnp.where(hit, jnp.maximum(det, 1e-6), 1.0)),
                   0.0)
    t1 = b - sq
    t2 = b + sq
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 0.0))
    return jnp.where(hit, t, 0.0)


def intersect(scene: Scene, o: Array, d: Array,
              method: str = "direct") -> tuple[Array, Array, Array]:
    """Nearest hit: returns ``(hit [N] bool, t [N], id [N] int32)``.

    Mirrors ``Intersect`` (``geomfunc.h:111-132``): nearest positive distance,
    miss when every sphere returns 0. ``method`` as in `sphere_distances`.
    """
    ts = sphere_distances(scene, o, d, method=method)
    masked = jnp.where(ts > 0.0, ts, _BIG)
    t = jnp.min(masked, axis=-1)
    idx = jnp.argmin(masked, axis=-1).astype(jnp.int32)
    return t < _BIG, t, idx


def intersect_p(scene: Scene, o: Array, d: Array, maxt: Array,
                method: str = "direct") -> Array:
    """Any-hit within ``maxt`` (``geomfunc.h:134-150``). ``maxt``: [N]."""
    ts = sphere_distances(scene, o, d, method=method)
    return jnp.any((ts > 0.0) & (ts < maxt[:, None]), axis=-1)


def gather_sphere_attrs(scene: Scene, hit_id: Array, with_rad: bool = False):
    """Per-lane sphere attributes ``(p, e, c, refl[, rad])`` for ``hit_id [N]``.

    TPU idiom: a dynamic gather of N indices from a tiny table lowers to a
    slow serial gather; a one-hot ``[N,S] @ [S,10]`` matmul rides the MXU
    instead (~12x faster at 1M lanes, measured) and its backward pass is a
    matmul too (scene-parameter gradients become ``one_hot^T @ cotangent``
    rather than a scatter-add).

    ``with_rad=True`` additionally returns the hit sphere's radius — used
    by the aux-conditioned differentiable re-walk (`path_tracer.trace` with
    ``aux``), which re-derives the hit distance from the gathered sphere
    instead of running the O(S) nearest-hit scan.
    """
    oh = jax.nn.one_hot(hit_id, scene.num_spheres, dtype=jnp.float32)
    cols = [scene.p, scene.e, scene.c,
            scene.refl.astype(jnp.float32)[:, None]]
    if with_rad:
        cols.append(scene.rad[:, None])
    table = jnp.concatenate(cols, axis=1)                    # [S, 10 or 11]
    vals = jnp.dot(oh, table, preferred_element_type=jnp.float32)
    p, e, c = vals[:, 0:3], vals[:, 3:6], vals[:, 6:9]
    refl = jnp.round(vals[:, 9]).astype(jnp.int32)
    if with_rad:
        return p, e, c, refl, vals[:, 10]
    return p, e, c, refl


def sphere_root(o: Array, d: Array, p: Array, rad: Array,
                eps: float = EPSILON) -> Array:
    """Hit distance of ONE sphere per lane: ``o, d, p [N,3]``, ``rad [N]``.

    The same quadratic, root choice, double-where sqrt guard, and tangency
    clamp as `sphere_distances(method='direct')`, so given the (detached)
    winning sphere of a nearest-hit scan this reproduces the scan's ``t``
    bitwise — the differentiable O(N) replacement for the O(N*S) scan when
    the hit id is already known (`path_tracer.trace` with ``aux``).
    Returns 0 where the sphere is missed (reference encoding).
    """
    op = p - o
    b = jnp.sum(op * d, axis=-1)
    det = b * b - jnp.sum(op * op, axis=-1) + rad * rad
    hit = det >= 0.0
    sq = jnp.where(hit, jnp.sqrt(jnp.where(hit, jnp.maximum(det, 1e-6), 1.0)),
                   0.0)
    t1 = b - sq
    t2 = b + sq
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 0.0))
    return jnp.where(hit, t, 0.0)


def intersect_p_vacuum(scene: Scene, o: Array, d: Array, maxt: Array,
                       method: str = "direct") -> Array:
    """Any-hit ignoring emissive spheres (``device.cu:141-154``)."""
    ts = sphere_distances(scene, o, d, method=method)
    blocker = jnp.logical_not(scene.is_light())[None, :]
    return jnp.any((ts > 0.0) & (ts < maxt[:, None]) & blocker, axis=-1)


def soft_visibility(scene: Scene, o: Array, d: Array, maxt: Array,
                    tau: float, vacuum: bool = False,
                    exclude_id: Array | None = None) -> Array:
    """Relaxed visibility of the shadow segments ``(o, d, maxt)`` — the
    backward half of the straight-through visibility-gradient estimator
    (``IntegratorConfig.vis_grad_tau``; callers combine it as
    ``hard + soft - stop_gradient(soft)``, so this VALUE never reaches the
    image, only its linearization does).

    Per blocker sphere TWO discontinuities are relaxed (round 3 added the
    second — the "two-sided shadow endpoint"):

    - the silhouette direction: ``sigma(det / (tau * r_s))`` — ``det`` is
      the ray-sphere discriminant (``geomfunc.h:31-58``), a polynomial in
      ray and sphere parameters (no sqrt, so no guard needed), and the
      ``tau * r_s`` normalization makes the smoothing width ~``tau/2``
      scene units for every sphere size (``d det / d perp-distance =
      -2 r`` at the edge);
    - the FAR segment endpoint: ``sigma((maxt - t1) / tau)`` with
      ``t1 = b - sqrt(det)`` the chord entry — a blocker whose chord
      straddles the segment end (e.g. a sphere just beyond the light, or
      the light pulling the endpoint across a blocker) previously sat on
      a HARD, stop-gradiented ``b < maxt`` gate, so its motion along the
      segment carried no gradient (one-sided, VERDICT r2 weak#6).
      Differentiating through ``maxt`` also gives the LIGHT/VPL position
      its endpoint-crossing gradient. At silhouettes (``t1 -> b``) this
      factor smoothly recovers the old mid-chord test. The endpoint
      width is ``ENDPOINT_TAU_FRACTION * tau`` SCENE UNITS (no ``r_s``
      factor — ``t1`` crossing ``maxt`` is a length-space event whose
      rate is 1, unlike ``det`` whose silhouette rate is ``2 r_s``; with
      the shared ``tau * r_s`` width a mid-segment big blocker saw a
      not-yet-saturated sigmoid and its radius gradient distorted ~25%,
      measured). The fraction kills the sigmoid-bandwidth overshoot the
      full-``tau`` width had (carrier/FD 2.4 -> 1.07 axial; see the
      constant's derivation note) — affordable because the endpoint
      event is densely sampled by the light-UV tape.

    The near condition stays HARD via stop-gradiented ``b > EPSILON``: it
    rejects the self-intersection case (a vertex's own sphere has
    ``b <= 0`` for outgoing rays), the one remaining one-sided edge —
    documented, not relaxed, because softening it re-introduces
    self-shadowing gradients through the vertex's own sphere.
    ``vacuum=True`` mirrors `intersect_p_vacuum`: emissive spheres never
    block. ``exclude_id [N]``: sphere index excluded per segment — the
    NEE TARGET light, whose chord entry IS the sample point
    (``t1 = maxt + EPSILON``): the hard test's EPSILON margin rejects it
    exactly, but the endpoint sigmoid would smear it into a spurious
    half-block of every shadow ray (a convex target can never truly
    occlude the segment to its own facing sample).

    Returns ``prod_s (1 - blocked_s)`` in ``[0, 1]``, shape ``[N]``.
    The hand-written pallas adjoint (`ops.pallas_grad._bwd_kernel`)
    mirrors this function's exact linearization — keep them in lockstep
    (parity asserted in tests/test_pallas_grad.py).
    """
    p, rad = scene.p, scene.rad
    op = p[None, :, :] - o[:, None, :]                              # [N, S, 3]
    b = jnp.sum(op * d[:, None, :], axis=-1)                        # [N, S]
    opop = jnp.sum(op * op, axis=-1)
    det = b * b - opop + (rad * rad)[None, :]
    width = jax.lax.stop_gradient(jnp.maximum(tau * rad, 1e-6))[None, :]
    edge = jax.nn.sigmoid(det / width)
    # Clamped root: max() both keeps the value finite off the chord
    # (edge ~ 0 there anyway) and builds in the tangency gradient clamp
    # (d sqrt(max(det, 1e-6)) vanishes for det <= 1e-6) — the same
    # bound as sphere_distances' root.
    t1 = b - jnp.sqrt(jnp.maximum(det, 1e-6))
    endpoint = jax.nn.sigmoid((maxt[:, None] - t1)
                              / max(ENDPOINT_TAU_FRACTION * tau, 1e-6))
    gate = jax.lax.stop_gradient(b > EPSILON).astype(o.dtype)
    blocked = edge * endpoint * gate
    if exclude_id is not None:
        keep = jnp.arange(scene.num_spheres)[None, :] != exclude_id[:, None]
        blocked = blocked * keep.astype(o.dtype)
    if vacuum:
        blocked = blocked * jnp.logical_not(
            scene.is_light())[None, :].astype(o.dtype)
    return jnp.prod(1.0 - blocked, axis=-1)
