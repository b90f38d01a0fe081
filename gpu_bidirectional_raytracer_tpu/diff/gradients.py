"""Differentiable rendering: gradients of images w.r.t. scene parameters.

This is the upgrade of the reference's interactive sphere-editing loop
(``display_func.c:347-369`` moves spheres by keypress and restarts the
render, ``ReInitScene``): instead of keys, `render_grad` returns
d(loss)/d(sphere position/radius/emission/albedo), and `InverseRenderer`
runs gradient descent against a target image.

Differentiation policy (SURVEY.md "Hard parts" #2):

- **Discrete structure is stopped.** Hit ids (argmin), material masks,
  hemisphere-facing tests, occlusion booleans, and Fresnel RR branch
  choices carry no gradient. This is the standard detached/reparameterized
  path-gradient estimator: it differentiates shading, distances, and
  throughput along the *fixed* path structure and ignores the motion of
  visibility discontinuities — biased at silhouettes, convergent for
  interior shading, and validated here by finite differences.
- **Hit distances are differentiable.** ``t`` flows through the quadratic
  root of the (stopped) hit sphere, so hit points move with sphere
  position/radius — the reparameterization that makes shadow/shading
  terms respond to geometry.
- **Safe-math guards** (double-where on every sqrt/div, tangency-clamped
  discriminants) keep the backward pass NaN-free on masked lanes and
  bounded at grazing geometry.

Known estimator limits (measured, see tests):
- Albedo / emission / IOR-free shading parameters: gradients match finite
  differences tightly; recovery converges (test_albedo_recovery_descends).
- Geometry parameters (position/radius): interior-shading terms are
  correct (FD-validated). Cast-shadow motion carries gradient when
  ``cfg.vis_grad_tau > 0``: NEE/VPL shadow terms multiply in a
  straight-through relaxed-visibility carrier (`intersect.soft_visibility`)
  whose primal is exactly zero (images unchanged up to XLA re-fusion,
  <= 1 ulp) and whose backward is a sigmoid of each blocker's
  discriminant — so an
  occluder or light position can be fitted against a shadow-dominated
  target (tests/test_visibility_grad.py). PRIMARY hit silhouettes (the
  bounce-0 argmin hit id) AND mirror-seen silhouettes (one specular
  bounce) carry gradient when ``cfg.sil_grad_tau > 0`` via the
  zero-primal coverage carrier `_silhouette_carrier` (applied outside
  the tracer, so it composes with the pallas adjoint); the carrier
  follows SPECULAR chains up to ``cfg.sil_spec_depth`` bounces —
  mirror reflections AND dielectric refractions (a sphere seen through
  a glass lens carries coverage gradient, round 4), plus the
  Fresnel-REFLECTED branch spawned at the primary glass hit (a sphere
  seen only MIRRORED in a glass ball, round 5 — single bounce, weight
  stop(Re); residual bound in artifacts/REFR_REFLECT_BIAS.json).
  Remaining zero-gradient structure: diffuse-bounce (truly indirect)
  silhouettes, higher-order sampled-field structure at glass (RR path
  population, two-interface caustics), and the hard near-endpoint
  self-intersection gate of shadow segments (the far endpoint is
  relaxed two-sidedly by `intersect.soft_visibility`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from gpu_bidirectional_raytracer_tpu import camera as cam_mod
from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Scene,
)
from gpu_bidirectional_raytracer_tpu.integrators import direct as nee
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.integrators import path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices

_BIG = 1e20


def _silhouette_carrier(scene: Scene, cfg: IntegratorConfig,
                        light_idx: tuple[int, ...], o: Array, d: Array,
                        rad: Array, key: Array, sample: Array,
                        lane_offset=None,
                        lane_total: int | None = None) -> Array:
    """Zero-primal straight-through primary-silhouette carrier ``[N, 3]``.

    The remaining zero-gradient structure after ``vis_grad_tau`` (cast
    shadows) is the argmin hit id itself: a sphere's visible silhouette
    sweeping across pixels as its position/radius changes. This relaxes
    the PRIMARY hit's pixel coverage the same way
    `intersect.soft_visibility` relaxes occlusion — the primal image is
    untouched (the returned term is exactly ``x - stop_gradient(x) = 0``)
    and the backward pass sees

        d pixel = stop(L_fg - L_bg) * d sigmoid(det_hit / (tau * r_hit))

    with ``det_hit`` the hit sphere's ray discriminant (silhouette-only
    relaxation: ``d det / d perpendicular-distance = -2 r`` at the edge,
    so ``tau`` is ~scene units for every sphere size), ``L_fg`` the
    pixel's own traced radiance, and ``L_bg`` a VALUE-ONLY estimate of
    what the pixel would see were the hit sphere absent: emission + one
    NEE at the second-nearest hit (indirect light at the revealed surface
    is ignored — a documented bias that costs one extra direct-lighting
    sample, not a second path trace). The ``x2`` compensates the band's
    one-sidedness: only lanes that HIT the sphere carry the carrier (the
    outside half of the sigmoid band has no L_fg), which integrates to
    half the coverage step (FD-validated in tests/test_silhouette_grad.py).

    The L_bg NEE reuses the depth-0 ``LIGHT_UV`` tape columns — no new
    draw site, so the golden tape contract (rng.py) is untouched; it is
    consumed inside stop_gradient, so the correlation with the primal's
    own depth-0 NEE cannot reach the image.

    Scope: bounce-0 silhouettes (the ones the camera sees directly) plus
    up to ``cfg.sil_spec_depth`` SPECULAR bounces — the walk follows
    lanes whose current hit is a perfect mirror (``refl == SPEC``,
    reflect) OR a dielectric (``refl == REFR``, refract on the
    deterministic transmission branch with the STOPPED geometry; TIR
    lanes reflect) and applies the identical carrier to the argmin hit
    of each continued ray. A sphere seen through a CHAIN of mirrors —
    or THROUGH a glass lens (VERDICT r3 #3, the dielectric branch
    ``device.cu:715-770``) — carries coverage gradient: on such lanes
    the pixel is ``prod tint * L(continued ray)`` in expectation, with
    ``tint = c_mirror`` per mirror leg and ``c_glass * (1 - Re)`` per
    refraction (the stopped Fresnel transmittance). The
    Fresnel-REFLECTED component of the PRIMARY glass hit is walked too
    (round 5): a second chain continues along the mirror direction with
    ``tint = c_glass * stop(Re)``, so a sphere seen only mirrored in a
    glass ball carries a sign-correct coverage term (single spawn —
    deeper spawns branch exponentially; the measured residual after
    this term is RR-population / two-interface structure, bounded in
    artifacts/REFR_REFLECT_BIAS.json). The depth-k tape feeds each
    leg's NEE. The chain GEOMETRY is DIFFERENTIABLE through the stopped
    hit ids (round 4): hit points / normals / reflection / refraction
    directions come from one-hot gathers of the real scene, so a
    terminal hit's coverage also sweeps with the UPSTREAM mirror/lens
    parameters — the reflected image's motion as the mirror itself
    moves carries gradient (TestMirrorMotionSilhouette; only the
    discrete choices and the Fresnel weight are stopped). Note a glass
    sphere costs TWO legs (entry + exit interfaces) before the revealed
    background, so a lens needs ``sil_spec_depth >= 2`` (the default).
    Diffuse-bounce (truly indirect) silhouettes remain detached.
    Capability upgrade of the sphere-editing loop at
    ``display_func.c:347-369``, same chain as ``vis_grad_tau``.
    """
    n = o.shape[0]
    sg = jax.lax.stop_gradient
    scene0 = jax.tree_util.tree_map(sg, scene)
    from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
    from gpu_bidirectional_raytracer_tpu.core.types import DIFF, SPEC

    def shade_value_only(hp_s, t_hit, hid_s, d_l, depth):
        """Value-only one-bounce shading of a surface point: emission +
        NEE at a diffuse hit (the L_fg/L_bg estimate — indirect light at
        the point is ignored, the documented carrier bias)."""
        hit_s = t_hit < _BIG
        p_s, e_s, c_s, refl_s = isect.gather_sphere_attrs(scene0, hid_s)
        normal_s = vm.norm(hp_s - p_s, eps=1e-20)
        dp_s = vm.dot(normal_s, d_l)
        nl_s = vm.smul(jnp.where(dp_s > 0.0, -1.0, 1.0), normal_s)
        emit_s = cfg.emission_scale * jnp.abs(dp_s)[:, None] * e_s
        if light_idx:
            L = len(light_idx)
            light_u = rng.site_uniforms(key, sample, depth, rng.LIGHT_UV,
                                        2 * L, n, lane_offset=lane_offset,
                                        lane_total=lane_total
                                        ).reshape(L, 2, n)
            cfg0 = dataclasses.replace(cfg, vis_grad_tau=0.0)
            ld_s = nee.sample_direct(scene0, cfg0, light_idx, hp_s, nl_s,
                                     light_u)
        else:
            ld_s = jnp.zeros((n, 3), dtype=jnp.float32)
        l = emit_s + jnp.where((refl_s == DIFF)[:, None], c_s * ld_s, 0.0)
        return jnp.where(hit_s[:, None], l, 0.0)

    def leg(o_l, d_l, active_m, tint, depth, use_rad):
        """One coverage-carrier leg along (stopped) rays ``(o_l, d_l)``.

        ``active_m [N]``: lanes this leg applies to; ``tint [N, 3]``:
        stopped camera-to-leg-origin throughput scaling L_fg/L_bg;
        ``depth`` selects the LIGHT_UV tape row the value-only NEE
        reuses. ``use_rad``: the PRIMARY leg takes L_fg = the pixel's own
        traced radiance (exact, includes indirect light); chain legs
        (k >= 1) instead shade the terminal hit value-only, SYMMETRIC
        with L_bg — the pixel's radiance also carries non-chain
        contributions (e.g. a glass sphere's Fresnel rim) that do not
        move with the terminal hit's coverage, and using it was measured
        to fabricate gradient where FD is exactly zero (an unlit sphere
        behind a lit lens, round-4 probes).
        """
        hit, t1, hid = isect.intersect(scene0, o_l, d_l)
        oh = jax.nn.one_hot(hid, scene.num_spheres, dtype=jnp.float32)
        # Differentiable discriminant of the (stopped) hit sphere; the
        # one-hot matmul routes d det into the hit rows of scene.p/rad.
        p_h = jnp.dot(oh, scene.p, preferred_element_type=jnp.float32)
        r_h = jnp.dot(oh, scene.rad[:, None],
                      preferred_element_type=jnp.float32)[:, 0]
        op = p_h - o_l
        b = jnp.sum(op * d_l, axis=-1)
        det = b * b - jnp.sum(op * op, axis=-1) + r_h * r_h
        width = sg(jnp.maximum(cfg.sil_grad_tau * r_h, 1e-6))
        cov = jax.nn.sigmoid(det / width)

        # ---- L_bg: value-only shading of the second-nearest hit ----
        ts = isect.sphere_distances(scene0, o_l, d_l)
        masked = jnp.where((ts > 0.0) & (oh < 0.5), ts, _BIG)
        t2 = jnp.min(masked, axis=-1)
        hid2 = jnp.argmin(masked, axis=-1).astype(jnp.int32)
        hp2 = o_l + jnp.where(t2 < _BIG, t2, 1.0)[:, None] * d_l
        l_bg = sg(shade_value_only(hp2, t2, hid2, d_l, depth) * tint)

        if use_rad:
            l_fg = rad
        else:
            hp1 = o_l + jnp.where(hit, t1, 1.0)[:, None] * d_l
            t1m = jnp.where(hit, t1, _BIG)
            l_fg = sg(shade_value_only(hp1, t1m, hid, d_l, depth) * tint)

        delta = sg(l_fg - l_bg)
        carrier = 2.0 * delta * (cov * hit.astype(jnp.float32)
                                 * active_m)[:, None]
        return carrier - sg(carrier)

    # ---- specular-chain walk: primary leg + one leg per SPEC/REFR bounce
    from gpu_bidirectional_raytracer_tpu.core.types import REFR
    from gpu_bidirectional_raytracer_tpu.integrators.bsdf import (
        _NC as NC,
        _NT as NT,
    )

    def advance(o_l, d_l):
        """One specular-chain continuation along (stopped-id) geometry.

        The chain geometry is DIFFERENTIABLE through the stopped hit
        ids (round 4): the reflected/refracted ray moves with the
        upstream sphere's position/radius, so a terminal hit's
        coverage sweep carries d(det)/d(upstream params) — the
        interior-image motion of a mirror or lens as IT moves. Hit
        points/normals come from one-hot gathers of the REAL scene on
        the stopped ids, with the guarded one-sphere root
        (`intersect.sphere_root`) supplying a differentiable t.
        Dielectric continuation follows the deterministic branches of
        device.cu:715-770; discrete choices (into, TIR, material) and
        the Fresnel weight are stopped; the double-where guards the
        TIR sqrt."""
        hit_k, _, hid_k = isect.intersect(scene0, o_l, d_l)
        _, _, c_k, refl_k = isect.gather_sphere_attrs(scene0, hid_k)
        oh_k = jax.nn.one_hot(hid_k, scene.num_spheres, dtype=jnp.float32)
        p_k = jnp.dot(oh_k, scene.p, preferred_element_type=jnp.float32)
        r_sph = jnp.dot(oh_k, scene.rad[:, None],
                        preferred_element_type=jnp.float32)[:, 0]
        t_k = isect.sphere_root(o_l, d_l, p_k, r_sph)
        hp_k = o_l + jnp.where(hit_k, t_k, 1.0)[:, None] * d_l
        n_k = vm.norm(hp_k - p_k, eps=1e-20)
        r_k = d_l - 2.0 * vm.dot(n_k, d_l)[:, None] * n_k
        dp_k = vm.dot(n_k, d_l)
        into = dp_k < 0.0
        nl_k = vm.smul(jnp.where(into, 1.0, -1.0), n_k)
        nnt = jnp.where(into, NC / NT, NT / NC)
        ddn = vm.dot(d_l, nl_k)
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        safe_cos = jnp.where(tir, 1.0, jnp.maximum(cos2t, 1e-12))
        kk = (jnp.where(into, 1.0, -1.0)
              * (ddn * nnt + jnp.where(tir, 0.0, jnp.sqrt(safe_cos))))
        t_dir = vm.norm(nnt[:, None] * d_l - kk[:, None] * n_k, eps=1e-20)
        r0 = ((NT - NC) / (NT + NC)) ** 2
        c1 = 1.0 - jnp.where(into, -ddn, vm.dot(t_dir, n_k))
        re = sg(r0 + (1.0 - r0) * c1 ** 5)
        is_spec = refl_k == SPEC
        is_refr = refl_k == REFR
        take_refl = is_spec | (is_refr & tir)
        next_d = jnp.where(take_refl[:, None], r_k, t_dir)
        trans_w = jnp.where(is_refr & jnp.logical_not(tir), 1.0 - re, 1.0)
        cont = (hit_k & (is_spec | is_refr)).astype(jnp.float32)
        return dict(hp=hp_k, next_d=next_d, r_k=r_k, cont=cont,
                    tint_mul=sg(c_k * trans_w[:, None]),
                    refl_spawn=(hit_k & is_refr
                                & jnp.logical_not(tir)).astype(jnp.float32),
                    re=re, c_k=c_k)

    o_l, d_l = o, d
    active = jnp.ones((n,), jnp.float32)
    tint = jnp.ones((n, 3), jnp.float32)
    out = jnp.zeros((n, 3), jnp.float32)
    depth_cap = min(max(int(cfg.sil_spec_depth), 0), cfg.max_depth - 1)
    b_state = None
    for k in range(depth_cap + 1):
        out = out + leg(o_l, d_l, active, tint, k, use_rad=(k == 0))
        if k == depth_cap:
            break
        adv = advance(o_l, d_l)
        if k == 0:
            # Spawn the Fresnel-REFLECTED branch at the primary glass
            # hit (VERDICT r4 #7): a non-TIR REFR hit also mirrors its
            # surroundings with weight Re — the walk below carries the
            # reflected image's coverage (a sphere seen only MIRRORED
            # in a glass ball; measured FD -0.667 +- 0.245 where the
            # transmission-only walk gave +0.49, wrong sign). One spawn
            # at k=0 covers the dominant single-Fresnel-bounce image;
            # deeper spawns would branch exponentially.
            b_state = (adv["hp"], adv["r_k"],
                       active * adv["refl_spawn"],
                       sg(tint * adv["c_k"] * adv["re"][:, None]))
        active = active * adv["cont"]
        tint = sg(tint * adv["tint_mul"])
        o_l, d_l = adv["hp"], adv["next_d"]

    if b_state is not None:
        b_o, b_d, b_active, b_tint = b_state
        for kb in range(1, depth_cap + 1):
            out = out + leg(b_o, b_d, b_active, b_tint, kb, use_rad=False)
            if kb == depth_cap:
                break
            adv = advance(b_o, b_d)
            b_active = b_active * adv["cont"]
            b_tint = sg(b_tint * adv["tint_mul"])
            b_o, b_d = adv["hp"], adv["next_d"]
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "spp", "backend"))
def render_radiance(scene: Scene, cam: Camera, key: Array,
                    cfg: IntegratorConfig, width: int, height: int,
                    light_idx: tuple[int, ...], spp: int = 1,
                    backend: str = "xla") -> Array:
    """Pure differentiable forward: mean radiance image ``[H, W, 3]``.

    Honors ``cfg.use_vpl``: with the bidirectional (GPU-intent) config the
    light subpaths are RE-TRACED inside the differentiable graph each
    sample, so gradients flow through emission, light geometry, albedo
    throughput, AND the eye-side gather (the adjoint of the estimator at
    ``device.cu:457-542``) — not just the unidirectional NEE half. The
    gather window is the freshly traced ``[0, max_vlp)`` block (each sample
    is its own VPL refresh; the progressive window slide is a variance-
    reduction schedule for beauty renders, not part of the estimator).

    Default config choice for *fitting* (see `InverseRenderer`): the
    unidirectional config remains the recommended default — measured with
    tools/bench_grad_variance.py (Cornell 24x18, 2spp, 12 tapes, matched
    GPU gains), the VPL estimator's albedo-gradient std is ~3.1x the
    unidirectional one at equal sample count, because each light subpath
    is shared by every pixel (correlated noise the mean-over-pixels loss
    cannot average away).

    ``backend='pallas'`` swaps the XLA tracer for the fused megakernel
    with its hand-written pallas VJP (`ops.pallas_grad`): same estimator
    and tape, fwd+bwd 1.57ms vs 15.9ms at cornell 512x512 on v5e (the
    XLA path is at its remat bound), including the ``vis_grad_tau``
    straight-through visibility carrier. Above the 64-sphere unroll cap it
    routes to the facts+re-walk hybrid (`ops.pallas_bounce_grad`): same
    estimator, pallas supplies the detached discrete facts, the scan-free
    XLA re-walk carries the gradient. ``backend='mxu'`` (explicit opt-in)
    reformulates every sphere scan as cross-term matmuls
    (`intersect.sphere_distances(method='mxu')`, roots agree to ~1e-3);
    measured a wash on v5e gradients and slower forward — see the inline
    note below and tools/bench_mxu_grad.py.
    """
    rad = render_radiance_lanes(scene, cam, key, cfg, width, height,
                                light_idx, spp, backend)
    return rad.reshape(height, width, 3)


def render_radiance_lanes(scene: Scene, cam: Camera, key: Array,
                          cfg: IntegratorConfig, width: int, height: int,
                          light_idx: tuple[int, ...], spp: int = 1,
                          backend: str = "xla", lane_offset=None,
                          lane_count: int | None = None,
                          lane_total: int | None = None,
                          interpret: bool = False) -> Array:
    """Lane-windowed core of `render_radiance`: renders global lanes
    ``[lane_offset, lane_offset + lane_count)`` of a ``lane_total``-lane
    frame, returning ``[lane_count, 3]``. Every random draw is a window of
    the global tape (`rng.site_uniforms`), so a banded/sharded render is
    bitwise-equal to the monolithic one — this is the per-shard body of
    `parallel.mesh.render_loss_grad_sharded`. ``lane_offset`` may be a
    traced scalar (e.g. ``axis_index * shard_n`` under shard_map).

    ``interpret=True`` forces the pallas kernels into interpret mode;
    callers whose devices differ from `jax.default_backend()` (a CPU
    mesh under a TPU-pinned default, as in the driver's virtual-device
    dry run) must pass it — the kernels' own auto-detection only sees
    the default backend (False keeps that auto behavior)."""
    from gpu_bidirectional_raytracer_tpu.integrators import light_tracer

    n_frame = width * height
    if lane_count is None:
        lane_offset, lane_count, lane_total = None, n_frame, None
    n = lane_count
    if lane_offset is None:
        px, py = cam_mod.pixel_grid(width, height)
    else:
        ids = jnp.asarray(lane_offset, jnp.int32) + jnp.arange(
            n, dtype=jnp.int32)
        px, py = ids % width, ids // width
    # The hand-written pallas adjoint covers the detached-path estimator
    # AND the straight-through visibility carrier (vis_grad_tau) up to the
    # 64-sphere unroll cap. Above it, backend='pallas' routes to the
    # facts+re-walk hybrid (`ops.pallas_bounce_grad.trace_bounce_diff`):
    # pallas computes the detached discrete facts (hit ids, occlusion),
    # the XLA re-walk carries the gradient with no O(S) scans. backend=
    # 'mxu' swaps every sphere scan for the matmul formulation — MEASURED
    # on v5e complex.scn 512x384 (tools/bench_mxu_grad.py): fwd 101.5 vs
    # 66.9 ms direct, fwd+bwd 218.4 vs 221.6 — a wash on gradients, slower
    # forward (K=3 matmuls underfeed the MXU); it remains an explicit
    # opt-in kept as the measured answer to "why not matmul the scans?".
    use_pallas = backend == "pallas" and scene.num_spheres <= 64
    use_bounce_diff = backend == "pallas" and scene.num_spheres > 64
    xla_scan = "mxu" if backend == "mxu" else "xla"

    def one_sample(s, acc):
        jit_uv = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n,
                                   lane_offset=lane_offset,
                                   lane_total=lane_total)
        rays = cam_mod.primary_rays(cam, width, height, jit_uv[0], jit_uv[1],
                                    px, py)
        if cfg.use_vpl and light_idx:
            # Light subpaths are addressed by subpath id, not pixel lane:
            # every shard traces the identical (replicated) VPL set.
            vpls = light_tracer.trace_light_paths(scene, cfg, light_idx,
                                                  key, jnp.int32(s))
            vlp_index = jnp.int32(0)
        else:
            vpls, vlp_index = None, None
        if use_pallas:
            from gpu_bidirectional_raytracer_tpu.ops.pallas_grad import (
                trace_pallas_diff,
            )

            rad = trace_pallas_diff(scene, cfg, light_idx, rays, key,
                                    jnp.int32(s), vpls=vpls,
                                    vlp_index=vlp_index,
                                    interpret=interpret,
                                    lane_offset=lane_offset,
                                    lane_total=lane_total)
        elif use_bounce_diff:
            from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce_grad \
                import trace_bounce_diff

            rad = trace_bounce_diff(scene, cfg, light_idx, rays, key,
                                    jnp.int32(s), vpls=vpls,
                                    vlp_index=vlp_index,
                                    interpret=interpret,
                                    lane_offset=lane_offset,
                                    lane_total=lane_total,
                                    frame_dims=(None if lane_offset
                                                is not None
                                                else (width, height)))
        else:
            rad = path_tracer.trace(scene, cfg, light_idx, rays, key,
                                    jnp.int32(s), vpls=vpls,
                                    vlp_index=vlp_index, remat=True,
                                    scan_backend=xla_scan,
                                    lane_offset=lane_offset,
                                    lane_total=lane_total)
        if cfg.sil_grad_tau > 0.0:
            rad = rad + _silhouette_carrier(scene, cfg, light_idx,
                                            rays.o, rays.d, rad, key,
                                            jnp.int32(s),
                                            lane_offset=lane_offset,
                                            lane_total=lane_total)
        return acc + rad

    acc = jax.lax.fori_loop(
        0, spp, one_sample, jnp.zeros((n, 3), dtype=jnp.float32))
    return acc / spp


def l2_loss(img: Array, target: Array) -> Array:
    return jnp.mean((img - target) ** 2)


def log_loss(img: Array, target: Array) -> Array:
    """L2 in log(1+radiance): compresses intensity so geometry/direction
    terms aren't drowned by brightness — markedly better-conditioned for
    light/position fitting than linear L2."""
    return jnp.mean((jnp.log1p(img) - jnp.log1p(target)) ** 2)


_LOSSES = {"l2": l2_loss, "log": log_loss}


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "spp", "loss",
                                             "backend"))
def render_loss_grad(scene: Scene, cam: Camera, key: Array, target: Array,
                     cfg: IntegratorConfig, width: int, height: int,
                     light_idx: tuple[int, ...], spp: int = 1,
                     loss: str = "l2", backend: str = "xla"):
    """(loss, d loss / d scene) for an image loss.

    ``loss``:
    - ``'l2_unbiased'`` (recommended for stochastic fitting): two
      INDEPENDENT renders A, B and the product loss mean((A-t)(B-t)).
      Its expectation is ||E[render]-t||^2 with no variance term — a
      plain L2 on a noisy render rewards darkening the scene to cut MC
      noise (E[(X-t)^2] = bias^2 + Var(X)), a measured ~2x-darkening
      bias on albedo fits at low spp.
    - ``'l2'``, ``'log'``: single-render losses (exact on fixed tapes,
      variance-biased under resampling).
    """
    # Fused single-kernel training step (VERDICT r4 #3): when the config
    # allows it, the l2/log pallas step runs loss+grads in ONE kernel —
    # the adjoint's own forward sweep supplies the radiance, so the
    # separate forward pallas call (0.634 ms of the 2.163 ms step,
    # artifacts/ADJOINT_CENSUS.json) disappears. Estimator/gradients
    # identical to the unfused path (tests/test_pallas_grad.py::
    # TestFusedStep).
    if (loss in ("l2", "log") and backend == "pallas" and spp == 1
            and cfg.sil_grad_tau == 0.0 and scene.num_spheres <= 64):
        return _render_loss_grad_fused(scene, cam, key, target, cfg,
                                       width, height, light_idx, loss)

    if loss == "l2_unbiased":
        key_b = jax.random.fold_in(key, jnp.uint32(0x5EED))

        def loss_fn(sc: Scene) -> Array:
            a = render_radiance(sc, cam, key, cfg, width, height,
                                light_idx, spp, backend)
            b = render_radiance(sc, cam, key_b, cfg, width, height,
                                light_idx, spp, backend)
            return jnp.mean((a - target) * (b - target))

        return jax.value_and_grad(loss_fn, allow_int=True)(scene)

    loss_f = _LOSSES[loss]

    def loss_fn(sc: Scene) -> Array:
        img = render_radiance(sc, cam, key, cfg, width, height, light_idx,
                              spp, backend)
        return loss_f(img, target)

    # allow_int: the Scene pytree carries the discrete material codes
    # (int32 refl); their "gradient" is float0 and is never used.
    return jax.value_and_grad(loss_fn, allow_int=True)(scene)


def _render_loss_grad_fused(scene: Scene, cam: Camera, key: Array,
                            target: Array, cfg: IntegratorConfig,
                            width: int, height: int,
                            light_idx: tuple[int, ...],
                            loss: str = "l2"):
    """The fused l2/log pallas training step (see router in
    `render_loss_grad`): one kernel for loss + direct gradients
    (`ops.pallas_grad.trace_pallas_loss_grad`), with the VPL-buffer
    cotangent pulled through `trace_light_paths` so the light-subpath
    chain (emission, light geometry, albedo throughput) contributes
    exactly as in the autodiff path."""
    from gpu_bidirectional_raytracer_tpu.integrators import light_tracer
    from gpu_bidirectional_raytracer_tpu.ops.pallas_grad import (
        trace_pallas_loss_grad,
    )

    n = width * height
    s = jnp.int32(0)
    jit_uv = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n)
    px, py = cam_mod.pixel_grid(width, height)
    rays = cam_mod.primary_rays(cam, width, height, jit_uv[0], jit_uv[1],
                                px, py)
    tgt = target.reshape(n, 3)

    if cfg.use_vpl and light_idx:
        vpls = light_tracer.trace_light_paths(scene, cfg, light_idx,
                                              key, s)

        def lt_float(p, rad, e, c):
            sc = scene.replace(p=p, rad=rad, e=e, c=c)
            v = light_tracer.trace_light_paths(sc, cfg, light_idx, key, s)
            return v.hp, v.rad, v.nl

        _, pull_lt = jax.vjp(lt_float, scene.p, scene.rad, scene.e,
                             scene.c)
        loss_v, g, dvpl = trace_pallas_loss_grad(
            scene, cfg, light_idx, rays, key, s, tgt,
            vpls=vpls, vlp_index=jnp.int32(0), loss=loss)
        dp2, drad2, de2, dc2 = pull_lt(dvpl)
        g = g.replace(p=g.p + dp2, rad=g.rad + drad2,
                      e=g.e + de2, c=g.c + dc2)
    else:
        loss_v, g, _ = trace_pallas_loss_grad(
            scene, cfg, light_idx, rays, key, s, tgt, loss=loss)
    return loss_v, g


def pixel_grad_fd(scene: Scene, render_fn: Callable[[Scene], Array],
                  param: str, index, eps: float = 1e-2) -> np.ndarray:
    """Central finite difference of ``render_fn`` w.r.t. one scalar scene
    entry — the oracle for gradient checks (BASELINE.md "grad-check")."""
    arr = getattr(scene, param)
    up = scene.replace(**{param: arr.at[index].add(eps)})
    dn = scene.replace(**{param: arr.at[index].add(-eps)})
    return (np.asarray(render_fn(up), np.float64)
            - np.asarray(render_fn(dn), np.float64)) / (2 * eps)


@dataclasses.dataclass
class InverseRenderer:
    """Gradient-descent scene fitting against a target image.

    The differentiable successor of the reference's keypress editing: where
    the UI moved ``spheres[currentSphere].p.x += 5`` and re-rendered
    (``display_func.c:352``), each `step` moves every *continuous* scene
    parameter down the loss gradient.
    """

    scene: Scene
    cam: Camera
    target: Array
    cfg: IntegratorConfig
    width: int
    height: int
    lr: float = 0.05
    spp: int = 4
    optimize: tuple[str, ...] = ("p", "rad")
    seed: int = 0
    resample: bool = True  # fresh RNG per step vs fixed tape
    min_radius: float = 0.1
    # Optional per-parameter gradient gate: {param: [S]-or-broadcastable
    # multiplier} — 0 freezes a sphere's entry (fit unknown objects in a
    # KNOWN room: without it, free walls/lights absorb transient error
    # while the perturbed objects are wrong and never fully return,
    # leaving a loss floor — measured on the ladder inverse rung).
    grad_mask: dict | None = None
    loss: str | None = None  # default: 'l2_unbiased' when resampling, 'l2'
                             # on a fixed tape (see render_loss_grad)
    backend: str = "auto"  # 'auto' = hand-written pallas adjoint on TPU
                           # (2.9x the XLA remat step), XLA elsewhere
    # -- carrier-tau annealing (VERDICT r4 #6). The straight-through
    # carriers' bias floor scales with their sigmoid band width, so a
    # fit descends to ~tau-proportional parameter error and then drifts
    # (STATUS r4 limit #2). Annealing shrinks sil/vis tau by
    # `tau_anneal` (final/initial ratio) over `anneal_steps` steps in
    # `anneal_stages` DISCRETE stages — each stage is one recompile, a
    # continuous schedule would recompile every step.
    tau_anneal: float = 1.0     # 1.0 = off
    anneal_steps: int = 0
    anneal_stages: int = 4
    # -- plateau early stopping: after `patience` consecutive steps with
    # < `min_improve` relative improvement on the best loss, stop (the
    # bias-floor drift regime). `best_scene` keeps the best-loss params.
    patience: int = 0           # 0 = off
    min_improve: float = 1e-3
    _opt_state: object = None
    _step: int = 0

    def __post_init__(self):
        import optax

        if self.loss is None:
            self.loss = "l2_unbiased" if self.resample else "l2"
        if self.backend == "auto":
            self.backend = ("pallas" if jax.default_backend() == "tpu"
                            and self.scene.num_spheres <= 64 else "xla")
        self.light_idx = static_light_indices(self.scene)
        self._tx = optax.adam(self.lr)
        params = {k: getattr(self.scene, k) for k in self.optimize}
        self._opt_state = self._tx.init(params)
        self.best_loss = float("inf")
        self.best_scene = self.scene
        self._stall = 0

    def _step_cfg(self) -> IntegratorConfig:
        """This step's config under the (staged) tau-annealing schedule."""
        if self.tau_anneal == 1.0 or self.anneal_steps <= 0:
            return self.cfg
        frac = min(self._step / self.anneal_steps, 1.0)
        stages = max(self.anneal_stages - 1, 1)
        q = round(frac * stages) / stages
        scale = self.tau_anneal ** q
        return dataclasses.replace(
            self.cfg,
            sil_grad_tau=self.cfg.sil_grad_tau * scale,
            vis_grad_tau=self.cfg.vis_grad_tau * scale)

    @property
    def should_stop(self) -> bool:
        """Plateau detector (see `patience`)."""
        return self.patience > 0 and self._stall >= self.patience

    def step(self) -> float:
        key = jax.random.key(self.seed)
        if self.resample:
            key = jax.random.fold_in(key, self._step)
        loss, grads = render_loss_grad(
            self.scene, self.cam, key, self.target, self._step_cfg(),
            self.width, self.height, self.light_idx, self.spp, self.loss,
            self.backend)
        import optax

        params = {k: getattr(self.scene, k) for k in self.optimize}
        g = {k: getattr(grads, k) for k in self.optimize}
        if self.grad_mask:
            g = {k: (v * jnp.reshape(
                jnp.asarray(self.grad_mask[k], v.dtype),
                (-1,) + (1,) * (v.ndim - 1)) if k in self.grad_mask
                else v) for k, v in g.items()}
        updates, self._opt_state = self._tx.update(g, self._opt_state, params)
        params = optax.apply_updates(params, updates)
        # Projection keeps geometry physical: a radius driven through zero
        # flips the sphere inside-out and detonates the quadratic-root
        # gradients (observed as NaN position updates).
        if "rad" in params:
            params["rad"] = jnp.maximum(params["rad"], self.min_radius)
        if "c" in params:
            params["c"] = jnp.clip(params["c"], 0.0, 1.0)
        if "e" in params:
            params["e"] = jnp.maximum(params["e"], 0.0)
        prev_scene = self.scene          # the scene `loss` was measured at
        self.scene = self.scene.replace(**params)
        self._step += 1
        lf = float(loss)
        if lf < self.best_loss * (1.0 - self.min_improve):
            self.best_loss = lf
            self.best_scene = prev_scene
            self._stall = 0
        else:
            self.best_loss = min(self.best_loss, lf)
            self._stall += 1
        return lf
