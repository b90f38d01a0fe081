"""Next-event estimation: explicit light sampling + VPL gather.

Re-derivation of ``SampleLights`` (``geomfunc.h:152-207``) and
``SampleLightsDevice`` incl. the virtual-point-light gather
(``device.cu:457-542``), vectorized over ray lanes.

The set of emissive spheres is passed as a *static* index tuple
(``light_idx``) computed once from the scene at setup: this keeps the
shadow-ray tensor at ``[N, L, S]`` (L = number of lights, typically 1-3)
instead of ``[N, S, S]``, and keeps shapes static under jit. Gradients
w.r.t. emission still flow; re-derive the tuple if an optimizer zeroes or
un-zeroes an emitter.

Estimator pinned to the reference: per light, one uniform sample on the
*whole* sphere surface, rejected when it faces away (``wo > 0`` branch,
``geomfunc.h:188-193``), contribution ``e * gain * (4 pi r^2) * wi * wo /
len^2`` — the reference's area-formulation without solid-angle conversion
(``geomfunc.h:199-200``). CPU golden uses gain=10, GPU gain=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
from gpu_bidirectional_raytracer_tpu.core.types import (
    EPSILON,
    IntegratorConfig,
    Scene,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.integrators.sampling import uniform_sphere

_TINY = 1e-20


def static_light_indices(scene: Scene) -> tuple[int, ...]:
    """Host-side: indices of emissive spheres (order = scan order)."""
    import numpy as np

    e = np.asarray(scene.e)
    return tuple(int(i) for i in range(e.shape[0]) if np.any(e[i] != 0.0))


def sample_direct(scene: Scene, cfg: IntegratorConfig,
                  light_idx: tuple[int, ...],
                  hp: Array, nl: Array, light_u: Array,
                  scan_backend: str = "xla",
                  active: Array | None = None,
                  occ_override: Array | None = None,
                  with_occ: bool = False):
    """Direct lighting at ``hp [N,3]`` with shading normal ``nl [N,3]``.

    ``light_u``: uniforms ``[L, 2, N]`` addressed by light SLOT — the
    position of the emissive sphere in ``light_idx`` scan order. The golden
    model indexes the identical tape by the same slot convention.
    Returns radiance ``[N, 3]`` (before throughput multiply).

    ``scan_backend='pallas'`` + ``active`` (the caller's ``alive &
    is_diff`` lanes): the shadow any-hit runs tile-guarded pallas scans
    (`ops.pallas_scan`) — inactive lanes may report unoccluded light, but
    the caller masks their contribution exactly as it does on the XLA
    path. Forward rendering only.
    """
    n = hp.shape[0]
    if not light_idx:
        zero = jnp.zeros((n, 3), dtype=hp.dtype)
        none = jnp.zeros((n, 0), bool)
        return (zero, none, none) if with_occ else zero

    li = jnp.asarray(light_idx, dtype=jnp.int32)            # [L]
    lp = scene.p[li]                                        # [L, 3]
    lrad = scene.rad[li]                                    # [L]
    le = scene.e[li]                                        # [L, 3]

    u1 = light_u[:, 0, :].T                                 # [N, L]
    u2 = light_u[:, 1, :].T                                 # [N, L]
    usp = uniform_sphere(u1, u2)                            # [N, L, 3]
    sphere_point = lp[None, :, :] + lrad[None, :, None] * usp

    sdir = sphere_point - hp[:, None, :]                    # [N, L, 3]
    # Double-where: d(sqrt)/dx = inf at 0 would NaN gradients if a fitted
    # light point coincides with a (masked) shading point.
    len_sq = jnp.sum(sdir * sdir, axis=-1)                  # [N, L]
    pos = len_sq > 0.0
    length = jnp.where(pos, jnp.sqrt(jnp.where(pos, len_sq, 1.0)), 0.0)
    sdir = sdir / jnp.maximum(length, _TINY)[..., None]

    wo = jnp.sum(sdir * usp, axis=-1)                       # [N, L]
    facing = wo <= 0.0                                      # reject far hemisphere
    wo = -wo
    wi = jnp.sum(sdir * nl[:, None, :], axis=-1)            # [N, L]

    flat_o = jnp.broadcast_to(hp[:, None, :], sdir.shape).reshape(-1, 3)
    flat_d = sdir.reshape(-1, 3)
    flat_maxt = (length - EPSILON).reshape(-1)
    if occ_override is not None:
        # Occlusion facts supplied by a prior scan (the aux-conditioned
        # differentiable re-walk, ops.pallas_bounce_grad): occlusion is
        # detached in the gradient estimator anyway, so skipping the O(S)
        # shadow scan here changes nothing but the cost.
        occluded = occ_override                                    # [N, L]
    elif scan_backend == "pallas":
        from gpu_bidirectional_raytracer_tpu.ops import pallas_scan

        act = active if active is not None else jnp.ones((n,), bool)
        act_flat = jnp.broadcast_to(act[:, None], length.shape).reshape(-1)
        occluded = pallas_scan.anyhit_tiles(
            scene, flat_o, flat_d, flat_maxt,
            act_flat).reshape(length.shape)                        # [N, L]
    else:
        occluded = isect.intersect_p(
            scene, flat_o, flat_d, flat_maxt,
            method="mxu" if scan_backend == "mxu" else "direct",
        ).reshape(length.shape)

    scale = (4.0 * jnp.pi * lrad * lrad)[None, :] * wi * wo / jnp.maximum(
        length * length, _TINY)
    contrib = le[None, :, :] * (cfg.light_gain * scale)[..., None]
    contrib_mask = facing & (wi > 0.0) & jnp.logical_not(occluded)
    out = jnp.where(contrib_mask[..., None], contrib, 0.0)
    if cfg.vis_grad_tau > 0.0:
        # Straight-through visibility gradient: add a ZERO-primal carrier
        # (x - stop_grad(x) is exactly 0.0) whose linearization is
        # stop_grad(contrib) * d(soft visibility) — the hard expression
        # above is untouched, so images are unchanged.
        # exclude_id: the sampled TARGET light per column (see
        # soft_visibility — its chord entry is the sample point).
        ex = jnp.broadcast_to(li[None, :], length.shape).reshape(-1)
        soft = isect.soft_visibility(
            scene, flat_o, flat_d, flat_maxt,
            cfg.vis_grad_tau, exclude_id=ex).reshape(length.shape)
        carrier = jax.lax.stop_gradient(
            jnp.where((facing & (wi > 0.0))[..., None], contrib, 0.0)
        ) * soft[..., None]
        out = out + (carrier - jax.lax.stop_gradient(carrier))
    result = jnp.sum(out, axis=1)
    return (result, occluded, contrib_mask) if with_occ else result


def gather_vpls(scene: Scene, cfg: IntegratorConfig, vpls: VplBuffer,
                vlp_index: Array, hp: Array, nl: Array,
                scan_backend: str = "xla",
                active: Array | None = None,
                occ_override: Array | None = None,
                with_occ: bool = False):
    """VPL gather at ``hp`` (``device.cu:507-539``), returns ``[N, 3]``.

    Window: depths ``0..vpl_depth`` x lanes ``vlp_index..vlp_index+max_vlp``
    with wraparound modulo ``light_points`` (the reference slides the window
    off the end of ``dev_lp`` — SURVEY.md 2.20 documents the intent; we wrap).
    Virtual shadow rays use the vacuum any-hit so they pass through emitters.
    Result is averaged by ``1/(vpl_depth * max_vlp)``.
    """
    d_, v_ = cfg.vpl_depth, cfg.max_vlp
    raw = vlp_index + jnp.arange(v_)                               # [V]
    if cfg.stale_vpl_window:
        # Reference-bug emulation: no wraparound; slots past the buffer
        # end read "stale memory" — modeled as invalid (see types.py).
        lanes = jnp.minimum(raw, cfg.light_points - 1)
        in_range = raw < cfg.light_points
    else:
        lanes = raw % cfg.light_points
        in_range = jnp.ones_like(raw, dtype=bool)
    w_hp = vpls.hp[:d_, lanes].reshape(-1, 3)                      # [K, 3]
    w_rad = vpls.rad[:d_, lanes].reshape(-1, 3)
    w_nl = vpls.nl[:d_, lanes].reshape(-1, 3)
    w_valid = (vpls.valid[:d_, lanes]
               & in_range[None, :]).reshape(-1)                    # [K]
    k = w_hp.shape[0]

    sdir = w_hp[None, :, :] - hp[:, None, :]                       # [N, K, 3]
    len_sq = jnp.sum(sdir * sdir, axis=-1)
    pos = len_sq > 0.0
    length = jnp.where(pos, jnp.sqrt(jnp.where(pos, len_sq, 1.0)), 0.0)
    sdir = sdir / jnp.maximum(length, _TINY)[..., None]

    wo = jnp.sum(sdir * w_nl[None, :, :], axis=-1)                 # [N, K]
    facing = wo <= 0.0
    wo = -wo
    wi = jnp.sum(sdir * nl[:, None, :], axis=-1)

    flat_o = jnp.broadcast_to(hp[:, None, :], sdir.shape).reshape(-1, 3)
    flat_d = sdir.reshape(-1, 3)
    flat_maxt = (length - EPSILON).reshape(-1)
    if occ_override is not None:
        occluded = occ_override                                    # [N, K]
    elif scan_backend == "pallas":
        from gpu_bidirectional_raytracer_tpu.ops import pallas_scan

        act = (active if active is not None
               else jnp.ones((hp.shape[0],), bool))
        act_flat = jnp.broadcast_to(act[:, None], length.shape).reshape(-1)
        occluded = pallas_scan.anyhit_tiles(
            scene, flat_o, flat_d, flat_maxt, act_flat,
            vacuum=True).reshape(length.shape)
    else:
        occluded = isect.intersect_p_vacuum(
            scene, flat_o, flat_d, flat_maxt,
            method="mxu" if scan_backend == "mxu" else "direct",
        ).reshape(length.shape)

    contrib = w_rad[None, :, :] * (wi * wo)[..., None]
    mask = facing & (wi > 0.0) & jnp.logical_not(occluded) & w_valid[None, :]
    out = jnp.where(mask[..., None], contrib, 0.0)
    if cfg.vis_grad_tau > 0.0:
        # Straight-through virtual-shadow-ray visibility: zero-primal
        # carrier, same construction as sample_direct.
        ex = None
        if vpls.sid is not None:
            # exclude each gather's host sphere (see soft_visibility).
            w_sid = vpls.sid[:d_, lanes].reshape(-1)                # [K]
            ex = jnp.broadcast_to(w_sid[None, :],
                                  length.shape).reshape(-1)
        soft = isect.soft_visibility(
            scene, flat_o, flat_d, flat_maxt, cfg.vis_grad_tau,
            vacuum=True, exclude_id=ex).reshape(length.shape)
        carrier = jax.lax.stop_gradient(
            jnp.where((facing & (wi > 0.0) & w_valid[None, :])[..., None],
                      contrib, 0.0)) * soft[..., None]
        out = out + (carrier - jax.lax.stop_gradient(carrier))
    result = jnp.sum(out, axis=1) / jnp.float32(k)
    return (result, occluded, mask) if with_occ else result


def sample_lights(scene: Scene, cfg: IntegratorConfig,
                  light_idx: tuple[int, ...],
                  hp: Array, nl: Array, light_u: Array,
                  vpls: VplBuffer | None = None,
                  vlp_index: Array | None = None,
                  scan_backend: str = "xla",
                  active: Array | None = None,
                  occ_light: Array | None = None,
                  occ_vpl: Array | None = None,
                  with_occ: bool = False):
    """Full NEE: direct + (optionally) VPL gather with the reference's
    ``(direct + vpl_avg) / 2`` combine (``device.cu:538-540``).

    ``occ_light [N,L]`` / ``occ_vpl [N,K]``: detached occlusion facts from
    a prior pallas scan (the aux re-walk) — skip the O(S) shadow scans.
    ``with_occ=True`` returns ``(radiance, occ_light, occ_vpl, ok_light)``
    — the XLA facts collector of `path_tracer.trace(collect_aux=True)`;
    ``ok_light`` is the FULL per-light contribution gate (facing & wi>0 &
    unoccluded), the extra decision bits the cross-backend flip census
    needs."""
    direct = sample_direct(scene, cfg, light_idx, hp, nl, light_u,
                           scan_backend, active, occ_override=occ_light,
                           with_occ=with_occ)
    if with_occ:
        direct, got_occ_l, got_ok_l = direct
    if not cfg.use_vpl or vpls is None:
        return (direct, got_occ_l, None, got_ok_l) if with_occ else direct
    vpl = gather_vpls(scene, cfg, vpls, vlp_index, hp, nl,
                      scan_backend, active, occ_override=occ_vpl,
                      with_occ=with_occ)
    if with_occ:
        vpl, got_occ_v, _ = vpl
    total = direct + vpl
    total = total * 0.5 if cfg.combine_half else total
    return (total, got_occ_l, got_occ_v, got_ok_l) if with_occ else total
