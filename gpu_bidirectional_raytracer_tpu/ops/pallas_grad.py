"""Hand-written Pallas adjoint of the eye-path megakernel (custom_vjp).

Why this exists: the differentiable path through the XLA tracer
(`path_tracer.trace(remat=True)`) is at the rematerialization bound —
fwd+bwd is ~6.5x the fused pallas forward (BENCH_r01: 24.4ms vs 3.8ms at
512x512). This module replaces XLA's generated backward with a single
fused pallas kernel that (a) recomputes the forward path tile-by-tile in
VMEM (nothing spills to HBM between bounces) and (b) runs a manual
reverse sweep accumulating scene-parameter, VPL, and primary-ray
gradients in the same pass.

The function being adjointed is the eye kernel re-design of
``/root/reference/src/device.cu:544-791`` (plus the NEE/VPL gather at
``device.cu:457-542``); the gradient ESTIMATOR matches the XLA policy in
`diff/gradients.py` exactly:

- discrete structure (hit ids, material/emitter masks, occlusion, facing
  tests, Fresnel RR branch, specular flags) is DETACHED;
- with ``cfg.vis_grad_tau > 0`` the reverse sweep additionally carries the
  straight-through visibility gradient (the zero-primal carriers of
  `integrators/direct.py:113-124,187-196`): stop(contrib) times the
  adjoint of `intersect.soft_visibility`, routed into blocker p/rad and
  the shadow-segment endpoints — forward output is unchanged;
- hit distances are differentiable through the quadratic root of the
  (stopped) hit sphere, with the same tangency clamp as
  `integrators/intersect.py:75` (d sqrt(det) is zero for det <= 1e-6);
- every sqrt/reciprocal on maskable data is where-guarded.

Gradient parity with `jax.grad` of the XLA tracer is asserted by
tests/test_pallas_grad.py (elementwise rtol + finite differences).

Layout mirrors `ops.pallas_trace`: per-ray quantities are [rows, 128]
f32 planes; the sphere table is the same [S, 16] block; per-tile scene /
VPL gradient contributions come back as [n_tiles, S, 16] / [n_tiles, V,
16] outputs summed outside the kernel (a tiny reduction vs the per-lane
work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_bidirectional_raytracer_tpu.core.types import (
    DIFF,
    EPSILON,
    IntegratorConfig,
    Rays,
    Scene,
    SPEC,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
    _LANES,
    _build_tape,
    _kernel,
    _mix32_key_dtype,
    _row_block,
    _scene_table,
    _tape_key_tables,
    _tape_rows,
    _vpl_table,
)

from gpu_bidirectional_raytracer_tpu.integrators.intersect import (
    ENDPOINT_TAU_FRACTION as _EP_FRAC,
)

_NC, _NT = 1.0, 1.5
_BIG = 1e20
_DET_CLAMP = 1e-6   # intersect.py:75 tangency clamp


def _f32m(b):
    """Boolean plane -> {0,1} float mask (Mosaic-friendly arithmetic)."""
    return b.astype(jnp.float32)


def _safe_sqrt(x):
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _safe_inv_sqrt_grad(x):
    """d(safe_sqrt)/dx with the tangency clamp of intersect.py:75:
    zero unless x > _DET_CLAMP."""
    pos = x > _DET_CLAMP
    return jnp.where(pos, 0.5 / jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _normalize3(x, y, z):
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1e-30)
    return x * inv, y * inv, z * inv, inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize_adj(sx, sy, sz, inv, bnx, bny, bnz):
    """Adjoint of n = s * inv, inv = 1/sqrt(s.s + eps).

    Returns (bsx, bsy, bsz). Uses the forward's saved (s, inv).
    """
    # n_i = s_i * inv;  binv = bn . s;  bq = -0.5 inv^3 binv;  bs += 2 s bq
    binv = bnx * sx + bny * sy + bnz * sz
    bq = -0.5 * (inv * inv * inv) * binv
    bsx = bnx * inv + 2.0 * sx * bq
    bsy = bny * inv + 2.0 * sy * bq
    bsz = bnz * inv + 2.0 * sz * bq
    return bsx, bsy, bsz


def _sphere_t_fwd(px, py, pz, rad, ox, oy, oz, dx, dy, dz):
    """Quadratic root + the residuals its adjoint needs."""
    opx, opy, opz = px - ox, py - oy, pz - oz
    b = _dot3(opx, opy, opz, dx, dy, dz)
    det = b * b - _dot3(opx, opy, opz, opx, opy, opz) + rad * rad
    hit = det >= 0.0
    sq = _safe_sqrt(det)
    t1 = b - sq
    t2 = b + sq
    use1 = t1 > EPSILON
    t = jnp.where(use1, t1, jnp.where(t2 > EPSILON, t2, 0.0))
    t = jnp.where(hit, t, 0.0)
    sgn = jnp.where(use1, jnp.float32(-1.0), jnp.float32(1.0))
    return t, (opx, opy, opz, b, det, sgn)


def _sphere_t_adj(res, dx, dy, dz, rad, bt):
    """Adjoint of `_sphere_t_fwd` w.r.t. (o, d, p, rad).

    Branch choice (sgn) and hit mask are detached; d sqrt uses the
    XLA-side tangency clamp. Returns per-lane adjoint planes
    (box, boy, boz, bdx, bdy, bdz, bpx, bpy, bpz, brad).
    """
    opx, opy, opz, b, det, sgn = res
    bb = bt
    bsq = sgn * bt
    bdet = bsq * _safe_inv_sqrt_grad(det)
    bb = bb + 2.0 * b * bdet
    bopx = -2.0 * opx * bdet + bb * dx
    bopy = -2.0 * opy * bdet + bb * dy
    bopz = -2.0 * opz * bdet + bb * dz
    brad = 2.0 * rad * bdet
    bdx = bb * opx
    bdy = bb * opy
    bdz = bb * opz
    # op = p - o
    return (-bopx, -bopy, -bopz, bdx, bdy, bdz, bopx, bopy, bopz, brad)


def _bwd_kernel(scene_ref, vpl_ref, tape_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                gr_ref, gg_ref, gb_ref,
                dtab_ref, dvpl_ref,
                dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
                *extra_refs, cfg: IntegratorConfig,
                light_idx: tuple[int, ...],
                n_spheres: int, n_vpl: int, use_vpl: bool,
                fused_loss: bool = False, inv3n: float = 0.0,
                inline_tape: bool = False, loss_kind: str = "l2"):
    """One tile: forward recompute (saving per-depth state) + reverse sweep.

    Mirrors `pallas_trace._kernel` (non-camera mode) op for op; see module
    docstring for the gradient policy.

    ``fused_loss=True`` (the fused l2 TRAINING-STEP kernel, VERDICT r4
    #3): ``gr/gg/gb_ref`` carry the TARGET image planes instead of
    cotangents, ``extra_refs = (vm_ref, dloss_ref)`` add a lane-validity
    input plane (padded lanes trace garbage and must not reach the loss)
    and a per-tile ``[1, 16]`` loss-partial output. The forward sweep
    then ALSO accumulates radiance (emitter hits + NEE/VPL gather values
    — the only additions over the plain state recompute), the l2
    cotangent ``g = 2 (rad - target) / (3 n)`` is formed in-kernel, and
    the reverse sweep runs unchanged. This removes the separate forward
    kernel from the training step: the adjoint-census lever
    (artifacts/ADJOINT_CENSUS.json: fwd kernel 0.634 ms of the 2.163 ms
    step was pure recompute of what this kernel's forward sweep already
    does).
    """
    f32 = jnp.float32
    L = max(len(light_idx), 1)
    per_depth, _ = _tape_rows(cfg, L)
    D = cfg.max_depth
    # Straight-through visibility carrier (IntegratorConfig.vis_grad_tau,
    # intersect.soft_visibility): zero-primal, so the FORWARD recompute is
    # untouched; the reverse sweep additionally routes
    # stop(contrib) * d(soft) into blocker p/rad and the shadow-segment
    # endpoints. Round 3 mirrors soft_visibility's TWO-SIDED endpoint:
    # blocked_s = edge_s * endpoint_s * hard(b > eps) with
    # edge = sigma(det/w) and endpoint = sigma((maxt - t1)/w),
    # t1 = b - sqrt(det). The product rule needs the leave-one-out
    # factor soft / (1 - blocked_s); the division is guarded — when
    # 1 - blocked ~ 0 both sigmoids are saturated and their derivatives
    # vanish faster than the quotient grows.
    vis = cfg.vis_grad_tau > 0.0

    def sph(s, k):
        return scene_ref[s, k]

    def vis_terms(s, ox_, oy_, oz_, sdx, sdy, sdz, maxt):
        """Blocker ``s`` pieces for one shadow ray: ``(edge, gate_b,
        endp, width, b, det, op)`` with blocked = edge*endp*gate_b."""
        opx_s = sph(s, 1) - ox_
        opy_s = sph(s, 2) - oy_
        opz_s = sph(s, 3) - oz_
        b_s = _dot3(opx_s, opy_s, opz_s, sdx, sdy, sdz)
        det_s = (b_s * b_s - _dot3(opx_s, opy_s, opz_s, opx_s, opy_s, opz_s)
                 + sph(s, 0) * sph(s, 0))
        width = jnp.maximum(f32(cfg.vis_grad_tau) * sph(s, 0), f32(1e-6))
        edge = 1.0 / (1.0 + jnp.exp(-det_s / width))
        t1 = b_s - jnp.sqrt(jnp.maximum(det_s, f32(1e-6)))
        # Endpoint width = ENDPOINT_TAU_FRACTION * tau scene units
        # (length-space event, narrow band; intersect.soft_visibility
        # and intersect.ENDPOINT_TAU_FRACTION — keep in lockstep).
        endp = 1.0 / (1.0 + jnp.exp(
            -(maxt - t1) / f32(max(_EP_FRAC * cfg.vis_grad_tau, 1e-6))))
        gate_b = _f32m(b_s > EPSILON)
        return edge, gate_b, endp, width, b_s, det_s, (opx_s, opy_s, opz_s)

    def vis_blocker_adj(bsoft, soft, edge, gate, endp, width, b_s, det_s,
                        op_s, sdx, sdy, sdz):
        """Adjoint of ``soft`` w.r.t. one blocker's pieces.

        ``gate`` folds every hard factor (b > eps, vacuum nonlite).
        Returns per-lane ``(bdet-routed bop/bsd/bhp pieces)`` as
        ``(bop_x, bop_y, bop_z, bsd_dx, bsd_dy, bsd_dz, brad, bmaxt)``
        where the caller accumulates bhp -= bop, bsd += bsd_d.
        """
        opx_s, opy_s, opz_s = op_s
        E = edge * gate
        blocked = E * endp
        denom = 1.0 - blocked
        so = bsoft * jnp.where(denom > 1e-6, soft / denom, 0.0)
        gd = endp * (1.0 - endp) / f32(max(_EP_FRAC * cfg.vis_grad_tau,
                                           1e-6))
        dsq = _safe_inv_sqrt_grad(det_s)
        bdet = -so * (gate * edge * (1.0 - edge) / width * endp
                      + E * gd * dsq)
        bb = so * E * gd          # via z = maxt - b + sqrt(det)
        bmaxt = -so * E * gd
        bb_t = 2.0 * b_s * bdet + bb
        bop_x = bb_t * sdx - 2.0 * opx_s * bdet
        bop_y = bb_t * sdy - 2.0 * opy_s * bdet
        bop_z = bb_t * sdz - 2.0 * opz_s * bdet
        return (bop_x, bop_y, bop_z, bb_t * opx_s, bb_t * opy_s,
                bb_t * opz_s, 2.0 * bdet, bmaxt)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    shape = ox.shape

    if inline_tape:
        # tape_ref carries the per-row SITE KEYS (mix32 only): the tape
        # regenerates in-register — see pallas_trace._inline_trow. No
        # affine table (no camera rows in the diff tape).
        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
            _inline_trow,
        )

        trow_all = _inline_trow(tape_ref, None, shape[0])
    else:
        def trow_all(i):
            return tape_ref[i]

    def ld_values(depth, hx, hy, hz, nlx, nly, nlz):
        """VALUE-only NEE + VPL gather at this depth's hit points — the
        radiance the fused forward sweep needs. Op-for-op the same
        arithmetic as the reverse sweep's recompute below (identical
        floats), minus every adjoint-only piece (res lists, soft
        carriers — those are zero-primal).

        Also returns the per-light / per-VPL OCCLUSION masks: they are
        detached discrete facts, so the reverse sweep reuses them
        instead of re-running its own O(S) shadow scans — in fused mode
        those scans were nearly all of the reverse sweep's sphere work
        (the eye hit is adjointed from the saved winner, one root)."""
        occ_l = []
        occ_v = []
        ld_r = jnp.zeros(shape, f32)
        ld_g = jnp.zeros(shape, f32)
        ld_b = jnp.zeros(shape, f32)
        for li, lig in enumerate(light_idx):
            u1 = trow_all(depth * per_depth + li)
            u2 = trow_all(depth * per_depth + L + li)
            lrad = sph(lig, 0)
            lpx, lpy, lpz = sph(lig, 1), sph(lig, 2), sph(lig, 3)
            zz = 1.0 - 2.0 * u1
            rr_ = _safe_sqrt(1.0 - zz * zz)
            phi = 2.0 * jnp.pi * u2
            uxs, uys, uzs = rr_ * jnp.cos(phi), rr_ * jnp.sin(phi), zz
            spx = lpx + lrad * uxs
            spy = lpy + lrad * uys
            spz = lpz + lrad * uzs
            rwx, rwy, rwz = spx - hx, spy - hy, spz - hz
            q = _dot3(rwx, rwy, rwz, rwx, rwy, rwz) + 1e-30
            slen = jnp.sqrt(q)
            inv = 1.0 / slen
            sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
            wo = -_dot3(sdx, sdy, sdz, uxs, uys, uzs)
            wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
            occ = jnp.zeros(shape, bool)
            maxt = slen - EPSILON
            for s in range(n_spheres):
                ts, _ = _sphere_t_fwd(sph(s, 1), sph(s, 2), sph(s, 3),
                                      sph(s, 0), hx, hy, hz,
                                      sdx, sdy, sdz)
                occ = occ | ((ts > 0.0) & (ts < maxt))
            occ_l.append(_f32m(occ))
            ok_m = _f32m((wo >= 0.0) & (wi > 0.0) & jnp.logical_not(occ))
            inv2 = inv * inv
            core = (4.0 * jnp.pi) * (lrad * lrad) * wi * wo * inv2
            scale = ok_m * f32(cfg.light_gain) * core
            ld_r = ld_r + sph(lig, 4) * scale
            ld_g = ld_g + sph(lig, 5) * scale
            ld_b = ld_b + sph(lig, 6) * scale
        if use_vpl and n_vpl > 0:
            v_r = jnp.zeros(shape, f32)
            v_g = jnp.zeros(shape, f32)
            v_b = jnp.zeros(shape, f32)
            for v in range(n_vpl):
                vhx, vhy, vhz = vpl_ref[v, 0], vpl_ref[v, 1], vpl_ref[v, 2]
                vrx, vry, vrz = vpl_ref[v, 3], vpl_ref[v, 4], vpl_ref[v, 5]
                vnx, vny, vnz = vpl_ref[v, 6], vpl_ref[v, 7], vpl_ref[v, 8]
                vvalid = vpl_ref[v, 9] > 0.5
                rwx, rwy, rwz = vhx - hx, vhy - hy, vhz - hz
                q = _dot3(rwx, rwy, rwz, rwx, rwy, rwz) + 1e-30
                slen = jnp.sqrt(q)
                inv = 1.0 / slen
                sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
                wo = -_dot3(sdx, sdy, sdz, vnx, vny, vnz)
                wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
                occ = jnp.zeros(shape, bool)
                maxt = slen - EPSILON
                for s in range(n_spheres):
                    ts, _ = _sphere_t_fwd(sph(s, 1), sph(s, 2), sph(s, 3),
                                          sph(s, 0), hx, hy, hz,
                                          sdx, sdy, sdz)
                    blocked = (ts > 0.0) & (ts < maxt)
                    nonlite = (sph(s, 4) == 0.0) & (sph(s, 5) == 0.0) & (
                        sph(s, 6) == 0.0)
                    occ = occ | (blocked & nonlite)
                occ_v.append(_f32m(occ))
                ok_m = _f32m((wo >= 0.0) & (wi > 0.0)
                             & jnp.logical_not(occ) & vvalid)
                w = ok_m * wi * wo
                v_r = v_r + vrx * w
                v_g = v_g + vry * w
                v_b = v_b + vrz * w
            inv_k = f32(1.0 / n_vpl)
            ld_r = ld_r + v_r * inv_k
            ld_g = ld_g + v_g * inv_k
            ld_b = ld_b + v_b * inv_k
            if cfg.combine_half:
                ld_r, ld_g, ld_b = ld_r * 0.5, ld_g * 0.5, ld_b * 0.5
        return ld_r, ld_g, ld_b, occ_l, occ_v

    tp_r = jnp.ones(shape, f32)
    tp_g = jnp.ones(shape, f32)
    tp_b = jnp.ones(shape, f32)
    spec_m = jnp.ones(shape, f32)
    alive_m = jnp.ones(shape, f32)
    rad_r = jnp.zeros(shape, f32)
    rad_g = jnp.zeros(shape, f32)
    rad_b = jnp.zeros(shape, f32)

    # ---------------- forward sweep: save per-depth entry state ----------
    saved = []
    for depth in range(D):
        best_t = jnp.full(shape, _BIG, f32)
        best_id = jnp.zeros(shape, f32)
        for s in range(n_spheres):
            ts, _ = _sphere_t_fwd(sph(s, 1), sph(s, 2), sph(s, 3), sph(s, 0),
                                  ox, oy, oz, dx, dy, dz)
            closer = (ts > 0.0) & (ts < best_t)
            best_t = jnp.where(closer, ts, best_t)
            best_id = jnp.where(closer, f32(s), best_id)
        hit_m = _f32m(best_t < _BIG)
        t = jnp.where(best_t < _BIG, best_t, 1.0)

        saved.append(dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                          tp_r=tp_r, tp_g=tp_g, tp_b=tp_b,
                          alive_m=alive_m, spec_m=spec_m,
                          hit_m=hit_m, t=t, best_id=best_id))

        # attrs of the hit sphere (selects; ids detached)
        opx = jnp.zeros(shape, f32); opy = jnp.zeros(shape, f32)
        opz = jnp.zeros(shape, f32)
        oex = jnp.zeros(shape, f32); oey = jnp.zeros(shape, f32)
        oez = jnp.zeros(shape, f32)
        ocx = jnp.zeros(shape, f32); ocy = jnp.zeros(shape, f32)
        ocz = jnp.zeros(shape, f32)
        orefl = jnp.zeros(shape, f32)
        for s in range(n_spheres):
            sel = best_id == f32(s)
            opx = jnp.where(sel, sph(s, 1), opx)
            opy = jnp.where(sel, sph(s, 2), opy)
            opz = jnp.where(sel, sph(s, 3), opz)
            oex = jnp.where(sel, sph(s, 4), oex)
            oey = jnp.where(sel, sph(s, 5), oey)
            oez = jnp.where(sel, sph(s, 6), oez)
            ocx = jnp.where(sel, sph(s, 7), ocx)
            ocy = jnp.where(sel, sph(s, 8), ocy)
            ocz = jnp.where(sel, sph(s, 9), ocz)
            orefl = jnp.where(sel, sph(s, 10), orefl)

        hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
        nx, ny, nz, _ = _normalize3(hx - opx, hy - opy, hz - opz)
        dp = _dot3(nx, ny, nz, dx, dy, dz)
        flip = jnp.where(dp > 0.0, f32(-1.0), f32(1.0))
        nlx, nly, nlz = flip * nx, flip * ny, flip * nz

        emit_m = _f32m((oex != 0.0) | (oey != 0.0) | (oez != 0.0))
        alive1 = alive_m * hit_m
        alive2 = alive1 * (1.0 - emit_m)
        diff_m = _f32m(orefl == f32(DIFF))

        if fused_loss:
            # Radiance accumulation (fused training step): the emitter
            # term + the NEE/VPL gather value at diffuse vertices —
            # the same estimator terms the reverse sweep adjoints
            # (_bounce_step semantics, device.cu:651-703).
            esc_f = f32(cfg.emission_scale)
            add_f = alive1 * emit_m * spec_m
            gain_f = esc_f * jnp.abs(dp)
            rad_r = rad_r + add_f * gain_f * oex * tp_r
            rad_g = rad_g + add_f * gain_f * oey * tp_g
            rad_b = rad_b + add_f * gain_f * oez * tp_b
            ld_r, ld_g, ld_b, occ_l, occ_v = ld_values(
                depth, hx, hy, hz, nlx, nly, nlz)
            saved[-1]["occ_l"] = occ_l
            saved[-1]["occ_v"] = occ_v
            use_f = alive2 * diff_m
            rad_r = rad_r + use_f * tp_r * ocx * ld_r
            rad_g = rad_g + use_f * tp_g * ocy * ld_g
            rad_b = rad_b + use_f * tp_b * ocz * ld_b

        # scatter state update (values only; rad handled in reverse)
        du1 = trow_all(depth * per_depth + 2 * L)
        du2 = trow_all(depth * per_depth + 2 * L + 1)
        urr = trow_all(depth * per_depth + 2 * L + 2)

        big_x = jnp.abs(nlx) > 0.1
        axx = jnp.where(big_x, f32(0.0), f32(1.0))
        axy = jnp.where(big_x, f32(1.0), f32(0.0))
        crx, cry, crz = (axy * nlz, -axx * nlz, axx * nly - axy * nlx)
        ux_, uy_, uz_, _ = _normalize3(crx, cry, crz)
        vx_ = nly * uz_ - nlz * uy_
        vy_ = nlz * ux_ - nlx * uz_
        vz_ = nlx * uy_ - nly * ux_
        r1 = 2.0 * jnp.pi * du1
        r2s = jnp.sqrt(du2)
        cwr = jnp.cos(r1) * r2s
        swr = jnp.sin(r1) * r2s
        wz = _safe_sqrt(1.0 - du2)
        ddx_ = ux_ * cwr + vx_ * swr + nlx * wz
        ddy_ = uy_ * cwr + vy_ * swr + nly * wz
        ddz_ = uz_ * cwr + vz_ * swr + nlz * wz

        k2 = 2.0 * _dot3(nx, ny, nz, dx, dy, dz)
        sx, sy, sz = dx - k2 * nx, dy - k2 * ny, dz - k2 * nz

        into = _dot3(nx, ny, nz, nlx, nly, nlz) > 0.0
        nnt = jnp.where(into, f32(_NC / _NT), f32(_NT / _NC))
        ddn = _dot3(dx, dy, dz, nlx, nly, nlz)
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        sgn_in = jnp.where(into, f32(1.0), f32(-1.0))
        kk = sgn_in * (ddn * nnt + _safe_sqrt(cos2t))
        mx, my, mz = nnt * dx - kk * nx, nnt * dy - kk * ny, nnt * dz - kk * nz
        tx, ty, tz, _ = _normalize3(mx, my, mz)
        r0 = f32(((_NT - _NC) / (_NT + _NC)) ** 2)
        c1 = 1.0 - jnp.where(into, -ddn, _dot3(tx, ty, tz, nx, ny, nz))
        re = r0 + (1.0 - r0) * c1 ** 5
        p_ = 0.25 + 0.5 * re
        rp = re / p_
        tp_w = (1.0 - re) / (1.0 - p_)
        take_refl = tir | (urr < p_)
        rx = jnp.where(take_refl, sx, tx)
        ry = jnp.where(take_refl, sy, ty)
        rz = jnp.where(take_refl, sz, tz)
        rr_w = jnp.where(tir, f32(1.0), jnp.where(urr < p_, rp, tp_w))

        spec_sel = orefl == f32(SPEC)
        diff_sel = orefl == f32(DIFF)
        ndx = jnp.where(diff_sel, ddx_, jnp.where(spec_sel, sx, rx))
        ndy = jnp.where(diff_sel, ddy_, jnp.where(spec_sel, sy, ry))
        ndz = jnp.where(diff_sel, ddz_, jnp.where(spec_sel, sz, rz))
        mul = jnp.where(diff_sel | spec_sel, f32(1.0), rr_w)

        live = alive2
        ox = live * hx + (1.0 - live) * ox
        oy = live * hy + (1.0 - live) * oy
        oz = live * hz + (1.0 - live) * oz
        dx = live * ndx + (1.0 - live) * dx
        dy = live * ndy + (1.0 - live) * dy
        dz = live * ndz + (1.0 - live) * dz
        tp_r = live * (tp_r * ocx * mul) + (1.0 - live) * tp_r
        tp_g = live * (tp_g * ocy * mul) + (1.0 - live) * tp_g
        tp_b = live * (tp_b * ocz * mul) + (1.0 - live) * tp_b
        spec_m = live * (1.0 - diff_m) + (1.0 - live) * spec_m
        alive_m = alive2

    # ---------------- reverse sweep -------------------------------------
    if fused_loss:
        # gr/gg/gb refs carry the TARGET; form the loss cotangent here.
        # vm masks padded lanes (they trace garbage rays). loss_kind
        # 'l2' -> mean((rad - t)^2); 'log' -> mean((log1p(rad) -
        # log1p(t))^2) (diff.gradients.log_loss) with the targets
        # shipped PRE-log1p'd by trace_pallas_loss_grad, cotangent
        # 2 e / (1 + rad) / (3n) by the chain rule (radiance is
        # non-negative by construction, so log1p is total).
        vm_ref, dloss_ref = extra_refs
        vm = vm_ref[:]
        if loss_kind == "log":
            er = (jnp.log1p(rad_r) - gr_ref[:]) * vm
            eg = (jnp.log1p(rad_g) - gg_ref[:]) * vm
            eb = (jnp.log1p(rad_b) - gb_ref[:]) * vm
        else:
            er = (rad_r - gr_ref[:]) * vm
            eg = (rad_g - gg_ref[:]) * vm
            eb = (rad_b - gb_ref[:]) * vm
        part = jnp.sum(er * er + eg * eg + eb * eb)
        cid16 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
        dloss_ref[...] = jnp.where(cid16 == 0, part, 0.0)
        k2g = f32(2.0 * inv3n)
        if loss_kind == "log":
            gr = er * k2g / (1.0 + rad_r)
            gg = eg * k2g / (1.0 + rad_g)
            gb = eb * k2g / (1.0 + rad_b)
        else:
            gr, gg, gb = er * k2g, eg * k2g, eb * k2g
    else:
        gr, gg, gb = gr_ref[:], gg_ref[:], gb_ref[:]
    bo_x = jnp.zeros(shape, f32); bo_y = jnp.zeros(shape, f32)
    bo_z = jnp.zeros(shape, f32)
    bd_x = jnp.zeros(shape, f32); bd_y = jnp.zeros(shape, f32)
    bd_z = jnp.zeros(shape, f32)
    btp_r = jnp.zeros(shape, f32); btp_g = jnp.zeros(shape, f32)
    btp_b = jnp.zeros(shape, f32)

    S = n_spheres
    # Scalar gradient accumulators: Python-dict sums keep the graph small
    # (one insert per written cell at kernel end instead of a chain of
    # dynamic-update-slices per depth).
    acc_tab: dict = {}
    acc_vpl: dict = {}

    def add_tab(s, c, v):
        acc_tab[(s, c)] = acc_tab[(s, c)] + v if (s, c) in acc_tab else v

    def add_vpl(v_, c, val):
        acc_vpl[(v_, c)] = (acc_vpl[(v_, c)] + val
                            if (v_, c) in acc_vpl else val)

    for depth in reversed(range(D)):
        sv = saved[depth]
        ox, oy, oz = sv["ox"], sv["oy"], sv["oz"]
        dx, dy, dz = sv["dx"], sv["dy"], sv["dz"]
        tp_r, tp_g, tp_b = sv["tp_r"], sv["tp_g"], sv["tp_b"]
        alive_in, spec_in = sv["alive_m"], sv["spec_m"]
        hit_m, t, best_id = sv["hit_m"], sv["t"], sv["best_id"]

        # --- recompute hit attrs / local geometry (identical to fwd)
        opx = jnp.zeros(shape, f32); opy = jnp.zeros(shape, f32)
        opz = jnp.zeros(shape, f32)
        oex = jnp.zeros(shape, f32); oey = jnp.zeros(shape, f32)
        oez = jnp.zeros(shape, f32)
        ocx = jnp.zeros(shape, f32); ocy = jnp.zeros(shape, f32)
        ocz = jnp.zeros(shape, f32)
        orefl = jnp.zeros(shape, f32)
        orad = jnp.zeros(shape, f32)
        for s in range(n_spheres):
            sel = best_id == f32(s)
            orad = jnp.where(sel, sph(s, 0), orad)
            opx = jnp.where(sel, sph(s, 1), opx)
            opy = jnp.where(sel, sph(s, 2), opy)
            opz = jnp.where(sel, sph(s, 3), opz)
            oex = jnp.where(sel, sph(s, 4), oex)
            oey = jnp.where(sel, sph(s, 5), oey)
            oez = jnp.where(sel, sph(s, 6), oez)
            ocx = jnp.where(sel, sph(s, 7), ocx)
            ocy = jnp.where(sel, sph(s, 8), ocy)
            ocz = jnp.where(sel, sph(s, 9), ocz)
            orefl = jnp.where(sel, sph(s, 10), orefl)

        hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
        snx, sny, snz = hx - opx, hy - opy, hz - opz
        nx, ny, nz, inv_n = _normalize3(snx, sny, snz)
        dp = _dot3(nx, ny, nz, dx, dy, dz)
        flip = jnp.where(dp > 0.0, f32(-1.0), f32(1.0))
        nlx, nly, nlz = flip * nx, flip * ny, flip * nz

        emit_m = _f32m((oex != 0.0) | (oey != 0.0) | (oez != 0.0))
        alive1 = alive_in * hit_m
        alive2 = alive1 * (1.0 - emit_m)
        diff_m = _f32m(orefl == f32(DIFF))
        spec_sel_m = _f32m(orefl == f32(SPEC))
        refr_m = (1.0 - diff_m) * (1.0 - spec_sel_m)
        add_m = alive1 * emit_m * spec_in
        use_m = alive2 * diff_m
        live = alive2

        du1 = trow_all(depth * per_depth + 2 * L)
        du2 = trow_all(depth * per_depth + 2 * L + 1)
        urr = trow_all(depth * per_depth + 2 * L + 2)

        # --- recompute scatter internals (needed for both value & adjoint)
        big_x = jnp.abs(nlx) > 0.1
        axx = jnp.where(big_x, f32(0.0), f32(1.0))
        axy = jnp.where(big_x, f32(1.0), f32(0.0))
        crx, cry, crz = (axy * nlz, -axx * nlz, axx * nly - axy * nlx)
        ux_, uy_, uz_, inv_u = _normalize3(crx, cry, crz)
        vx_ = nly * uz_ - nlz * uy_
        vy_ = nlz * ux_ - nlx * uz_
        vz_ = nlx * uy_ - nly * ux_
        r1 = 2.0 * jnp.pi * du1
        r2s = jnp.sqrt(du2)
        cwr = jnp.cos(r1) * r2s
        swr = jnp.sin(r1) * r2s
        wz = _safe_sqrt(1.0 - du2)

        k2 = 2.0 * dp
        sx_, sy_, sz_ = dx - k2 * nx, dy - k2 * ny, dz - k2 * nz

        into = _dot3(nx, ny, nz, nlx, nly, nlz) > 0.0
        into_m = _f32m(into)
        nnt = jnp.where(into, f32(_NC / _NT), f32(_NT / _NC))
        ddn = _dot3(dx, dy, dz, nlx, nly, nlz)
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        sgn_in = jnp.where(into, f32(1.0), f32(-1.0))
        sq_c = _safe_sqrt(cos2t)
        kk = sgn_in * (ddn * nnt + sq_c)
        mx, my, mz = nnt * dx - kk * nx, nnt * dy - kk * ny, nnt * dz - kk * nz
        tx, ty, tz, inv_m = _normalize3(mx, my, mz)
        r0 = f32(((_NT - _NC) / (_NT + _NC)) ** 2)
        c1 = 1.0 - jnp.where(into, -ddn, _dot3(tx, ty, tz, nx, ny, nz))
        re = r0 + (1.0 - r0) * c1 ** 5
        p_ = 0.25 + 0.5 * re
        take_m = _f32m(tir | (urr < p_))
        tir_m = _f32m(tir)
        rr_sel_m = _f32m(jnp.logical_not(tir) & (urr < p_))   # took reflect by RR
        tp_sel_m = _f32m(jnp.logical_not(tir) & (urr >= p_))  # took transmit
        mul = (diff_m + spec_sel_m) * 1.0 + refr_m * (
            tir_m * 1.0 + rr_sel_m * (re / p_) + tp_sel_m * ((1.0 - re)
                                                             / (1.0 - p_)))

        # ================= adjoint accumulators (per-lane) ===============
        bhp_x = jnp.zeros(shape, f32); bhp_y = jnp.zeros(shape, f32)
        bhp_z = jnp.zeros(shape, f32)
        bnl_x = jnp.zeros(shape, f32); bnl_y = jnp.zeros(shape, f32)
        bnl_z = jnp.zeros(shape, f32)
        bn_x = jnp.zeros(shape, f32); bn_y = jnp.zeros(shape, f32)
        bn_z = jnp.zeros(shape, f32)
        bdp = jnp.zeros(shape, f32)
        bdk_x = jnp.zeros(shape, f32); bdk_y = jnp.zeros(shape, f32)
        bdk_z = jnp.zeros(shape, f32)
        bok_x = jnp.zeros(shape, f32); bok_y = jnp.zeros(shape, f32)
        bok_z = jnp.zeros(shape, f32)
        btpk_r = jnp.zeros(shape, f32); btpk_g = jnp.zeros(shape, f32)
        btpk_b = jnp.zeros(shape, f32)
        # per-lane hit-sphere grads (reduced per sphere at depth end)
        bP_x = jnp.zeros(shape, f32); bP_y = jnp.zeros(shape, f32)
        bP_z = jnp.zeros(shape, f32)
        bR = jnp.zeros(shape, f32)
        bE_x = jnp.zeros(shape, f32); bE_y = jnp.zeros(shape, f32)
        bE_z = jnp.zeros(shape, f32)
        bC_x = jnp.zeros(shape, f32); bC_y = jnp.zeros(shape, f32)
        bC_z = jnp.zeros(shape, f32)

        # --- 1. state pass-throughs --------------------------------------
        # o_{k+1} = live*hp + (1-live)*o_k
        bhp_x += live * bo_x; bhp_y += live * bo_y; bhp_z += live * bo_z
        bok_x += (1.0 - live) * bo_x
        bok_y += (1.0 - live) * bo_y
        bok_z += (1.0 - live) * bo_z
        # d_{k+1} = live*nd + (1-live)*d_k
        bnd_x = live * bd_x; bnd_y = live * bd_y; bnd_z = live * bd_z
        bdk_x += (1.0 - live) * bd_x
        bdk_y += (1.0 - live) * bd_y
        bdk_z += (1.0 - live) * bd_z
        # tp_{k+1} = live*(tp*oc*mul) + (1-live)*tp
        btpk_r += btp_r * (live * ocx * mul + (1.0 - live))
        btpk_g += btp_g * (live * ocy * mul + (1.0 - live))
        btpk_b += btp_b * (live * ocz * mul + (1.0 - live))
        bC_x += live * btp_r * tp_r * mul
        bC_y += live * btp_g * tp_g * mul
        bC_z += live * btp_b * tp_b * mul
        bmul = live * (btp_r * tp_r * ocx + btp_g * tp_g * ocy
                       + btp_b * tp_b * ocz)

        # --- 2. emitter-hit term: rad += add * scale*|dp| * e * tp -------
        esc = f32(cfg.emission_scale)
        absdp = jnp.abs(dp)
        bE_x += add_m * esc * absdp * tp_r * gr
        bE_y += add_m * esc * absdp * tp_g * gg
        bE_z += add_m * esc * absdp * tp_b * gb
        btpk_r += add_m * esc * absdp * oex * gr
        btpk_g += add_m * esc * absdp * oey * gg
        btpk_b += add_m * esc * absdp * oez * gb
        babs = add_m * esc * (oex * tp_r * gr + oey * tp_g * gg
                              + oez * tp_b * gb)
        bdp += babs * jnp.where(dp > 0.0, f32(1.0), f32(-1.0))

        # --- 3. NEE + VPL gather: rad += use * (tp*oc) * ld --------------
        # recompute ld (direct part values feed the td adjoint)
        ld_r = jnp.zeros(shape, f32)
        ld_g = jnp.zeros(shape, f32)
        ld_b = jnp.zeros(shape, f32)
        nee_res = []
        for li, lig in enumerate(light_idx):
            u1 = trow_all(depth * per_depth + li)
            u2 = trow_all(depth * per_depth + L + li)
            lrad = sph(lig, 0)
            lpx, lpy, lpz = sph(lig, 1), sph(lig, 2), sph(lig, 3)
            zz = 1.0 - 2.0 * u1
            rr_ = _safe_sqrt(1.0 - zz * zz)
            phi = 2.0 * jnp.pi * u2
            uxs, uys, uzs = rr_ * jnp.cos(phi), rr_ * jnp.sin(phi), zz
            spx = lpx + lrad * uxs
            spy = lpy + lrad * uys
            spz = lpz + lrad * uzs
            rwx, rwy, rwz = spx - hx, spy - hy, spz - hz
            q = _dot3(rwx, rwy, rwz, rwx, rwy, rwz) + 1e-30
            slen = jnp.sqrt(q)
            inv = 1.0 / slen
            sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
            wo = -_dot3(sdx, sdy, sdz, uxs, uys, uzs)
            wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
            maxt = slen - EPSILON
            soft = jnp.ones(shape, f32)
            if fused_loss:
                # Occlusion is a DETACHED fact the fused forward sweep
                # already computed — reuse it; only the (vis) soft
                # product still needs its per-blocker pass.
                occ = sv["occ_l"][li] > 0.5
            else:
                occ = jnp.zeros(shape, bool)
            for s in range(n_spheres):
                if not fused_loss:
                    ts, _ = _sphere_t_fwd(sph(s, 1), sph(s, 2), sph(s, 3),
                                          sph(s, 0), hx, hy, hz,
                                          sdx, sdy, sdz)
                    occ = occ | ((ts > 0.0) & (ts < maxt))
                # s == lig: the target light's chord entry IS the sample
                # point — excluded from the soft product (see
                # intersect.soft_visibility exclude_id).
                if vis and s != lig:
                    edge, gate_b, endp, _, _, _, _ = vis_terms(
                        s, hx, hy, hz, sdx, sdy, sdz, maxt)
                    soft = soft * (1.0 - edge * endp * gate_b)
            ok_m = _f32m((wo >= 0.0) & (wi > 0.0) & jnp.logical_not(occ))
            inv2 = inv * inv
            core = (4.0 * jnp.pi) * (lrad * lrad) * wi * wo * inv2
            scale = ok_m * f32(cfg.light_gain) * core
            ld_r = ld_r + sph(lig, 4) * scale
            ld_g = ld_g + sph(lig, 5) * scale
            ld_b = ld_b + sph(lig, 6) * scale
            nee_res.append((lig, uxs, uys, uzs, rwx, rwy, rwz, inv, wi, wo,
                            ok_m, scale, core, soft))

        vpl_res = []
        if use_vpl and n_vpl > 0:
            v_r = jnp.zeros(shape, f32)
            v_g = jnp.zeros(shape, f32)
            v_b = jnp.zeros(shape, f32)
            for v in range(n_vpl):
                vhx, vhy, vhz = vpl_ref[v, 0], vpl_ref[v, 1], vpl_ref[v, 2]
                vrx, vry, vrz = vpl_ref[v, 3], vpl_ref[v, 4], vpl_ref[v, 5]
                vnx, vny, vnz = vpl_ref[v, 6], vpl_ref[v, 7], vpl_ref[v, 8]
                vvalid = vpl_ref[v, 9] > 0.5
                rwx, rwy, rwz = vhx - hx, vhy - hy, vhz - hz
                q = _dot3(rwx, rwy, rwz, rwx, rwy, rwz) + 1e-30
                slen = jnp.sqrt(q)
                inv = 1.0 / slen
                sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
                wo = -_dot3(sdx, sdy, sdz, vnx, vny, vnz)
                wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
                maxt = slen - EPSILON
                soft = jnp.ones(shape, f32)
                if fused_loss:
                    # Saved detached fact (see NEE loop above).
                    occ = sv["occ_v"][v] > 0.5
                else:
                    occ = jnp.zeros(shape, bool)
                for s in range(n_spheres):
                    nonlite = (sph(s, 4) == 0.0) & (sph(s, 5) == 0.0) & (
                        sph(s, 6) == 0.0)
                    if not fused_loss:
                        ts, _ = _sphere_t_fwd(sph(s, 1), sph(s, 2),
                                              sph(s, 3), sph(s, 0),
                                              hx, hy, hz, sdx, sdy, sdz)
                        blocked = (ts > 0.0) & (ts < maxt)
                        occ = occ | (blocked & nonlite)
                    if vis:
                        edge, gate_b, endp, _, _, _, _ = vis_terms(
                            s, hx, hy, hz, sdx, sdy, sdz, maxt)
                        # host-sphere exclusion (vpl table col 10)
                        not_host = _f32m(f32(s) != vpl_ref[v, 10])
                        soft = soft * (1.0 - edge * endp * gate_b
                                       * _f32m(nonlite) * not_host)
                ok_m = _f32m((wo >= 0.0) & (wi > 0.0)
                             & jnp.logical_not(occ) & vvalid)
                ok_vis = _f32m((wo >= 0.0) & (wi > 0.0) & vvalid)
                w = ok_m * wi * wo
                v_r = v_r + vrx * w
                v_g = v_g + vry * w
                v_b = v_b + vrz * w
                vpl_res.append((v, vrx, vry, vrz, rwx, rwy, rwz, inv,
                                wi, wo, ok_m, w, ok_vis, soft))
            inv_k = f32(1.0 / n_vpl)
            ld_r = ld_r + v_r * inv_k
            ld_g = ld_g + v_g * inv_k
            ld_b = ld_b + v_b * inv_k
            if cfg.combine_half:
                ld_r, ld_g, ld_b = ld_r * 0.5, ld_g * 0.5, ld_b * 0.5

        # rad += use * (tp*oc) * ld
        btd_r = use_m * ld_r * gr
        btd_g = use_m * ld_g * gg
        btd_b = use_m * ld_b * gb
        btpk_r += btd_r * ocx
        btpk_g += btd_g * ocy
        btpk_b += btd_b * ocz
        bC_x += btd_r * tp_r
        bC_y += btd_g * tp_g
        bC_z += btd_b * tp_b
        bld_r = use_m * tp_r * ocx * gr
        bld_g = use_m * tp_g * ocy * gg
        bld_b = use_m * tp_b * ocz * gb
        half = 0.5 if (use_vpl and n_vpl > 0 and cfg.combine_half) else 1.0
        # direct part shares the same 0.5 combine as the VPL part
        bld_dir_r, bld_dir_g, bld_dir_b = (bld_r * half, bld_g * half,
                                           bld_b * half)

        for (lig, uxs, uys, uzs, rwx, rwy, rwz, inv, wi, wo, ok_m,
             scale, core, soft) in nee_res:
            lrad = sph(lig, 0)
            le_r, le_g, le_b = sph(lig, 4), sph(lig, 5), sph(lig, 6)
            # ld_ch += e_ch * scale
            be_r = jnp.sum(bld_dir_r * scale)
            be_g = jnp.sum(bld_dir_g * scale)
            be_b = jnp.sum(bld_dir_b * scale)
            bscale = (bld_dir_r * le_r + bld_dir_g * le_g
                      + bld_dir_b * le_b)
            bcore = bscale * ok_m * f32(cfg.light_gain)
            inv2 = inv * inv
            C = (4.0 * jnp.pi) * (lrad * lrad)
            bwi = bcore * C * wo * inv2
            bwo = bcore * C * wi * inv2
            bC_l = bcore * wi * wo * inv2          # d/d(4 pi r^2)
            binv = bcore * C * wi * wo * 2.0 * inv  # via inv2 = inv*inv
            # wi = sdir.nl ; wo = -(sdir.usp)
            sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
            bsd_x = bwi * nlx - bwo * uxs
            bsd_y = bwi * nly - bwo * uys
            bsd_z = bwi * nlz - bwo * uzs
            bnl_x += bwi * sdx; bnl_y += bwi * sdy; bnl_z += bwi * sdz
            bmaxt_lane = jnp.zeros(shape, f32)
            if vis:
                # Visibility carrier: rad += stop(contrib) * soft (the
                # zero-primal term of direct.py:113-124). bsoft is the
                # per-lane cotangent of soft; each blocker's det then
                # routes into its p/rad AND into the shadow segment
                # (hp via op, sdir via b, maxt via the two-sided endpoint
                # sigmoid) exactly as XLA's autodiff of
                # intersect.soft_visibility does.
                ok_vis = _f32m((wo >= 0.0) & (wi > 0.0))
                bsoft = (bld_dir_r * le_r + bld_dir_g * le_g
                         + bld_dir_b * le_b) * f32(cfg.light_gain) \
                    * core * ok_vis
                maxt = 1.0 / inv - EPSILON
                for s in range(n_spheres):
                    if s == lig:   # target light excluded (see fwd loop)
                        continue
                    edge, gate_b, endp, width, b_s, det_s, op_s = \
                        vis_terms(s, hx, hy, hz, sdx, sdy, sdz, maxt)
                    (bop_x, bop_y, bop_z, bsdd_x, bsdd_y, bsdd_z,
                     brad2, bmx) = vis_blocker_adj(
                        bsoft, soft, edge, gate_b, endp, width, b_s,
                        det_s, op_s, sdx, sdy, sdz)
                    bhp_x -= bop_x; bhp_y -= bop_y; bhp_z -= bop_z
                    bsd_x += bsdd_x
                    bsd_y += bsdd_y
                    bsd_z += bsdd_z
                    bmaxt_lane += bmx
                    add_tab(s, 0, jnp.sum(sph(s, 0) * brad2))
                    add_tab(s, 1, jnp.sum(bop_x))
                    add_tab(s, 2, jnp.sum(bop_y))
                    add_tab(s, 3, jnp.sum(bop_z))
            # sdir = raw * inv
            brw_x = bsd_x * inv
            brw_y = bsd_y * inv
            brw_z = bsd_z * inv
            binv += _dot3(bsd_x, bsd_y, bsd_z, rwx, rwy, rwz)
            # maxt = 1/inv - eps (the endpoint sigmoid's segment-length
            # gradient): d maxt / d inv = -inv^-2
            binv += bmaxt_lane * (-1.0 / (inv * inv))
            # inv = 1/sqrt(q): bq = -0.5 inv^3 binv
            bq = -0.5 * (inv * inv * inv) * binv
            brw_x += 2.0 * rwx * bq
            brw_y += 2.0 * rwy * bq
            brw_z += 2.0 * rwz * bq
            # raw = (lp + r*usp) - hp
            bhp_x -= brw_x; bhp_y -= brw_y; bhp_z -= brw_z
            blp_x = jnp.sum(brw_x)
            blp_y = jnp.sum(brw_y)
            blp_z = jnp.sum(brw_z)
            brl = jnp.sum(_dot3(brw_x, brw_y, brw_z, uxs, uys, uzs)
                          + bC_l * (8.0 * jnp.pi) * lrad)
            add_tab(lig, 0, brl)
            add_tab(lig, 1, blp_x)
            add_tab(lig, 2, blp_y)
            add_tab(lig, 3, blp_z)
            add_tab(lig, 4, be_r)
            add_tab(lig, 5, be_g)
            add_tab(lig, 6, be_b)

        if use_vpl and n_vpl > 0:
            inv_k = f32(1.0 / n_vpl)
            bv_r = bld_r * half * inv_k
            bv_g = bld_g * half * inv_k
            bv_b = bld_b * half * inv_k
            for (v, vrx, vry, vrz, rwx, rwy, rwz, inv, wi, wo, ok_m,
                 w, ok_vis, soft) in vpl_res:
                vnx, vny, vnz = vpl_ref[v, 6], vpl_ref[v, 7], vpl_ref[v, 8]
                # v_ch += vrad_ch * w
                bvr_r = jnp.sum(bv_r * w)
                bvr_g = jnp.sum(bv_g * w)
                bvr_b = jnp.sum(bv_b * w)
                bw = (bv_r * vrx + bv_g * vry + bv_b * vrz) * ok_m
                bwi = bw * wo
                bwo = bw * wi
                sdx, sdy, sdz = rwx * inv, rwy * inv, rwz * inv
                bsd_x = bwi * nlx - bwo * vnx
                bsd_y = bwi * nly - bwo * vny
                bsd_z = bwi * nlz - bwo * vnz
                bnl_x += bwi * sdx; bnl_y += bwi * sdy; bnl_z += bwi * sdz
                bvn_x = jnp.sum(-bwo * sdx)
                bvn_y = jnp.sum(-bwo * sdy)
                bvn_z = jnp.sum(-bwo * sdz)
                bmaxt_lane = jnp.zeros(shape, f32)
                if vis:
                    # Virtual-shadow-ray carrier (direct.py:187-196):
                    # vacuum soft — emitters never block, so their gate
                    # factor zeroes both the forward product and bdet.
                    bsoft = (bv_r * vrx + bv_g * vry + bv_b * vrz) \
                        * ok_vis * wi * wo
                    maxt = 1.0 / inv - EPSILON
                    for s in range(n_spheres):
                        edge, gate_b, endp, width, b_s, det_s, op_s = \
                            vis_terms(s, hx, hy, hz, sdx, sdy, sdz, maxt)
                        nonlite = _f32m((sph(s, 4) == 0.0)
                                        & (sph(s, 5) == 0.0)
                                        & (sph(s, 6) == 0.0))
                        not_host = _f32m(f32(s) != vpl_ref[v, 10])
                        (bop_x, bop_y, bop_z, bsdd_x, bsdd_y, bsdd_z,
                         brad2, bmx) = vis_blocker_adj(
                            bsoft, soft, edge, gate_b * nonlite * not_host,
                            endp, width, b_s, det_s, op_s, sdx, sdy, sdz)
                        bhp_x -= bop_x; bhp_y -= bop_y; bhp_z -= bop_z
                        bsd_x += bsdd_x
                        bsd_y += bsdd_y
                        bsd_z += bsdd_z
                        bmaxt_lane += bmx
                        add_tab(s, 0, jnp.sum(sph(s, 0) * brad2))
                        add_tab(s, 1, jnp.sum(bop_x))
                        add_tab(s, 2, jnp.sum(bop_y))
                        add_tab(s, 3, jnp.sum(bop_z))
                brw_x = bsd_x * inv
                brw_y = bsd_y * inv
                brw_z = bsd_z * inv
                binv = _dot3(bsd_x, bsd_y, bsd_z, rwx, rwy, rwz) \
                    + bmaxt_lane * (-1.0 / (inv * inv))
                bq = -0.5 * (inv * inv * inv) * binv
                brw_x += 2.0 * rwx * bq
                brw_y += 2.0 * rwy * bq
                brw_z += 2.0 * rwz * bq
                bhp_x -= brw_x; bhp_y -= brw_y; bhp_z -= brw_z
                add_vpl(v, 0, jnp.sum(brw_x))
                add_vpl(v, 1, jnp.sum(brw_y))
                add_vpl(v, 2, jnp.sum(brw_z))
                add_vpl(v, 3, bvr_r)
                add_vpl(v, 4, bvr_g)
                add_vpl(v, 5, bvr_b)
                add_vpl(v, 6, bvn_x)
                add_vpl(v, 7, bvn_y)
                add_vpl(v, 8, bvn_z)

        # --- 4. scatter adjoints -----------------------------------------
        # nd = select(diff, dd, select(spec, s, take?s:t)); branch detached
        bdd_x = bnd_x * diff_m
        bdd_y = bnd_y * diff_m
        bdd_z = bnd_z * diff_m
        bs_x = bnd_x * (spec_sel_m + refr_m * take_m)
        bs_y = bnd_y * (spec_sel_m + refr_m * take_m)
        bs_z = bnd_z * (spec_sel_m + refr_m * take_m)
        bt_x = bnd_x * refr_m * (1.0 - take_m)
        bt_y = bnd_y * refr_m * (1.0 - take_m)
        bt_z = bnd_z * refr_m * (1.0 - take_m)
        brr_w = bmul * refr_m

        # rr_w branches: d rp/d re = 0.25/p^2 ; d tp_w/d re = -0.25/(1-p)^2
        bre = brr_w * (rr_sel_m * (0.25 / (p_ * p_))
                       + tp_sel_m * (-0.25 / ((1.0 - p_) * (1.0 - p_))))
        bc1 = bre * (1.0 - r0) * 5.0 * (c1 ** 4)
        bddn = bc1 * into_m
        bt_x += -bc1 * (1.0 - into_m) * nx
        bt_y += -bc1 * (1.0 - into_m) * ny
        bt_z += -bc1 * (1.0 - into_m) * nz
        bn_x += -bc1 * (1.0 - into_m) * tx
        bn_y += -bc1 * (1.0 - into_m) * ty
        bn_z += -bc1 * (1.0 - into_m) * tz

        # trans_dir = normalize(m)
        bm_x, bm_y, bm_z = _normalize_adj(mx, my, mz, inv_m,
                                          bt_x, bt_y, bt_z)
        bdk_x += nnt * bm_x; bdk_y += nnt * bm_y; bdk_z += nnt * bm_z
        bkk = -(bm_x * nx + bm_y * ny + bm_z * nz)
        bn_x += -kk * bm_x; bn_y += -kk * bm_y; bn_z += -kk * bm_z
        # kk = sgn*(ddn*nnt + safe_sqrt(cos2t)); cos2t = 1-nnt^2(1-ddn^2)
        bddn += bkk * sgn_in * nnt
        pos_c = cos2t > 0.0
        dsq_c = jnp.where(pos_c,
                          0.5 / jnp.sqrt(jnp.where(pos_c, cos2t, 1.0)), 0.0)
        bddn += bkk * sgn_in * dsq_c * (2.0 * nnt * nnt * ddn)
        # ddn = d.nl
        bdk_x += bddn * nlx; bdk_y += bddn * nly; bdk_z += bddn * nlz
        bnl_x += bddn * dx; bnl_y += bddn * dy; bnl_z += bddn * dz

        # spec: s = d - k2*n, k2 = 2(n.d)
        bdk_x += bs_x; bdk_y += bs_y; bdk_z += bs_z
        bk2 = -(bs_x * nx + bs_y * ny + bs_z * nz)
        bn_x += -k2 * bs_x; bn_y += -k2 * bs_y; bn_z += -k2 * bs_z
        bdp_spec = 2.0 * bk2          # k2 = 2*dp
        bdp += bdp_spec

        # diff: dd = u*cwr + v*swr + nl*wz
        bu_x = bdd_x * cwr; bu_y = bdd_y * cwr; bu_z = bdd_z * cwr
        bv_x = bdd_x * swr; bv_y = bdd_y * swr; bv_z = bdd_z * swr
        bnl_x += bdd_x * wz; bnl_y += bdd_y * wz; bnl_z += bdd_z * wz
        # v = nl x u  (c = a x b: ba = b x bc, bb = bc x a)
        bnl_x += uy_ * bv_z - uz_ * bv_y
        bnl_y += uz_ * bv_x - ux_ * bv_z
        bnl_z += ux_ * bv_y - uy_ * bv_x
        bu_x += bv_y * nlz - bv_z * nly
        bu_y += bv_z * nlx - bv_x * nlz
        bu_z += bv_x * nly - bv_y * nlx
        # u = normalize(cr), cr = a_h x nl
        bcr_x, bcr_y, bcr_z = _normalize_adj(crx, cry, crz, inv_u,
                                             bu_x, bu_y, bu_z)
        # cr = a x nl with a=(axx,axy,0): bnl += bcr x a
        bnl_x += bcr_y * 0.0 - bcr_z * axy
        bnl_y += bcr_z * axx - bcr_x * 0.0
        bnl_z += bcr_x * axy - bcr_y * axx

        # --- 5. normal / hit-point chains ---------------------------------
        # nl = flip * n (flip detached)
        bn_x += flip * bnl_x; bn_y += flip * bnl_y; bn_z += flip * bnl_z
        # dp = n.d
        bn_x += bdp * dx; bn_y += bdp * dy; bn_z += bdp * dz
        bdk_x += bdp * nx; bdk_y += bdp * ny; bdk_z += bdp * nz
        # n = normalize(hp - op)
        bsn_x, bsn_y, bsn_z = _normalize_adj(snx, sny, snz, inv_n,
                                             bn_x, bn_y, bn_z)
        bhp_x += bsn_x; bhp_y += bsn_y; bhp_z += bsn_z
        bP_x -= bsn_x; bP_y -= bsn_y; bP_z -= bsn_z
        # hp = o + t*d
        bok_x += bhp_x; bok_y += bhp_y; bok_z += bhp_z
        bdk_x += t * bhp_x; bdk_y += t * bhp_y; bdk_z += t * bhp_z
        bt_lane = _dot3(bhp_x, bhp_y, bhp_z, dx, dy, dz)
        # t = where(hit, t_raw, 1)
        bt_raw = hit_m * bt_lane
        _, res_q = _sphere_t_fwd(opx, opy, opz, orad, ox, oy, oz, dx, dy, dz)
        (aox, aoy, aoz, adx, ady, adz,
         apx, apy, apz, ar) = _sphere_t_adj(res_q, dx, dy, dz, orad, bt_raw)
        bok_x += aox; bok_y += aoy; bok_z += aoz
        bdk_x += adx; bdk_y += ady; bdk_z += adz
        bP_x += apx; bP_y += apy; bP_z += apz
        bR += ar

        # --- 6. per-sphere reductions of hit-slot grads --------------------
        # e-grads only land on emitter slots (add_m masks non-emitters to
        # zero and the emitter set is static = light_idx), so skip the
        # reduction for the rest.
        for s in range(n_spheres):
            sel = _f32m(best_id == f32(s))
            add_tab(s, 0, jnp.sum(sel * bR))
            add_tab(s, 1, jnp.sum(sel * bP_x))
            add_tab(s, 2, jnp.sum(sel * bP_y))
            add_tab(s, 3, jnp.sum(sel * bP_z))
            if s in light_idx:
                add_tab(s, 4, jnp.sum(sel * bE_x))
                add_tab(s, 5, jnp.sum(sel * bE_y))
                add_tab(s, 6, jnp.sum(sel * bE_z))
            add_tab(s, 7, jnp.sum(sel * bC_x))
            add_tab(s, 8, jnp.sum(sel * bC_y))
            add_tab(s, 9, jnp.sum(sel * bC_z))

        bo_x, bo_y, bo_z = bok_x, bok_y, bok_z
        bd_x, bd_y, bd_z = bdk_x, bdk_y, bdk_z
        btp_r, btp_g, btp_b = btpk_r, btpk_g, btpk_b

    # Materialize the scalar accumulators into the [S,16]/[V,16] blocks
    # with one-hot masks (Mosaic has no scatter; iota-compare masks are
    # compile-time constants and the adds fuse on the VPU).
    def materialize(acc, rows):
        rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 16), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (rows, 16), 1)
        out = jnp.zeros((rows, 16), f32)
        for (r, c), v in acc.items():
            m = ((rid == r) & (cid == c)).astype(f32)
            out = out + v * m
        return out

    dtab_ref[0] = materialize(acc_tab, S)
    dvpl_ref[0] = materialize(acc_vpl, max(n_vpl, 1))
    dox_ref[:] = bo_x
    doy_ref[:] = bo_y
    doz_ref[:] = bo_z
    ddx_ref[:] = bd_x
    ddy_ref[:] = bd_y
    ddz_ref[:] = bd_z


@functools.lru_cache(maxsize=None)
def _diff_core(cfg: IntegratorConfig, light_idx: tuple[int, ...],
               n_spheres: int, n_vpl: int, use_vpl: bool,
               tile_rows: int, rows_total: int, interpret: bool,
               inline_tape: bool = False):
    """custom_vjp over plain float arrays (scene table, vpl table, tape,
    six ray planes) -> three radiance planes. Cached per static config."""
    L = max(len(light_idx), 1)
    _, k_total = _tape_rows(cfg, L)
    n_tiles = rows_total // tile_rows
    rb_ = _row_block(tile_rows)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tape_spec = (full if inline_tape else
                 pl.BlockSpec((k_total, tile_rows, _LANES),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM))

    def fwd_call(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz):
        kernel = functools.partial(
            _kernel, cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
            n_vpl=n_vpl, use_vpl=use_vpl, tile_rows=tile_rows,
            inline_tape=inline_tape)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[full, full, tape_spec, rb_, rb_, rb_, rb_, rb_, rb_],
            out_specs=(rb_, rb_, rb_),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                for _ in range(3)),
            interpret=interpret,
        )(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz)

    @jax.custom_vjp
    def f(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz):
        return fwd_call(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz)

    def f_fwd(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz):
        out = fwd_call(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz)
        return out, (tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz)

    def f_bwd(res, g):
        tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz = res
        gr, gg, gb = g
        kernel = functools.partial(
            _bwd_kernel, cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
            n_vpl=n_vpl, use_vpl=use_vpl, inline_tape=inline_tape)
        nv = max(n_vpl, 1)
        dtab_t, dvpl_t, dox, doy, doz, ddx, ddy, ddz = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[full, full, tape_spec,
                      rb_, rb_, rb_, rb_, rb_, rb_,    # rays
                      rb_, rb_, rb_],                  # cotangents
            out_specs=(
                pl.BlockSpec((1, n_spheres, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nv, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                rb_, rb_, rb_, rb_, rb_, rb_),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, n_spheres, 16), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nv, 16), jnp.float32),
                *(jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                  for _ in range(6))),
            interpret=interpret,
        )(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz, gr, gg, gb)
        dtab = jnp.sum(dtab_t, axis=0)
        dvpl = jnp.sum(dvpl_t, axis=0)
        # refl (col 10) and padding are non-differentiable
        dtab = dtab.at[:, 10:].set(0.0)
        if not (use_vpl and n_vpl > 0):
            dvpl = jnp.zeros_like(vpl_tab)
        else:
            dvpl = dvpl.at[:, 9:].set(0.0)
        return (dtab, dvpl, jnp.zeros_like(tape),
                dox, doy, doz, ddx, ddy, ddz)

    f.defvjp(f_fwd, f_bwd)
    return f


def _fused_kernel(scene_ref, vpl_ref, tape_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tr_ref, tg_ref, tb_ref, vm_ref,
                  dtab_ref, dvpl_ref,
                  dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
                  dloss_ref, *, cfg: IntegratorConfig,
                  light_idx: tuple[int, ...], n_spheres: int, n_vpl: int,
                  use_vpl: bool, inv3n: float,
                  inline_tape: bool = False, loss_kind: str = "l2"):
    """Fused training-step kernel (l2 or log loss): `_bwd_kernel` in
    fused_loss mode (targets in, loss partial + gradients out; no
    separate forward kernel)."""
    _bwd_kernel(scene_ref, vpl_ref, tape_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tr_ref, tg_ref, tb_ref,
                dtab_ref, dvpl_ref,
                dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
                vm_ref, dloss_ref,
                cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
                n_vpl=n_vpl, use_vpl=use_vpl,
                fused_loss=True, inv3n=inv3n, inline_tape=inline_tape,
                loss_kind=loss_kind)


@functools.lru_cache(maxsize=None)
def _fused_core(cfg: IntegratorConfig, light_idx: tuple[int, ...],
                n_spheres: int, n_vpl: int, use_vpl: bool,
                tile_rows: int, rows_total: int, n_true: int,
                interpret: bool, inline_tape: bool = False,
                loss_kind: str = "l2"):
    """The fused loss+grad pallas_call, cached per static config."""
    L = max(len(light_idx), 1)
    _, k_total = _tape_rows(cfg, L)
    n_tiles = rows_total // tile_rows
    rb_ = _row_block(tile_rows)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tape_spec = (full if inline_tape else
                 pl.BlockSpec((k_total, tile_rows, _LANES),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM))
    nv = max(n_vpl, 1)
    kernel = functools.partial(
        _fused_kernel, cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
        n_vpl=n_vpl, use_vpl=use_vpl, inv3n=1.0 / (3.0 * n_true),
        inline_tape=inline_tape, loss_kind=loss_kind)

    def call(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz, tr, tg, tb, vm):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[full, full, tape_spec,
                      rb_, rb_, rb_, rb_, rb_, rb_,    # rays
                      rb_, rb_, rb_, rb_],             # target + validity
            out_specs=(
                pl.BlockSpec((1, n_spheres, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nv, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                rb_, rb_, rb_, rb_, rb_, rb_,
                # 3-D like the dtab block: a (1, 16) 2-D block violates
                # Mosaic's (8, 128)-divisible-or-full rule on hardware
                # (interpret mode does not check it).
                pl.BlockSpec((1, 1, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, n_spheres, 16), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, nv, 16), jnp.float32),
                *(jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                  for _ in range(6)),
                jax.ShapeDtypeStruct((n_tiles, 1, 16), jnp.float32)),
            interpret=interpret,
        )(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz, tr, tg, tb, vm)

    return call


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx",
                                             "tile_rows", "interpret",
                                             "lane_total", "loss"))
def trace_pallas_loss_grad(scene: Scene, cfg: IntegratorConfig,
                           light_idx: tuple[int, ...], rays: Rays,
                           key: Array, sample: Array, target: Array,
                           vpls: VplBuffer | None = None,
                           vlp_index: Array | None = None,
                           tile_rows: int = 16, interpret: bool = False,
                           lane_offset=None, lane_total: int | None = None,
                           loss: str = "l2"):
    """The FUSED training step: loss + scene gradients from ONE pallas
    kernel (VERDICT r4 #3's census lever — the separate forward kernel
    was 0.634 ms of pure recompute in the 2.163 ms step; here the
    adjoint kernel's own forward sweep supplies the radiance, the loss
    cotangent forms in-kernel, and the fwd pallas_call disappears).
    ``loss`` is ``'l2'`` or ``'log'`` (diff.gradients.log_loss — the
    better-conditioned fitting loss; its pointwise cotangent fuses the
    same way, with the targets shipped pre-log1p'd).

    Estimator and gradient policy identical to `jax.grad` of the l2
    loss over `trace_pallas_diff` (same tape, same adjoint code —
    literally `_bwd_kernel`; parity asserted in tests/test_pallas_grad
    .py::TestFusedStep). ``target`` is ``[N, 3]`` radiance lanes.

    Returns ``(loss, dscene, dvpl_float)`` where ``dscene`` is a Scene
    cotangent (refl zeros) covering the DIRECT dependence (scene table +
    VPL window gather), and ``dvpl_float = (dhp, drad, dnl)`` is the VPL
    buffer cotangent for the caller to pull through `trace_light_paths`
    (the light-subpath chain; see diff.gradients). ``None`` when the
    estimator is unidirectional.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    n = rays.o.shape[0]
    L = max(len(light_idx), 1)
    _, k_total = _tape_rows(cfg, L)

    tile = tile_rows * _LANES
    n_pad = ((n + tile - 1) // tile) * tile
    rows_total = n_pad // _LANES

    def plane(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill
                       ).reshape(rows_total, _LANES)

    ox, oy, oz = (plane(rays.o[:, i]) for i in range(3))
    dx = plane(rays.d[:, 0])
    dy = plane(rays.d[:, 1])
    dz = plane(rays.d[:, 2], fill=1.0)
    if loss == "log":
        target = jnp.log1p(target)  # kernel compares against log1p(rad)
    elif loss != "l2":
        raise ValueError(f"fused step supports loss 'l2'/'log', got {loss!r}")
    tr = plane(target[:, 0])
    tg = plane(target[:, 1])
    tb = plane(target[:, 2])
    vm = plane(jnp.ones((n,), jnp.float32))

    inline = _mix32_key_dtype(key)
    if inline:
        tape, _ = _tape_key_tables(cfg, L, key, sample, lane_offset,
                                   n if lane_total is None else lane_total)
    else:
        tape = _build_tape(cfg, L, key, sample, n, lane_offset, lane_total)
        tape = jnp.pad(tape, ((0, 0), (0, n_pad - n))).reshape(
            k_total, rows_total, _LANES)

    refl = scene.refl
    bidir = cfg.use_vpl and vpls is not None
    if bidir:
        valid, sid = vpls.valid, vpls.sid

        def tables(p, rad, e, c, hp, vrad, vnl):
            sc = Scene(rad=rad, p=p, e=e, c=c, refl=refl)
            vb = VplBuffer(hp=hp, rad=vrad, nl=vnl, valid=valid, sid=sid)
            return _scene_table(sc), _vpl_table(cfg, vb, vlp_index)[0]

        (tab, vpl_tab), pull = jax.vjp(
            tables, scene.p, scene.rad, scene.e, scene.c,
            vpls.hp, vpls.rad, vpls.nl)
        n_vpl, use_vpl = vpl_tab.shape[0], True
    else:
        def tables(p, rad, e, c):
            return _scene_table(Scene(rad=rad, p=p, e=e, c=c, refl=refl))

        tab, pull = jax.vjp(tables, scene.p, scene.rad, scene.e, scene.c)
        vpl_tab, n_vpl, use_vpl = _vpl_table(cfg, None, None)

    f = _fused_core(cfg, tuple(light_idx), scene.num_spheres, n_vpl,
                    use_vpl, tile_rows, rows_total, n, interpret, inline,
                    loss)
    (dtab_t, dvpl_t, _dox, _doy, _doz, _ddx, _ddy, _ddz,
     dloss_t) = f(tab, vpl_tab, tape, ox, oy, oz, dx, dy, dz,
                  tr, tg, tb, vm)
    loss = dloss_t[:, 0, 0].sum() / jnp.float32(3.0 * n)
    dtab = jnp.sum(dtab_t, axis=0).at[:, 10:].set(0.0)
    if bidir:
        dvpl = jnp.sum(dvpl_t, axis=0).at[:, 9:].set(0.0)
        dp_, drad_, de_, dc_, dhp, dvr, dvn = pull((dtab, dvpl))
        dvpl_float = (dhp, dvr, dvn)
    else:
        dp_, drad_, de_, dc_ = pull(dtab)
        dvpl_float = None
    dscene = Scene(rad=drad_, p=dp_, e=de_, c=dc_,
                   refl=jnp.zeros_like(refl))
    return loss, dscene, dvpl_float


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx", "tile_rows",
                                             "interpret", "lane_total"))
def trace_pallas_diff(scene: Scene, cfg: IntegratorConfig,
                      light_idx: tuple[int, ...], rays: Rays, key: Array,
                      sample: Array, vpls: VplBuffer | None = None,
                      vlp_index: Array | None = None,
                      tile_rows: int = 16, interpret: bool = False,
                      lane_offset=None, lane_total: int | None = None
                      ) -> Array:
    """Differentiable drop-in for `path_tracer.trace`: same estimator and
    tape as `trace_pallas`, with a hand-written pallas VJP w.r.t. scene
    parameters, the VPL buffer, and the primary rays."""
    interpret = interpret or jax.default_backend() != "tpu"
    n = rays.o.shape[0]
    L = max(len(light_idx), 1)
    _, k_total = _tape_rows(cfg, L)

    tile = tile_rows * _LANES
    n_pad = ((n + tile - 1) // tile) * tile
    rows_total = n_pad // _LANES

    def plane(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill
                       ).reshape(rows_total, _LANES)

    ox, oy, oz = (plane(rays.o[:, i]) for i in range(3))
    dx = plane(rays.d[:, 0])
    dy = plane(rays.d[:, 1])
    dz = plane(rays.d[:, 2], fill=1.0)

    inline = _mix32_key_dtype(key)
    if inline:
        tape, _ = _tape_key_tables(cfg, L, key, sample, lane_offset,
                                   n if lane_total is None else lane_total)
    else:
        tape = _build_tape(cfg, L, key, sample, n, lane_offset, lane_total)
        tape = jnp.pad(tape, ((0, 0), (0, n_pad - n))).reshape(
            k_total, rows_total, _LANES)

    vpl_tab, n_vpl, use_vpl = _vpl_table(cfg, vpls, vlp_index)
    f = _diff_core(cfg, tuple(light_idx), scene.num_spheres, n_vpl, use_vpl,
                   tile_rows, rows_total, interpret, inline)
    rr, rg, rb = f(_scene_table(scene), vpl_tab, tape,
                   ox, oy, oz, dx, dy, dz)
    rad = jnp.stack([rr.reshape(-1), rg.reshape(-1), rb.reshape(-1)],
                    axis=-1)
    return rad[:n]
