"""Light-subpath tracer: emits rays from emitters and deposits VPLs.

TPU re-design of the light pass: ``GetRayKernel`` (``device.cu:167-219``)
plus ``RadianceLightTracingKernel`` (``device.cu:222-455``). The committed
reference kernel cannot compile (half-done rename, SURVEY.md 2.13); this
implements its documented *intent*:

- each of ``light_points`` lanes walks one subpath from a point on a light
  sphere, direction cosine-sampled about the outward normal;
- initial throughput = light emission / 4 (``device.cu:268``);
- a lane that escapes the scene at a given depth deposits an "environment"
  VPL at its current origin with rad = emission/2 and inward normal
  (``device.cu:279-293``);
- a diffuse hit multiplies throughput by albedo under the TOL guard and
  deposits ``{hit_point, throughput, shading_normal}`` at
  ``[depth, lane]`` (``device.cu:314-346``);
- mirror/glass bounces continue without depositing; hitting an emitter
  terminates (``device.cu:296-298``).

Divergences from the (broken) reference, on purpose:
- ``VecMultiply``'s component-freeze semantics (``device.cu:10-42``) are
  replaced by their stated intent — "Removed Russian Roulette ... SIMT"
  — a throughput-kill: the lane dies when max component <= TOL.
- with multiple emitters the reference re-runs the kernel per light into the
  SAME buffer, so only the last light's VPLs survive
  (``smallpt_cpu.c:311-358``); we round-robin lanes across lights instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
from gpu_bidirectional_raytracer_tpu.core.types import (
    DIFF,
    IntegratorConfig,
    Rays,
    Scene,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import bsdf
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect
from gpu_bidirectional_raytracer_tpu.integrators.sampling import (
    cosine_hemisphere,
    uniform_sphere,
)


def emit_light_rays(scene: Scene, cfg: IntegratorConfig,
                    light_idx: tuple[int, ...], key: Array,
                    sample: Array, lane_offset=None,
                    lane_count: int | None = None,
                    lane_total: int | None = None
                    ) -> tuple[Rays, Array, Array]:
    """Sample ``light_points`` emission rays (``GetRayKernel`` intent).

    Returns (rays, lane_light_id [N], lane_emission [N,3]). Lanes are
    round-robined across the static light set.

    ``lane_offset``/``lane_count``/``lane_total``: emit only lanes
    ``[lane_offset, lane_offset + lane_count)`` of a ``lane_total``-lane
    global pass — the same tape-window contract as `rng.site_uniforms`,
    so a mesh shard's lanes are bitwise-equal to its slice of the
    monolithic pass (`parallel.mesh.light_splat_sharded`).
    """
    total = cfg.light_points if lane_total is None else lane_total
    n = total if lane_count is None else lane_count
    off = 0 if lane_offset is None else lane_offset
    li = jnp.asarray(light_idx, dtype=jnp.int32)
    gid = jnp.arange(n) + jnp.asarray(off, jnp.int32)        # global lane ids
    lane_light = li[gid % len(light_idx)]                    # [N]
    lp = scene.p[lane_light]
    lrad = scene.rad[lane_light]
    le = scene.e[lane_light]

    u = rng.site_uniforms(key, sample, 0, rng.LIGHT_RAY_UV, 4, n,
                          lane_offset=lane_offset, lane_total=lane_total)
    usp = uniform_sphere(u[0], u[1])                         # outward normal
    origin = lp + lrad[:, None] * usp
    direction = cosine_hemisphere(usp, u[2], u[3])
    return Rays(o=origin, d=direction), lane_light, le


def trace_light_paths(scene: Scene, cfg: IntegratorConfig,
                      light_idx: tuple[int, ...], key: Array,
                      sample: Array, lane_offset=None,
                      lane_count: int | None = None,
                      lane_total: int | None = None) -> VplBuffer:
    """Walk light subpaths and fill a fresh :class:`VplBuffer`.

    With ``lane_offset``/``lane_count``/``lane_total`` set, walks only
    that window of the global pass's lanes on their global tape columns
    (see `emit_light_rays`) — the buffer equals the corresponding lane
    slice of the monolithic buffer bitwise.
    """
    rays, lane_light, le = emit_light_rays(scene, cfg, light_idx, key,
                                           sample, lane_offset=lane_offset,
                                           lane_count=lane_count,
                                           lane_total=lane_total)
    n = cfg.light_points if lane_count is None else lane_count
    lane_lp = scene.p[lane_light]
    lane_lrad = scene.rad[lane_light]

    o, d = rays.o, rays.d
    throughput = le * 0.25                                   # device.cu:268
    alive = jnp.ones((n,), dtype=bool)

    hp_out = jnp.zeros((cfg.vpl_depth, n, 3), dtype=jnp.float32)
    rad_out = jnp.zeros_like(hp_out)
    nl_out = jnp.zeros_like(hp_out)
    valid_out = jnp.zeros((cfg.vpl_depth, n), dtype=bool)
    sid_out = jnp.zeros((cfg.vpl_depth, n), dtype=jnp.int32)

    # vpl_depth is small (1 by default) — unrolled python loop keeps the
    # per-depth deposit rows statically indexed.
    for depth in range(cfg.vpl_depth):
        hit, t, hit_id = isect.intersect(scene, o, d)
        hit_id = jax.lax.stop_gradient(hit_id)
        t = jnp.where(hit, t, 1.0)

        obj_p, obj_e, obj_c, obj_refl = isect.gather_sphere_attrs(scene, hit_id)

        hp = o + vm.smul(t, d)
        normal = vm.norm(hp - obj_p, eps=1e-20)
        dp = vm.dot(normal, d)
        nl = vm.smul(jnp.where(dp > 0.0, -1.0, 1.0), normal)

        # Escaped lane: environment VPL at the ray origin, inward normal
        # -(o - light.p)/light.rad, rad = emission/2 (device.cu:279-293).
        env_nl = -(o - lane_lp) / jnp.maximum(lane_lrad, 1e-20)[:, None]
        env_rad = le * 0.5
        env_mask = alive & jnp.logical_not(hit)

        is_emitter = jnp.logical_not(vm.is_zero(obj_e))
        is_diff = obj_refl == DIFF

        # Diffuse deposit uses throughput AFTER the albedo multiply
        # (device.cu:317, 336) under the TOL kill guard.
        tp_diff = throughput * obj_c
        deposit_mask = alive & hit & jnp.logical_not(is_emitter) & is_diff

        slot_hp = jnp.where(env_mask[:, None], o,
                            jnp.where(deposit_mask[:, None], hp, 0.0))
        slot_rad = jnp.where(env_mask[:, None], env_rad,
                             jnp.where(deposit_mask[:, None], tp_diff, 0.0))
        slot_nl = jnp.where(env_mask[:, None], env_nl,
                            jnp.where(deposit_mask[:, None], nl, 0.0))
        slot_valid = env_mask | deposit_mask
        # Host sphere id: the deposit surface (env VPLs sit on their
        # emitting light) — consumed by the visibility-gradient endpoint
        # exclusion (gather_vpls / intersect.soft_visibility).
        slot_sid = jnp.where(env_mask, lane_light,
                             jnp.where(deposit_mask, hit_id, 0))

        hp_out = hp_out.at[depth].set(slot_hp)
        rad_out = rad_out.at[depth].set(slot_rad)
        nl_out = nl_out.at[depth].set(slot_nl)
        valid_out = valid_out.at[depth].set(slot_valid)
        sid_out = sid_out.at[depth].set(slot_sid)

        # Continue the walk (only matters when vpl_depth > 1).
        alive = alive & hit & jnp.logical_not(is_emitter)
        u = rng.site_uniforms(key, sample, depth, rng.LIGHT_SCATTER, 3, n,
                              lane_offset=lane_offset,
                              lane_total=lane_total)
        sc = bsdf.scatter(obj_refl, obj_c, d, normal, nl, u[0], u[1], u[2])
        live = alive[:, None]
        o = jnp.where(live, hp, o)
        d = jnp.where(live, sc.new_d, d)
        throughput = jnp.where(live, throughput * sc.tp_mul, throughput)
        # Throughput-kill replaces VecMultiply's freeze (device.cu:10-42).
        alive = alive & (vm.max_component(throughput) > cfg.throughput_tol)

    return VplBuffer(hp=hp_out, rad=rad_out, nl=nl_out, valid=valid_out,
                     sid=sid_out)


def splat_to_film(scene: Scene, cam, cfg: IntegratorConfig,
                  vpls: VplBuffer, width: int, height: int,
                  light_idx: tuple[int, ...] = (), lane_offset=None
                  ) -> tuple[Array, Array]:
    """Light-trace-to-film splatting: the living counterpart of
    ``RadianceLightTracing``'s eye connection + ``SamplePixels``
    (``geomfunc.h:357-365, 216-299`` — the reference's splatting body is
    entirely commented out; this implements the documented intent with a
    radiometrically CORRECT estimator, derived below).

    Per deposited light vertex:

    - **eye visibility**: the segment camera->vertex must be unobstructed.
      (The dead reference code tested nearest-hit id equality, which
      wrongly accepts a vertex hidden behind its OWN sphere; the distance
      test used here is the intent.)
    - **film projection**: the reference projects with
      ``xp = 10 * (x_hat.(p - orig)) / (d_hat.(p - orig))`` — exactly the
      inverse of the primary-ray direction (the homogeneous ``w`` of
      device.cu:560-600 cancels in the ratio) — then maps to pixels with
      hand-fudged extents (1.048 / 0.785) that do NOT invert its own
      camera. We use the exact film extents (camera.FILM_W/H), so a splat
      lands precisely on the pixel whose primary ray passes through the
      vertex.
    - **contribution — the splat-weight derivation.** The dead reference
      code's ``Ld = pi * rad`` splatted into a per-pixel running mean
      cannot converge to the eye-traced image: dividing by the number of
      splats landing in a pixel erases the splat DENSITY, which is where
      light tracing carries the ``wi*wo/d^2`` geometry (the round-2 splat
      mode inherited exactly this defect — it rendered a lit-area albedo
      map). The correct per-splat weight equates the two estimators'
      expectations. Eye side (reference conventions, depth-0 diffuse
      direct light, `integrators/direct.py`):
      ``L_eye = c(x) * e * light_gain * 4 pi r^2 * E_y[wi wo V / d^2]``.
      Light side: ``y`` uniform on the light sphere (pdf ``1/(4 pi
      r^2)``), emission direction cosine-sampled (pdf ``wo / pi``), so
      the induced surface density at the first hit ``x`` is
      ``(wo/pi) * wi * V / d^2`` and the deposited ``rad = (e/4) c(x)``
      (``device.cu:268, 317``). A pixel's surface footprint at ``x`` is
      ``A_p = a_f * cos^3(theta) * D^2 / (f^2 * cos(theta_s))`` with
      ``a_f`` the film-plane pixel area, ``f = FILM_KZ``, ``theta`` the
      angle to the camera axis (``cos = tz/D``), ``theta_s`` the surface
      tilt (``|nl . dir_to_cam|``). Equating
      ``E[(1/N_l) sum_splats w * rad] = L_eye`` over the pixel gives

          w = light_gain * 16 pi^2 r^2 / A_p
            = light_gain * 16 pi^2 r^2 f^2 cos(theta_s) * D / (a_f tz^3)

      per splat, with ``r`` the ORIGINATING light's radius (lanes are
      round-robined over ``light_idx``, matching `emit_light_rays`) and
      the caller dividing the film SUM by the per-light lane count
      ``N / L`` (`render.progressive.light_splat_pass`) — a sum-over-
      paths estimator, not a mean-over-splats. Deeper deposits
      (``vpl_depth > 1``) chain albedo multiplies and cosine sampling
      identically on both sides, so the same weight stays unbiased for
      indirect light. Convergence to the eye-traced image is asserted
      statistically in tests/test_splat.py::TestRadiometry at depth 1
      (vs the direct-only tracer) AND depth 2 (vs the full tracer at
      ``max_depth=2``). Escaped-lane "environment" VPLs
      (``device.cu:279-293``) are splatted only from depth 0, where they
      sit on the emitting sphere and paint the emitter's own disc with
      ``e/2`` (the reference's env-VPL convention, not the eye tracer's
      ``e |dp|`` emitter shading — excluded from the radiometric
      comparison). At depth >= 1 an escaped lane's env deposit sits at
      its last SCENE-surface vertex carrying raw ``e/2`` — meaningful as
      sky filler for the VPL *gather* estimator, but radiometrically
      foreign to the film splat (it would paint emitter-bright points on
      ordinary surfaces) — so those are excluded here. Env deposits are
      identified by their host sphere id being an emitter: `trace_light_
      paths` records ``sid = lane_light`` for env slots while diffuse
      deposits always host on non-emitters (``deposit_mask``).

    Returns ``(color_sum [H,W,3], count [H,W])`` — ``color_sum`` is the
    weighted SUM of splat contributions (the caller normalizes by paths
    per light), ``count`` the raw splat count (diagnostics/tests).
    """
    from gpu_bidirectional_raytracer_tpu.camera import FILM_H, FILM_KZ, FILM_W
    from gpu_bidirectional_raytracer_tpu.core.types import EPSILON

    hp = vpls.hp.reshape(-1, 3)                              # [K, 3]
    rad = vpls.rad.reshape(-1, 3)
    nl_flat = vpls.nl.reshape(-1, 3)
    valid = vpls.valid.reshape(-1)
    n_lanes = vpls.hp.shape[1]
    # Global lane ids under lane-windowed (sharded) tracing: the
    # round-robin light assignment follows the GLOBAL lane index so a
    # shard's weights match the monolithic pass (emit_light_rays).
    off = 0 if lane_offset is None else jnp.asarray(lane_offset, jnp.int32)
    if light_idx:
        li = jnp.asarray(light_idx, dtype=jnp.int32)
        lane_lrad = scene.rad[li[(jnp.arange(n_lanes) + off)
                                 % len(light_idx)]]
    else:
        lane_lrad = jnp.ones((n_lanes,), jnp.float32)
    lrad = jnp.tile(lane_lrad, vpls.hp.shape[0])             # [K]

    x_hat, y_hat, d_hat = vm.norm(cam.x), vm.norm(cam.y), vm.norm(cam.dir)
    v = hp - cam.orig[None, :]
    tx, ty, tz = v @ x_hat, v @ y_hat, v @ d_hat
    front = tz > 1e-6
    safe_tz = jnp.where(front, tz, 1.0)
    kx = FILM_KZ * tx / safe_tz
    ky = FILM_KZ * ty / safe_tz
    fx = (kx + FILM_W * 0.5) * (width / FILM_W)
    fy = (ky + FILM_H * 0.5) * (height / FILM_H)
    pixx = jnp.floor(fx).astype(jnp.int32)
    pixy = jnp.floor(fy).astype(jnp.int32)
    in_bounds = ((pixx >= 0) & (pixx < width)
                 & (pixy >= 0) & (pixy < height))

    # Eye visibility: any blocker strictly nearer than the vertex?
    len_sq = jnp.sum(v * v, axis=-1)
    pos = len_sq > 0.0
    dist = jnp.where(pos, jnp.sqrt(jnp.where(pos, len_sq, 1.0)), 0.0)
    dunit = v / jnp.maximum(dist, 1e-20)[:, None]
    orig_b = jnp.broadcast_to(cam.orig[None, :], v.shape)
    occluded = isect.intersect_p(scene, orig_b, dunit, dist - EPSILON)

    # Env-VPL splat rule (docstring): depth-0 env deposits paint the
    # emitter disc; deeper env deposits are gather-only sky filler.
    n_depth = vpls.hp.shape[0]
    if vpls.sid is not None:
        host_is_emitter = jnp.any(scene.e[vpls.sid.reshape(-1)] != 0.0,
                                  axis=-1)
        depth_row = jnp.repeat(jnp.arange(n_depth), n_lanes)
        env_ok = jnp.logical_not(host_is_emitter) | (depth_row == 0)
    else:
        env_ok = jnp.ones_like(valid)

    mask = valid & front & in_bounds & jnp.logical_not(occluded) & env_ok
    # Per-splat importance weight (docstring derivation).
    a_f = (FILM_W / width) * (FILM_H / height)
    cos_s = jnp.abs(jnp.sum(nl_flat * (-dunit), axis=-1))
    safe_tz3 = jnp.where(front, tz, 1.0) ** 3
    w = (cfg.light_gain * 16.0 * jnp.pi ** 2 * lrad * lrad
         * FILM_KZ * FILM_KZ * cos_s * dist / (a_f * safe_tz3))
    ld = jnp.where(mask[:, None], w[:, None] * rad, 0.0)
    pix = jnp.where(mask, pixy * width + pixx, 0)

    color_sum = jnp.zeros((height * width, 3), jnp.float32
                          ).at[pix].add(ld)
    count = jnp.zeros((height * width,), jnp.int32
                      ).at[pix].add(mask.astype(jnp.int32))
    return color_sum.reshape(height, width, 3), count.reshape(height, width)
