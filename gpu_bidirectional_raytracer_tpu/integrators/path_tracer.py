"""Vectorized eye-path tracer.

The TPU re-design of ``RadiancePathTracingKernel`` (``device.cu:544-791``)
and its CPU golden twin ``RadiancePathTracing`` (``geomfunc.h:473-644``).

Shape: instead of one CUDA thread per pixel with divergent `break`s, an SoA
batch of N rays advances one bounce per `lax.fori_loop` iteration with an
``alive`` mask — dead lanes simply stop contributing. Depth cutoff is the
loop bound (the reference's ``depth > 6``). All randomness is drawn from
counter-based streams addressed by (sample, depth, purpose), identical to
the golden model's tape.

Also provides `trace_direct`, the direct-lighting-only integrator
(``RadianceDirectLighting``, ``geomfunc.h:646-789``): identical walk, but a
diffuse vertex terminates after NEE instead of scattering.
"""

from __future__ import annotations

from functools import partial

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
from gpu_bidirectional_raytracer_tpu.integrators import direct as nee
from gpu_bidirectional_raytracer_tpu.integrators import intersect as isect


def trace(scene: Scene, cfg: IntegratorConfig, light_idx: tuple[int, ...],
          rays: Rays, key: Array, sample: Array,
          vpls: VplBuffer | None = None, vlp_index: Array | None = None,
          direct_only: bool = False, remat: bool = False,
          lane_offset=None, lane_total: int | None = None,
          with_stats: bool = False, scan_backend: str = "xla",
          scan_compact: bool = False, aux=None,
          collect_aux: bool = False) -> Array:
    """Trace a batch of eye rays to radiance ``[N, 3]``.

    ``key``/``sample`` address the random tape; the same coordinates fed to
    the golden model reproduce this result to float tolerance, independent
    of sharding.

    ``remat=True`` checkpoints each bounce: only the loop-carried ray state
    is saved for the backward pass and per-bounce intermediates are
    recomputed — 3.5x faster gradients on TPU (the backward sweep is
    otherwise bound on spilling every bounce's intermediates to HBM).
    Identical values either way; used by the differentiable path.

    ``lane_offset``/``lane_total``: when the ray batch is a window of a
    larger frame (banded rendering, shard-local tracing), draw tape columns
    ``[lane_offset, lane_offset+N)`` of the global ``lane_total``-wide tape
    so the result is bitwise-equal to tracing the whole frame at once.

    ``scan_backend='pallas'`` routes the three per-bounce sphere scans
    (nearest-hit, NEE shadow, VPL shadow) through `ops.pallas_scan`'s
    tile-guarded unrolled kernels — the many-sphere fast path. Measured on
    complex.scn 512x384 v5e (ms/sample): 28.2 vs 55.0 XLA (no-VPL, 1.95x)
    and 38.0 vs 67.0 (bidirectional default, 1.76x). Forward rendering
    only (no VJP through pallas_call); same estimator and tape.
    ``scan_backend='mxu'`` keeps XLA orchestration but switches every
    sphere scan to `intersect.sphere_distances(method='mxu')` — the
    cross-term matmul formulation whose VJP is matmuls too. Roots agree
    with 'direct' to ~1e-3 absolute. Measured on v5e complex.scn 512x384
    (tools/bench_mxu_grad.py): fwd 101.5 vs 66.9 ms/sample, fwd+bwd 218.4
    vs 221.6 — K=3 matmuls underfeed the MXU, so this stays an explicit
    opt-in, kept as the measured answer to "why not matmul the scans?".
    ``scan_compact=True`` additionally partitions live lanes to the front
    each bounce so dead tiles skip wholesale — per-pixel values are
    exactly permutation-invariant (bitwise-asserted) — but on v5e the
    permutation plumbing costs more than the skipped scans (sort ~0.5ms +
    an unavoidable ~2.5ms/depth tape gather: 40.0/47.3 ms/sample), so it
    defaults OFF; kept for parts where liveness collapses faster than the
    gather cost.

    ``aux`` (the many-sphere differentiable path, `ops.pallas_bounce_grad`):
    a tuple ``(hit_id [D,N] int32 with -1 = miss, occ_light [D,N,L] bool,
    occ_vpl [D,N,K] bool | None)`` of DETACHED discrete facts from a prior
    pallas forward. With it, this walk runs NO O(S) sphere scans at all:
    the hit distance is re-derived differentiably from the (gathered) hit
    sphere alone (`intersect.sphere_root` — bitwise the scan's ``t``) and
    occlusion is read off the masks. Since hit ids and occlusion are
    stop-gradiented in the estimator anyway, gradients are identical to
    the full-scan walk while fwd+bwd cost drops from O(N*S*D) to
    O(N*(L+K)*D) elementwise + one attr-gather matmul per bounce.

    ``collect_aux=True``: run the normal full-scan walk but ALSO return
    that aux tuple — ``(radiance, aux)``. This is the pure-XLA facts
    collector: feeding its aux back in reproduces the walk bitwise
    (asserted by tests/test_bounce_grad.py) and serves as the fact source
    off-TPU where interpret-mode pallas compiles are prohibitive.

    ``with_stats=True`` additionally returns ``(radiance, stats)`` where
    ``stats = {"extension_segments", "diffuse_vertices"}`` counts the
    USEFUL traced work (alive lanes only): extension rays per bounce and
    NEE-shooting diffuse vertices (each costs ``len(light_idx)`` shadow
    rays plus the VPL window when gathering). This is the bounce-aware
    meter the reference's pixels/sec counter never had
    (``smallpt_cpu.c:282-287`` counts primary samples only).
    """
    n = rays.o.shape[0]
    n_lights = max(len(light_idx), 1)
    # Lane compaction (see docstring): live lanes partitioned to the
    # front each bounce; the tape follows the pixel id (one row gather
    # per depth); radiance is restored to pixel order at the end.
    compact = scan_backend == "pallas" and scan_compact

    def draws(depth, purpose, k):
        return rng.site_uniforms(key, sample, depth, purpose, k, n,
                                 lane_offset=lane_offset,
                                 lane_total=lane_total)

    def _partition_live(o, d, rad, throughput, specular, alive, pix_id):
        # Unique composite key = stable partition; bitwise-deterministic
        # under any sharding. Kept to 16 operands: wider multi-operand
        # sorts (e.g. carrying the whole tape) explode XLA's sorting-
        # network compile on the remote toolchain.
        lane = jnp.arange(n, dtype=jnp.int32)
        keyv = jnp.where(alive, jnp.int32(0), jnp.int32(1)) * jnp.int32(n) + lane
        out = jax.lax.sort(
            (keyv,
             o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             rad[:, 0], rad[:, 1], rad[:, 2],
             throughput[:, 0], throughput[:, 1], throughput[:, 2],
             specular.astype(jnp.int32), alive.astype(jnp.int32), pix_id),
            num_keys=1)
        o = jnp.stack(out[1:4], axis=-1)
        d = jnp.stack(out[4:7], axis=-1)
        rad = jnp.stack(out[7:10], axis=-1)
        throughput = jnp.stack(out[10:13], axis=-1)
        return (o, d, rad, throughput, out[13].astype(bool),
                out[14].astype(bool), out[15])

    def body(depth, state):
        if with_stats:
            o, d, rad, throughput, specular, alive, *rest, n_ext, n_dv = state
            n_ext = n_ext + jnp.sum(alive.astype(jnp.int32))
        else:
            o, d, rad, throughput, specular, alive, *rest = state
        alive_entry = alive
        depth_tape = None
        if compact:
            (o, d, rad, throughput, specular, alive,
             pix_id) = _partition_live(o, d, rad, throughput, specular,
                                       alive, rest[0])
            # This depth's draw sites, pixel order, then ONE [n, R] row
            # gather onto the permuted lanes (a per-site minor-dim gather
            # measures ~2ms on v5e; this form ~0.5ms per depth).
            rows = jnp.concatenate(
                [draws(depth, rng.LIGHT_UV, 2 * n_lights),
                 draws(depth, rng.DIFF_UV, 2),
                 draws(depth, rng.REFR_RR, 1)], axis=0)   # [R, n]
            depth_tape = rows.T[pix_id].T                 # [R, n], lane order

        if aux is not None:
            # Detached discrete facts from the pallas forward: no scan.
            hit_id = jnp.maximum(aux[0][depth], 0)
            hit = aux[0][depth] >= 0
            obj_p, obj_e, obj_c, obj_refl, obj_rad = \
                isect.gather_sphere_attrs(scene, hit_id, with_rad=True)
            t = isect.sphere_root(o, d, obj_p, obj_rad)
            alive = alive & hit
            t = jnp.where(hit, t, 1.0)
        else:
            if scan_backend == "pallas":
                from gpu_bidirectional_raytracer_tpu.ops import pallas_scan

                (hit, t, hit_id, obj_p, obj_e, obj_c,
                 obj_refl) = pallas_scan.nearest_tiles(scene, o, d, alive)
            else:
                hit, t, hit_id = isect.intersect(
                    scene, o, d,
                    method="mxu" if scan_backend == "mxu" else "direct")
            hit_id = jax.lax.stop_gradient(hit_id)
            alive = alive & hit
            # Missed lanes carry t = 1e20; clamp so downstream dead-lane
            # math stays finite (results are masked, but inf*0 breeds NaNs).
            t = jnp.where(hit, t, 1.0)

            if scan_backend != "pallas":
                if collect_aux:
                    obj_p, obj_e, obj_c, obj_refl, obj_rad = \
                        isect.gather_sphere_attrs(scene, hit_id,
                                                  with_rad=True)
                    # Root-choice census bit: whether the hit used the
                    # near root (t1 > EPSILON) — flips swap entry/exit
                    # (a huge t change) with IDENTICAL hit ids, so the
                    # cross-backend flip census must observe it (the
                    # giant wall spheres put the camera INSIDE, where t1
                    # sits at the EPSILON knife edge).
                    op_c = obj_p - o
                    b_c = jnp.sum(op_c * d, axis=-1)
                    det_c = (b_c * b_c - jnp.sum(op_c * op_c, axis=-1)
                             + obj_rad * obj_rad)
                    pos_c = det_c > 0.0
                    sq_c = jnp.where(
                        pos_c,
                        jnp.sqrt(jnp.where(pos_c,
                                           jnp.maximum(det_c, 1e-6), 1.0)),
                        0.0)
                    from gpu_bidirectional_raytracer_tpu.core.types import (
                        EPSILON,
                    )

                    use1_bit = (b_c - sq_c) > EPSILON
                else:
                    obj_p, obj_e, obj_c, obj_refl = \
                        isect.gather_sphere_attrs(scene, hit_id)

        # Reparameterized hit point: t is differentiable through the root
        # formula; the discrete hit id is stopped above.
        hp = o + vm.smul(t, d)
        normal = vm.norm(hp - obj_p, eps=1e-20)
        dp = vm.dot(normal, d)
        # sign(x) in the reference maps 0 -> -1 (vec.h:31)
        inv_sign_dp = jnp.where(dp > 0.0, -1.0, 1.0)
        nl = vm.smul(inv_sign_dp, normal)

        # Emitter hit: add emission on specular chains, then terminate
        # (geomfunc.h:522-533; scale 10 on CPU path, 1 on GPU path).
        is_emitter = jnp.logical_not(vm.is_zero(obj_e))
        emit = vm.smul(cfg.emission_scale * jnp.abs(dp), obj_e) * throughput
        rad = rad + jnp.where((alive & is_emitter & specular)[:, None], emit, 0.0)
        alive = alive & jnp.logical_not(is_emitter)

        # NEE at diffuse vertices (geomfunc.h:535-544).
        is_diff = obj_refl == DIFF
        tp_after_diff = throughput * obj_c
        if compact:
            light_u = depth_tape[:2 * n_lights].reshape(n_lights, 2, n)
        else:
            light_u = draws(depth, rng.LIGHT_UV,
                            2 * n_lights).reshape(n_lights, 2, n)
        ld = nee.sample_lights(scene, cfg, light_idx, hp, nl, light_u,
                               vpls=vpls, vlp_index=vlp_index,
                               scan_backend=scan_backend,
                               active=alive & is_diff,
                               occ_light=(None if aux is None
                                          else aux[1][depth]),
                               occ_vpl=(None if aux is None or aux[2] is None
                                        else aux[2][depth]),
                               with_occ=collect_aux)
        if collect_aux:
            ld, occ_l, occ_v, ok_l = ld
            nee_mask = alive & is_diff  # before direct_only kills lanes
        rad = rad + jnp.where((alive & is_diff)[:, None], tp_after_diff * ld, 0.0)
        if with_stats:
            n_dv = n_dv + jnp.sum((alive & is_diff).astype(jnp.int32))

        if direct_only:
            # RadianceDirectLighting: a diffuse vertex is terminal
            # (geomfunc.h:708-720); specular chains continue.
            alive = alive & jnp.logical_not(is_diff)

        # Scatter (masked lanes compute everything; select at the end).
        if compact:
            diff_u = depth_tape[2 * n_lights:2 * n_lights + 2]
            rr_u = depth_tape[2 * n_lights + 2]
        else:
            diff_u = draws(depth, rng.DIFF_UV, 2)
            rr_u = draws(depth, rng.REFR_RR, 1)[0]
        sc = bsdf.scatter(obj_refl, obj_c, d, normal, nl,
                          diff_u[0], diff_u[1], rr_u,
                          with_bits=collect_aux)
        if collect_aux:
            # aux entries 0-2 are the re-walk contract (`aux=` above);
            # 3-4 (NEE contribution gates, Fresnel branch bits) are the
            # extra decisions the cross-backend flip census observes
            # (tools/northstar.py --leg classify) — ignored by the
            # re-walk.
            # Aliveness masks keep dead-lane garbage from registering as
            # decision flips in the census (stale rays keep intersecting
            # deterministically-but-irrelevantly).
            sc, sc_bits = sc
            # occ stays RAW (the re-walk/kernel facts contract — the
            # pallas aux kernel emits unmasked occlusion); the census
            # entries (ok gates, branch bits, root choice) are
            # aliveness-masked so dead-lane garbage can't register as
            # decision flips.
            live_hit = alive_entry & hit
            aux_d = (jnp.where(live_hit, hit_id, -1),
                     occ_l,
                     occ_v,
                     ok_l & nee_mask[:, None],
                     jnp.where(alive, sc_bits, -1),
                     jnp.where(live_hit, use1_bit.astype(jnp.int32), -1))

        live = alive[:, None]
        o = jnp.where(live, hp, o)
        d = jnp.where(live, sc.new_d, d)
        throughput = jnp.where(live, throughput * sc.tp_mul, throughput)
        specular = jnp.where(alive, sc.specular, specular)
        out = (o, d, rad, throughput, specular, alive)
        if compact:
            out = out + (pix_id,)
        if with_stats:
            out = out + (n_ext, n_dv)
        if collect_aux:
            return out, aux_d
        return out

    state = (
        rays.o,
        rays.d,
        jnp.zeros((n, 3), dtype=jnp.float32),
        jnp.ones((n, 3), dtype=jnp.float32),
        jnp.ones((n,), dtype=bool),      # specularBounce = 1 initially
        jnp.ones((n,), dtype=bool),
    )
    if compact:
        state = state + (jnp.arange(n, dtype=jnp.int32),)  # lane -> pixel
    if with_stats:
        state = state + (jnp.int32(0),   # extension-segment counter
                         jnp.int32(0))   # diffuse-vertex (NEE) counter
    aux_stack = None
    if collect_aux:
        def scan_body(carry, i):
            out, aux_d = body(i, carry)
            return out, aux_d

        state, aux_stack = jax.lax.scan(scan_body, state,
                                        jnp.arange(cfg.max_depth))
    elif remat:
        def scan_body(carry, i):
            return jax.checkpoint(lambda c, j: body(j, c))(carry, i), None

        state, _ = jax.lax.scan(scan_body, state,
                                jnp.arange(cfg.max_depth))
    else:
        state = jax.lax.fori_loop(0, cfg.max_depth, body, state)
    rad = state[2]
    if compact:
        # Restore pixel order (pix_id is a permutation: unique keys).
        _, r0, r1, r2 = jax.lax.sort(
            (state[6], rad[:, 0], rad[:, 1], rad[:, 2]), num_keys=1)
        rad = jnp.stack([r0, r1, r2], axis=-1)
    if with_stats:
        return rad, {"extension_segments": state[-2],
                     "diffuse_vertices": state[-1]}
    if collect_aux:
        return rad, aux_stack
    return rad


trace_direct = partial(trace, direct_only=True)
