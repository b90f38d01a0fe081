"""Many-sphere differentiable path: pallas discrete facts + XLA re-walk.

The hand-written pallas adjoint (`ops.pallas_grad`) unrolls every sphere
scan in both sweeps and is capped at `pallas_trace._UNROLL_CAP` (64)
spheres; beyond it the differentiable path used to fall back to the XLA
tracer at its rematerialization bound (complex.scn 512x384 fwd+bwd was
221.6 ms/sample, round 2). This module breaks that bound with a split
that matches what the gradient ESTIMATOR actually needs:

1. **Pallas forward for the discrete facts only.** One per-depth bounce
   kernel call (the `ops.pallas_bounce` megakernel body with
   ``want_aux=True``) produces, per depth, the nearest-hit id and the
   NEE/VPL occlusion masks — the ONLY quantities whose computation is
   O(N*S). These are exactly the quantities the estimator DETACHES
   (hit ids and occlusion carry no gradient; see diff/gradients.py), so
   taking them from a non-differentiable kernel loses nothing.
2. **Differentiable XLA re-walk conditioned on those facts.** The
   standard tracer (`path_tracer.trace(aux=...)`) re-runs the walk with
   every sphere scan replaced by an aux lookup: the hit distance is
   re-derived from the (one-hot-gathered) winning sphere alone
   (`intersect.sphere_root` — bitwise the scan's root), occlusion is
   read off the masks. All continuous structure — hit distance, normal,
   NEE geometry, throughput, Fresnel weights — is recomputed in the
   differentiable graph, so ``jax.grad`` of the re-walk IS the detached-
   path gradient of the full tracer, while fwd+bwd costs
   O(N*(L+K)*D) elementwise plus one [N,S]@[S,11] attribute matmul per
   bounce instead of O(N*S*D) scans re-materialized in the backward.

The function pair being adjointed is the eye kernel of
``/root/reference/src/device.cu:544-791`` with the NEE/VPL gather at
``device.cu:457-542``; gradient policy identical to `diff/gradients.py`.

Gradient parity with `jax.grad` of the full-scan XLA tracer is asserted
by tests/test_bounce_grad.py (elementwise + finite differences, ~100 and
783 spheres).
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
    IntegratorConfig,
    Rays,
    Scene,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import path_tracer
from gpu_bidirectional_raytracer_tpu.ops import pallas_trace as mk

_LANES = 128


def _aux_kernel(scene_ref, vpl_ref, tape_ref, ox_ref, oy_ref, oz_ref,
                dx_ref, dy_ref, dz_ref, rr_ref, rg_ref, rb_ref,
                tr_ref, tg_ref, tb_ref, sp_ref, al_ref,
                *out_refs, cfg: IntegratorConfig,
                light_idx: tuple[int, ...], n_spheres: int, n_vpl: int,
                use_vpl: bool, direct_only: bool, n_aux: int):
    """`pallas_bounce._bounce_kernel` + aux fact outputs.

    ``out_refs``: 14 state planes followed by ``n_aux`` aux planes —
    hit_id (f32, -1 = miss), L NEE occlusion masks, V VPL occlusion
    masks. Dead tiles pass state through and write miss facts.
    """
    f32 = jnp.float32
    alive_in = al_ref[:]
    live_tile = jnp.max(alive_in) > 0.0
    state_out = out_refs[:14]
    aux_out = out_refs[14:]

    @pl.when(live_tile)
    def _():
        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:],
                 rr_ref[:], rg_ref[:], rb_ref[:],
                 tr_ref[:], tg_ref[:], tb_ref[:],
                 sp_ref[:] > 0.5, alive_in > 0.5)
        out, aux = mk._bounce_step(
            scene_ref, vpl_ref, lambda i: tape_ref[i], state,
            cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
            n_vpl=n_vpl, use_vpl=use_vpl, direct_only=direct_only,
            force_unroll=True, want_aux=True)
        for ref, val in zip(state_out[:12], out[:12]):
            ref[:] = val
        state_out[12][:] = out[12].astype(f32)
        state_out[13][:] = out[13].astype(f32)
        for ref, val in zip(aux_out, aux):
            ref[:] = val

    @pl.when(jnp.logical_not(live_tile))
    def _():
        for ref, src in zip(state_out,
                            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                             rr_ref, rg_ref, rb_ref, tr_ref, tg_ref, tb_ref,
                             sp_ref, al_ref)):
            ref[:] = src[:]
        shape = alive_in.shape
        aux_out[0][:] = jnp.full(shape, -1.0, f32)       # hit_id: miss
        for ref in aux_out[1:]:
            ref[:] = jnp.ones(shape, f32)                # occ: blocked


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx",
                                             "direct_only", "tile_rows",
                                             "interpret", "lane_total",
                                             "frame_dims"))
def trace_bounce_aux(scene: Scene, cfg: IntegratorConfig,
                     light_idx: tuple[int, ...], rays: Rays, key: Array,
                     sample: Array, vpls: VplBuffer | None = None,
                     vlp_index: Array | None = None,
                     direct_only: bool = False,
                     tile_rows: int = 16, interpret: bool = False,
                     lane_offset=None, lane_total: int | None = None,
                     frame_dims: tuple[int, int] | None = None):
    """Run the per-depth bounce kernel over all depths collecting the
    discrete facts. Returns ``(aux, rad)`` where ``aux = (hit_id [D,N]
    int32, occ_light [D,N,L] bool, occ_vpl [D,N,V] bool | None)`` is the
    exact tuple `path_tracer.trace(aux=...)` consumes and ``rad [N,3]``
    is the kernel's own radiance (used by parity tests; the re-walk
    recomputes it differentiably).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    n = rays.o.shape[0]
    L = max(len(light_idx), 1)
    per_depth, _ = mk._tape_rows(cfg, L)
    D = cfg.max_depth

    tile = tile_rows * _LANES
    n_pad = ((n + tile - 1) // tile) * tile
    rows_total = n_pad // _LANES

    # Block-tiled pixel layout (see `pallas_bounce.trace_pallas_bounce`):
    # compact image rectangles per kernel tile so spatially clustered
    # path deaths empty whole tiles for the dead-tile guard. Pure
    # reshape/transpose; facts come back un-permuted below.
    from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce import _BLOCK_W

    bw = _BLOCK_W
    bh = tile // bw
    use_blocks = (frame_dims is not None and n_pad == n
                  and frame_dims[0] * frame_dims[1] == n
                  and frame_dims[0] % bw == 0 and frame_dims[1] % bh == 0)
    if use_blocks:
        W, H = frame_dims

        def to_blocks(x):
            return (x.reshape(H // bh, bh, W // bw, bw)
                    .transpose(0, 2, 1, 3).reshape(-1))

        def from_blocks(x):
            return (x.reshape(H // bh, W // bw, bh, bw)
                    .transpose(0, 2, 1, 3).reshape(-1))
    else:
        def to_blocks(x):
            return x

        def from_blocks(x):
            return x

    def plane(x, fill=0.0):
        return jnp.pad(to_blocks(x), (0, n_pad - n), constant_values=fill
                       ).reshape(rows_total, _LANES)

    state = (
        plane(rays.o[:, 0]), plane(rays.o[:, 1]), plane(rays.o[:, 2]),
        plane(rays.d[:, 0]), plane(rays.d[:, 1]), plane(rays.d[:, 2], 1.0),
        jnp.zeros((rows_total, _LANES), jnp.float32),   # rad r
        jnp.zeros((rows_total, _LANES), jnp.float32),   # rad g
        jnp.zeros((rows_total, _LANES), jnp.float32),   # rad b
        jnp.ones((rows_total, _LANES), jnp.float32),    # tp r
        jnp.ones((rows_total, _LANES), jnp.float32),    # tp g
        jnp.ones((rows_total, _LANES), jnp.float32),    # tp b
        jnp.ones((rows_total, _LANES), jnp.float32),    # specular
        plane(jnp.ones((n,), jnp.float32)),             # alive (pad dead)
    )

    scene_tab = mk._scene_table(scene)
    vpl_tab, n_vpl, use_vpl = mk._vpl_table(cfg, vpls, vlp_index)
    n_aux = 1 + L + (n_vpl if use_vpl else 0)
    kernel = functools.partial(
        _aux_kernel, cfg=cfg, light_idx=tuple(light_idx),
        n_spheres=scene.num_spheres, n_vpl=n_vpl, use_vpl=use_vpl,
        direct_only=direct_only, n_aux=n_aux)

    rb = mk._row_block(tile_rows)
    out_shape = tuple(jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                      for _ in range(14 + n_aux))
    call = pl.pallas_call(
        kernel,
        grid=(rows_total // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # scene
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # vpls
            pl.BlockSpec((per_depth, tile_rows, _LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),  # tape
        ] + [rb] * 14,
        out_specs=tuple([rb] * (14 + n_aux)),
        out_shape=out_shape,
        # Same scoped-VMEM note as ops.pallas_bounce: the fully unrolled
        # many-sphere bounce body exceeds Mosaic's default 16MB stack.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )

    def body(state, depth):
        lu = rng.site_uniforms(key, sample, depth, rng.LIGHT_UV, 2 * L, n,
                               lane_offset=lane_offset,
                               lane_total=lane_total)
        du = rng.site_uniforms(key, sample, depth, rng.DIFF_UV, 2, n,
                               lane_offset=lane_offset,
                               lane_total=lane_total)
        ru = rng.site_uniforms(key, sample, depth, rng.REFR_RR, 1, n,
                               lane_offset=lane_offset,
                               lane_total=lane_total)
        rows = jnp.concatenate(
            [lu.reshape(L, 2, n)[:, 0, :], lu.reshape(L, 2, n)[:, 1, :],
             du, ru], axis=0)
        if use_blocks:
            rows = jax.vmap(to_blocks)(rows)
        tape = jnp.pad(rows, ((0, 0), (0, n_pad - n))).reshape(
            per_depth, rows_total, _LANES)
        outs = call(scene_tab, vpl_tab, tape, *state)
        return tuple(outs[:14]), tuple(outs[14:])

    state, aux_planes = jax.lax.scan(body, state, jnp.arange(D))

    def flat(x):  # [D, rows, 128] -> [D, n], back in pixel order
        return jax.vmap(from_blocks)(x.reshape(D, n_pad)[:, :n])

    hit_id = flat(aux_planes[0]).astype(jnp.int32)
    occ_light = jnp.stack([flat(a) > 0.5
                           for a in aux_planes[1:1 + L]], axis=-1)
    occ_vpl = None
    if use_vpl and n_vpl > 0:
        occ_vpl = jnp.stack([flat(a) > 0.5
                             for a in aux_planes[1 + L:]], axis=-1)
    rad = jnp.stack([from_blocks(state[6].reshape(-1)[:n]),
                     from_blocks(state[7].reshape(-1)[:n]),
                     from_blocks(state[8].reshape(-1)[:n])], axis=-1)
    return (hit_id, occ_light, occ_vpl), rad


def trace_bounce_diff(scene: Scene, cfg: IntegratorConfig,
                      light_idx: tuple[int, ...], rays: Rays, key: Array,
                      sample: Array, vpls: VplBuffer | None = None,
                      vlp_index: Array | None = None,
                      direct_only: bool = False,
                      tile_rows: int = 16, interpret: bool = False,
                      lane_offset=None, lane_total: int | None = None,
                      facts: str = "auto",
                      frame_dims: tuple[int, int] | None = None) -> Array:
    """Differentiable drop-in for `path_tracer.trace` beyond the 64-sphere
    pallas-adjoint cap: detached facts + XLA re-walk (module docstring).

    ``facts``: where the discrete facts come from. ``'pallas'`` is the
    fast path (the per-depth bounce kernel); ``'xla'`` collects them with
    the full-scan XLA walk (`trace(collect_aux=True)`) — same facts by
    construction, used off-TPU where interpret-mode pallas compiles of
    many-sphere unrolled bodies are prohibitive. ``'auto'`` = pallas on
    TPU, xla elsewhere. The facts pass sees stop-gradiented inputs (facts
    are detached by the estimator anyway); the returned radiance is the
    re-walk's, so `jax.grad` through this function is the detached-path
    gradient of the full tracer.
    """
    if facts == "auto":
        facts = "pallas" if (jax.default_backend() == "tpu"
                             and not interpret) else "xla"
    sg = jax.lax.stop_gradient
    if facts == "pallas":
        aux, _ = trace_bounce_aux(
            sg(scene), cfg, light_idx, sg(rays), key, sample,
            vpls=None if vpls is None else sg(vpls),
            vlp_index=None if vlp_index is None else sg(vlp_index),
            direct_only=direct_only, tile_rows=tile_rows,
            interpret=interpret,
            lane_offset=lane_offset, lane_total=lane_total,
            frame_dims=frame_dims)
    else:
        _, aux = path_tracer.trace(
            sg(scene), cfg, light_idx, sg(rays), key, sample,
            vpls=None if vpls is None else sg(vpls),
            vlp_index=None if vlp_index is None else sg(vlp_index),
            direct_only=direct_only,
            lane_offset=lane_offset, lane_total=lane_total,
            collect_aux=True)
    aux = jax.lax.stop_gradient(aux)
    return path_tracer.trace(scene, cfg, light_idx, rays, key, sample,
                             vpls=vpls, vlp_index=vlp_index,
                             direct_only=direct_only, remat=True,
                             lane_offset=lane_offset, lane_total=lane_total,
                             aux=aux)
