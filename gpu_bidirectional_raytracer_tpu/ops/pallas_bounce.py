"""Per-depth fused bounce kernel: the many-sphere megakernel.

The fused megakernel (`ops.pallas_trace`) unrolls every bounce AND every
sphere scan in one kernel — at complex.scn scale (783 spheres x 3 scans x
7 bounces ~ 0.5M instructions) that cannot compile. The per-scan kernels
(`ops.pallas_scan`) compile fine but pay 3 kernel launches + 2 full state
round-trips through HBM per bounce. This module is the middle point that
wins at scale: ONE pallas call per bounce executing the megakernel's
whole bounce body (`pallas_trace._bounce_step` — nearest-hit scan, fused
attribute gather, emitter/NEE/VPL shading, BSDF scatter) with the sphere
scans unrolled over the VMEM scene table (force_unroll), and a per-tile
liveness guard that skips everything for all-dead tiles.

Called per depth from an XLA `lax.fori_loop` (`trace_pallas_bounce`), so
the kernel is traced/compiled once and reused by every bounce. Same
estimator and `rng.site_uniforms` tape as `path_tracer.trace` /
`trace_pallas` — parity is tested in tests/test_pallas_bounce.py.

Forward rendering only (no VJP through pallas_call).
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
from gpu_bidirectional_raytracer_tpu.ops import pallas_trace as mk

_LANES = 128
# Block-tiled pixel layout (see trace_pallas_bounce): a default kernel
# tile (16 rows x 128 lanes = 2048 px) maps to a 64-wide x 32-tall image
# rectangle instead of four full 512-px rows.
_BLOCK_W = 64


def _bounce_kernel(scene_ref, vpl_ref, tape_ref, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, rr_ref, rg_ref, rb_ref,
                   tr_ref, tg_ref, tb_ref, sp_ref, al_ref,
                   oox, ooy, ooz, odx, ody, odz, orr, org, orb,
                   otr, otg, otb, osp, oal, *,
                   cfg: IntegratorConfig, light_idx: tuple[int, ...],
                   n_spheres: int, n_vpl: int, use_vpl: bool,
                   direct_only: bool):
    f32 = jnp.float32
    alive_in = al_ref[:]
    live_tile = jnp.max(alive_in) > 0.0

    @pl.when(live_tile)
    def _():
        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:],
                 rr_ref[:], rg_ref[:], rb_ref[:],
                 tr_ref[:], tg_ref[:], tb_ref[:],
                 sp_ref[:] > 0.5, alive_in > 0.5)
        out = mk._bounce_step(
            scene_ref, vpl_ref, lambda i: tape_ref[i], state,
            cfg=cfg, light_idx=light_idx, n_spheres=n_spheres,
            n_vpl=n_vpl, use_vpl=use_vpl, direct_only=direct_only,
            force_unroll=True)
        for ref, val in zip((oox, ooy, ooz, odx, ody, odz, orr, org, orb,
                             otr, otg, otb), out[:12]):
            ref[:] = val
        osp[:] = out[12].astype(f32)
        oal[:] = out[13].astype(f32)

    @pl.when(jnp.logical_not(live_tile))
    def _():
        # Dead tile: state passes through untouched.
        for ref, src in zip((oox, ooy, ooz, odx, ody, odz, orr, org, orb,
                             otr, otg, otb, osp, oal),
                            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                             rr_ref, rg_ref, rb_ref, tr_ref, tg_ref, tb_ref,
                             sp_ref, al_ref)):
            ref[:] = src[:]


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx",
                                             "direct_only", "tile_rows",
                                             "interpret", "lane_total",
                                             "frame_dims"))
def trace_pallas_bounce(scene: Scene, cfg: IntegratorConfig,
                        light_idx: tuple[int, ...], rays: Rays, key: Array,
                        sample: Array, vpls: VplBuffer | None = None,
                        vlp_index: Array | None = None,
                        direct_only: bool = False,
                        tile_rows: int = 16, interpret: bool = False,
                        lane_offset=None,
                        lane_total: int | None = None,
                        frame_dims: tuple[int, int] | None = None) -> Array:
    """Drop-in replacement for `path_tracer.trace` (forward only) built
    on the per-depth bounce kernel. Preferred above
    `pallas_trace._UNROLL_CAP` spheres. ``tile_rows=16`` measured best on
    v5e at complex.scn scale (25.0 ms/sample vs 31.5 at 8; 32 exceeds the
    Mosaic scoped-VMEM stack even at the raised cap).

    ``frame_dims=(width, height)`` enables the BLOCK-TILED pixel layout
    (the broad-phase answer to VERDICT r4 #4): lanes are reordered so
    each kernel tile covers a compact ``_BLOCK_H x _BLOCK_W``-pixel
    rectangle instead of ``tile_rows * 128 / width`` full image rows.
    Spatially clustered path deaths then empty whole tiles, and the
    kernel's all-dead-tile guard skips their 783-sphere scans — the
    deep-bounce tail stops being billed at full frame cost. The
    reorder is a pure reshape/transpose (free on TPU) applied to the
    ray/tape/result planes, so every lane keeps its pixel's global tape
    columns and the image is BITWISE-equal to the natural layout
    (asserted in tests/test_pallas_bounce.py).

    Two rejected designs, measured this round on v5e (complex.scn
    512x384, uncompacted baseline ~20 ms/sample):
    - per-lane alive compaction between depths (stable partition +
      per-plane gathers, or lax.sort with the planes as operands):
      ~480-500 ms/sample — the XLA gather/scatter/sort machinery for
      196K lanes between pallas calls costs ~70 ms per depth however
      it is formulated (TPU scatters serialize; big multi-operand
      sorts pay hundreds of bitonic passes);
    - geometric per-tile sphere culls (interval bounds on the tile ray
      bundle): with full-row tiles the bounds keep 72-100% of spheres
      past depth 0 (CPU census), and with block tiles the win is
      subsumed by dead-tile skipping.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    n = rays.o.shape[0]
    L = max(len(light_idx), 1)
    per_depth, _ = mk._tape_rows(cfg, L)

    tile = tile_rows * _LANES
    n_pad = ((n + tile - 1) // tile) * tile
    rows_total = n_pad // _LANES

    # Block-tiled layout: permute flat pixel order so lane block
    # [t*tile, (t+1)*tile) is a (_BLOCK_H, _BLOCK_W) image rectangle.
    # Pure reshape/transpose (and its inverse) — never an XLA gather.
    bw, bh = _BLOCK_W, tile // _BLOCK_W
    use_blocks = (frame_dims is not None and n_pad == n
                  and frame_dims[0] * frame_dims[1] == n
                  and frame_dims[0] % bw == 0 and frame_dims[1] % bh == 0
                  and tile_rows * _LANES == bw * bh)

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
    kernel = functools.partial(
        _bounce_kernel, cfg=cfg, light_idx=tuple(light_idx),
        n_spheres=scene.num_spheres, n_vpl=n_vpl, use_vpl=use_vpl,
        direct_only=direct_only)

    rb = mk._row_block(tile_rows)
    out_shape = tuple(jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                      for _ in range(14))
    call = pl.pallas_call(
        kernel,
        grid=(rows_total // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # scene
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # vpls
            pl.BlockSpec((per_depth, tile_rows, _LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),  # tape
        ] + [rb] * 14,
        out_specs=tuple([rb] * 14),
        out_shape=out_shape,
        # The fully unrolled 783-sphere x 3-scan bounce body spills past
        # Mosaic's default 16MB scoped-VMEM stack (measured 21.4MB);
        # v5e has 128MB VMEM, so raise the cap for this kernel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )

    def body(depth, state):
        # This depth's tape block [R, rows, 128], same sites as the
        # megakernel/_build_tape layout; each row gets the same block
        # transpose as the lanes so values stay with their pixels.
        lu = rng.site_uniforms(key, sample, depth, rng.LIGHT_UV, 2 * L,
                               n, lane_offset=lane_offset,
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
        return call(scene_tab, vpl_tab, tape, *state)

    state = jax.lax.fori_loop(0, cfg.max_depth, body, tuple(state))
    rad = jnp.stack([from_blocks(state[6].reshape(-1)[:n]),
                     from_blocks(state[7].reshape(-1)[:n]),
                     from_blocks(state[8].reshape(-1)[:n])], axis=-1)
    return rad[:n]
