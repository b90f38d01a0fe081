"""Progressive bidirectional render scheduler.

Replaces the reference's GLUT-driven ``flag`` state machine
(``IdleFunc``/``UpdateRendering``/``UpdateRendering2``,
``display_func.c:192-217`` + ``smallpt_cpu.c:265-362``) with an explicit,
functional schedule. The reference's machine has two documented defects —
the light pass never re-fires from the idle loop and ``vlp_index`` slides
off the end of ``dev_lp`` (SURVEY.md 2.20) — this implements the *intent*:

    every (MAX_ITER - 1) eye passes: refresh the VPL buffer and advance the
    gather window by MAX_VLP (wrapping modulo LIGHT_POINTS).

One :func:`render_pass` = one fused jitted step: (conditionally) trace
light subpaths, trace one eye sample for every pixel, and fold the result
into the running per-pixel mean (``device.cu:774-788``). All state lives in
a :class:`RenderState` pytree that stays device-resident across passes —
the TPU analogue of ``dev_colors``/``dev_counter`` never leaving HBM.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from gpu_bidirectional_raytracer_tpu import camera as cam_mod
from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    RenderState,
    Scene,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer, path_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices

# Route scenes with more spheres than this to the XLA tracer: the fused
# megakernel's unrolled scans win below it, the vectorized all-pairs XLA
# formulation wins above it (see eye_accumulate_pass routing note).
_PALLAS_SPHERE_LIMIT = 64


def init_state(width: int, height: int, cfg: IntegratorConfig,
               seed: int = 0, rng_impl: str | None = None) -> RenderState:
    """Fresh accumulation state (the ``ReInit`` analogue, smallpt_cpu.c:373).

    ``rng_impl``: PRNG implementation for the render tape (rng.py module
    docstring has the full contract table). ``None`` (the default)
    resolves to ``'mix32'`` — the hand-rolled u32 counter hash whose
    bitstream is frozen and bitwise-replayable across backends,
    shardings, and tilings at ~4x fewer VPU ops than threefry (the
    threefry tape was measured at ~half of every sustained pass,
    artifacts/MEGAKERNEL.json — VERDICT r3 #1). ``'threefry'`` is the
    rounds-1..3 contract impl (heritage replay of old checkpoints).
    ``'rbg'`` is the FAST-TAPE serving mode: XLA's hardware
    RngBitGenerator, the cheapest tape, still counter-addressed and
    deterministic WITHIN one backend+process, but its bit-stream is not
    guaranteed stable across XLA backends/versions, so golden CPU==TPU
    replay and cross-impl resume do not apply. Every draw goes through
    `rng.site_uniforms` (the key's dtype carries the impl); estimator
    and tape addressing are identical under all three.
    """
    return RenderState(
        colors=jnp.zeros((height, width, 3), dtype=jnp.float32),
        counter=jnp.zeros((height, width), dtype=jnp.int32),
        vpls=VplBuffer.zeros(cfg.vpl_depth, cfg.light_points),
        vlp_index=jnp.int32(0),
        sample=jnp.int32(0),
        key=rng.make_key(seed, rng_impl),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "direct_only",
                                             "backend"))
def render_pass(scene: Scene, cam: Camera, state: RenderState,
                cfg: IntegratorConfig, width: int, height: int,
                light_idx: tuple[int, ...],
                direct_only: bool = False,
                backend: str = "xla") -> RenderState:
    """One progressive pass over every pixel. Pure; ONE jitted program
    (so the stepped and `render_chunk` paths compile the same expression
    — bitwise-equal pass-for-pass). The bitwise tiled == untiled
    guarantee lives on the XLA banded path (`tiled_pass`), which keeps
    `vpl_update` as the same compiled program the tiled driver uses; this
    pallas fused-camera pass is its statistically-identical peak-
    throughput realization (tests/test_render.py::TestTiledRendering).

    ``backend='pallas'`` runs the fused eye-trace megakernel
    (`ops.pallas_trace`) — ~2x the XLA tracer's throughput on TPU, same
    estimator/tape (statistically identical; per-pixel float divergence
    only).
    """
    # -- Bidirectional schedule: refresh VPLs + slide window when due.
    if cfg.use_vpl and light_idx:
        vpls, vlp_index = vpl_update(scene, state, cfg, light_idx)
        # Stage barrier: see tiled_pass — keeps this fused program's VPL
        # subgraph rounding identical to the standalone vpl_update.
        vpls, vlp_index = jax.lax.optimization_barrier((vpls, vlp_index))
    else:
        vpls, vlp_index = state.vpls, state.vlp_index
    return eye_accumulate_pass(scene, cam, state, vpls, vlp_index, cfg,
                               width, height, light_idx, direct_only,
                               backend)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "direct_only",
                                             "backend"))
def eye_accumulate_pass(scene: Scene, cam: Camera, state: RenderState,
                        vpls: VplBuffer, vlp_index: Array,
                        cfg: IntegratorConfig, width: int, height: int,
                        light_idx: tuple[int, ...],
                        direct_only: bool = False,
                        backend: str = "xla") -> RenderState:
    """The fused eye-trace + progressive-mean step (VPLs precomputed)."""
    n = width * height
    px, py = cam_mod.pixel_grid(width, height)

    # -- Eye pass: one jittered sample per pixel (device.cu:560-600).
    # Two pallas designs by scene size (measured on v5e, complex.scn
    # 512x384): up to `_PALLAS_SPHERE_LIMIT` spheres the fused megakernel
    # (all bounces in one kernel, in-kernel camera) wins; above it the XLA
    # tracer orchestrates bounces with tile-guarded unrolled scan kernels
    # (`ops.pallas_scan`) — the all-pairs XLA scans take 67ms/pass there,
    # the guarded kernels ~6x less. A fori_loop-streamed megakernel was
    # measured too (262ms/pass — per-sphere scalar reads serialize); it
    # remains only as the no-XLA-fallback capability (tests/test_pallas.py).
    if backend == "pallas" and not direct_only and (
            scene.num_spheres <= _PALLAS_SPHERE_LIMIT):
        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (
            trace_pallas_camera,
        )

        radiance = trace_pallas_camera(
            scene, cfg, light_idx, cam, width, height, state.key,
            state.sample, vpls=vpls if cfg.use_vpl else None,
            vlp_index=vlp_index,
        ).reshape(height, width, 3)
    else:
        jit_uv = rng.site_uniforms(state.key, state.sample, 0,
                                   rng.CAM_JITTER, 2, n)
        ju, jv = jit_uv[0], jit_uv[1]
        if cfg.stratify > 0:
            ju, jv = cam_mod.stratify_jitter(ju, jv, state.sample,
                                             cfg.stratify)
        rays = cam_mod.primary_rays(cam, width, height, ju, jv, px, py)
        if backend == "pallas":
            # Many-sphere fused path: one bounce kernel per depth.
            from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce import (
                trace_pallas_bounce,
            )

            radiance = trace_pallas_bounce(
                scene, cfg, light_idx, rays, state.key, state.sample,
                vpls=vpls if cfg.use_vpl else None, vlp_index=vlp_index,
                direct_only=direct_only,
                frame_dims=(width, height),   # block tiles: dead regions
            ).reshape(height, width, 3)       # skip whole kernel tiles
        else:
            radiance = path_tracer.trace(
                scene, cfg, light_idx, rays, state.key, state.sample,
                vpls=vpls if cfg.use_vpl else None,
                vlp_index=vlp_index,
                direct_only=direct_only,
            ).reshape(height, width, 3)

    # -- Progressive mean with the per-pixel sample cap
    # (device.cu:774-788; cap literal at :607).
    colors, counter = _accumulate(state.colors, state.counter, radiance,
                                  cfg.max_samples)
    return RenderState(
        colors=colors,
        counter=counter,
        vpls=vpls,
        vlp_index=vlp_index,
        sample=state.sample + 1,
        key=state.key,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx"))
def light_splat_pass(scene: Scene, cam: Camera, state: RenderState,
                     cfg: IntegratorConfig, width: int, height: int,
                     light_idx: tuple[int, ...]) -> RenderState:
    """One light-tracing pass splatted onto the film: the living
    ``RadianceLightTracing`` integrator mode (`light_tracer.splat_to_film`
    — the reference's own splatting body is dead code). Each pass traces
    `cfg.light_points` fresh light subpaths; the pass's film estimate is
    the importance-weighted splat SUM divided by the per-light lane count
    (the unbiased light-tracing estimator — see splat_to_film's weight
    derivation; a pixel receiving no splats this pass legitimately
    sampled 0), folded into a per-PASS running mean like the eye
    integrators. Pure; same RenderState."""
    vpls = light_tracer.trace_light_paths(scene, cfg, light_idx,
                                          state.key, state.sample)
    add_c, add_n = light_tracer.splat_to_film(scene, cam, cfg, vpls,
                                              width, height, light_idx)
    n_per_light = cfg.light_points // max(len(light_idx), 1)
    frame = add_c / jnp.float32(max(n_per_light, 1))
    k = state.counter.astype(jnp.float32)[..., None]
    colors = (state.colors * k + frame) / (k + 1.0)
    return RenderState(
        colors=colors,
        counter=state.counter + 1,
        vpls=vpls,
        vlp_index=state.vlp_index,
        sample=state.sample + 1,
        key=state.key,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx"))
def light_splat_chunk(scene: Scene, cam: Camera, state: RenderState,
                      n_passes: Array, cfg: IntegratorConfig, width: int,
                      height: int,
                      light_idx: tuple[int, ...]) -> RenderState:
    """``n_passes`` light-splat passes chained inside one jitted program —
    the `render_chunk` analogue for the light-tracing integrator
    (`Renderer.step_light`). Same dynamic-trip-count design; the body is
    exactly `light_splat_pass`."""
    return jax.lax.fori_loop(
        0, n_passes,
        lambda i, st: light_splat_pass(scene, cam, st, cfg, width,
                                       height, light_idx),
        state)


def _accumulate(colors: Array, counter: Array, radiance: Array,
                max_samples: int) -> tuple[Array, Array]:
    """Running-mean update, frozen for pixels at the sample cap."""
    live = counter < max_samples
    k1 = counter.astype(jnp.float32)[..., None]
    updated = (colors * k1 + radiance) / (k1 + 1.0)
    colors = jnp.where(live[..., None], updated, colors)
    counter = jnp.where(live, counter + 1, counter)
    return colors, counter


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height"))
def frame_rays(cam: Camera, cfg: IntegratorConfig, width: int, height: int,
               key: Array, sample: Array):
    """Jittered primary rays for the whole frame (device.cu:560-600).

    Generated ONCE per pass and sliced per band by the tiled driver:
    band-shaped ray generation can round 1 ulp differently under XLA's
    shape-dependent fusion, which would break tiled == untiled bitwise
    equality. Full-frame rays are ~24 bytes/pixel — negligible next to the
    per-band intersection tensor the tiling exists to bound.
    """
    n = width * height
    px, py = cam_mod.pixel_grid(width, height)
    jit_uv = rng.site_uniforms(key, sample, 0, rng.CAM_JITTER, 2, n)
    ju, jv = jit_uv[0], jit_uv[1]
    if cfg.stratify > 0:
        ju, jv = cam_mod.stratify_jitter(ju, jv, sample, cfg.stratify)
    return cam_mod.primary_rays(cam, width, height, ju, jv, px, py)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "band_h", "light_idx",
                                             "backend", "direct_only"))
def eye_band_pass(scene: Scene, rays, cfg: IntegratorConfig,
                  width: int, height: int, y0: Array, band_h: int,
                  light_idx: tuple[int, ...], key: Array, sample: Array,
                  vpls: VplBuffer, vlp_index: Array,
                  backend: str = "xla", direct_only: bool = False) -> Array:
    """Trace one horizontal band of pixel rows — the memory-bounded path
    for large frames x large scenes (the all-pairs intersection tensor is
    ``band_h*width x spheres`` instead of the full frame).

    ``rays`` is the band's slice of the full-frame `frame_rays` output; the
    band draws columns ``[y0*width, (y0+band_h)*width)`` of the GLOBAL
    per-frame random tape (`rng.site_uniforms` with ``lane_offset``), so a
    tiled render is bitwise-equal to the monolithic one — the same replay
    invariance the sharded path guarantees (rng.py:63-76).
    """
    frame_n = width * height
    offset = y0.astype(jnp.int32) * width
    # Same pallas eligibility rule as render_pass (see the routing note
    # there): forward estimator, small-enough sphere table.
    if (backend == "pallas" and not direct_only
            and scene.num_spheres <= _PALLAS_SPHERE_LIMIT):
        from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import trace_pallas

        rad = trace_pallas(scene, cfg, light_idx, rays, key, sample,
                           vpls=vpls if cfg.use_vpl else None,
                           vlp_index=vlp_index,
                           lane_offset=offset, lane_total=frame_n)
    elif backend == "pallas":
        from gpu_bidirectional_raytracer_tpu.ops.pallas_bounce import (
            trace_pallas_bounce,
        )

        rad = trace_pallas_bounce(scene, cfg, light_idx, rays, key, sample,
                                  vpls=vpls if cfg.use_vpl else None,
                                  vlp_index=vlp_index,
                                  direct_only=direct_only,
                                  lane_offset=offset, lane_total=frame_n)
    else:
        rad = path_tracer.trace(scene, cfg, light_idx, rays, key,
                                sample,
                                vpls=vpls if cfg.use_vpl else None,
                                vlp_index=vlp_index,
                                direct_only=direct_only,
                                lane_offset=offset, lane_total=frame_n)
    return rad.reshape(band_h, width, 3)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "tile_rows",
                                             "backend", "direct_only"))
def tiled_pass(scene: Scene, cam: Camera, state: RenderState,
               cfg: IntegratorConfig, width: int, height: int,
               light_idx: tuple[int, ...], tile_rows: int | None,
               backend: str = "xla",
               direct_only: bool = False) -> RenderState:
    """One full progressive pass via the BANDED program (one band when
    ``tile_rows`` is None) — the pure body shared by `Renderer._step_tiled`
    and `render_chunk` (many passes fused in one jit). Band boundaries
    are static; every random draw is a window of the global tape, so any
    ``tile_rows`` is bitwise-equal to the monolithic pass
    (tests/test_render.py::TestTiledRendering). Jitted as ONE program so
    the stepped and chunked paths compile the same expression (an eager
    accumulate would round fma contractions 1 ulp differently than the
    fused chunk body — measured on simple.scn)."""
    if cfg.use_vpl and light_idx:
        vpls, vlp_index = vpl_update(scene, state, cfg, light_idx)
        # Stage barriers pin each stage's fusion to its own subgraph, so
        # this one fused program rounds exactly like the per-stage
        # programs did (XLA cross-stage fma re-fusion is 1-ulp visible),
        # keeping stepped == chunked == tiled bitwise.
        vpls, vlp_index = jax.lax.optimization_barrier((vpls, vlp_index))
    else:
        vpls, vlp_index = state.vpls, state.vlp_index
    rays = frame_rays(cam, cfg, width, height, state.key, state.sample)
    rays = jax.lax.optimization_barrier(rays)
    rows = tile_rows or height
    bands = []
    y0 = 0
    while y0 < height:
        bh = min(rows, height - y0)
        band_rays = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, y0 * width, bh * width, axis=0), rays)
        bands.append(eye_band_pass(
            scene, band_rays, cfg, width, height, jnp.int32(y0), bh,
            light_idx, state.key, state.sample, vpls, vlp_index,
            backend, direct_only))
        y0 += bh
    radiance = jnp.concatenate(bands, axis=0)
    radiance = jax.lax.optimization_barrier(radiance)
    colors, counter = _accumulate(state.colors, state.counter, radiance,
                                  cfg.max_samples)
    return RenderState(colors=colors, counter=counter, vpls=vpls,
                       vlp_index=vlp_index, sample=state.sample + 1,
                       key=state.key)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height",
                                             "light_idx", "tile_rows",
                                             "backend", "direct_only"))
def render_chunk(scene: Scene, cam: Camera, state: RenderState,
                 n_passes: Array, cfg: IntegratorConfig, width: int,
                 height: int, light_idx: tuple[int, ...],
                 tile_rows: int | None = None, backend: str = "xla",
                 direct_only: bool = False) -> RenderState:
    """``n_passes`` progressive passes chained INSIDE one jitted program.

    The serving-mode fast path: per-pass dispatch costs one host->device
    round trip — ~100 us locally, ~90 ms over a remote-TPU tunnel —
    which at the megakernel's ~1.7 ms/pass (cornell 512x512, v5e) makes
    the dispatch, not the render, the bottleneck of `Renderer.step`
    loops. Chaining the passes in a dynamic-trip-count `fori_loop`
    amortizes it away (measured sustained 1.72 ms/pass vs 3.42 ms
    stepped over the tunnel). ``n_passes`` is a TRACED scalar: one
    compile serves any chunk size.

    Semantics: the loop body is exactly `Renderer.step`'s pass body —
    the fused in-kernel-camera megakernel for the untiled pallas
    backend, the banded program otherwise — so a chunked render equals
    the stepped render pass-for-pass; asserted bitwise in
    tests/test_render.py::TestChunkedRendering on the XLA backend.
    """
    if backend == "pallas" and not tile_rows:
        def body(st):
            return render_pass(scene, cam, st, cfg, width, height,
                               light_idx, direct_only, backend)
    else:
        def body(st):
            return tiled_pass(scene, cam, st, cfg, width, height,
                              light_idx, tile_rows, backend, direct_only)
    return jax.lax.fori_loop(0, n_passes, lambda i, st: body(st), state)


@functools.partial(jax.jit, static_argnames=("cfg", "light_idx"))
def vpl_update(scene: Scene, state: RenderState, cfg: IntegratorConfig,
               light_idx: tuple[int, ...]):
    """The bidirectional schedule step alone (for the tiled driver)."""
    period = max(cfg.max_iter - 1, 1)
    due = (state.sample % period) == 0

    def refresh(_):
        vpls = light_tracer.trace_light_paths(scene, cfg, light_idx,
                                              state.key, state.sample)
        nxt = state.vlp_index + cfg.max_vlp
        if not cfg.stale_vpl_window:
            nxt = nxt % cfg.light_points   # wrap = the documented intent
        vlp_index = jnp.where(state.sample == 0, jnp.int32(0), nxt)
        return vpls, vlp_index

    return jax.lax.cond(due, refresh,
                        lambda _: (state.vpls, state.vlp_index), None)


class Renderer:
    """Convenience driver bundling scene + camera + config.

    The headless successor of the GLUT loop: `step` is one progressive
    pass; camera/scene edits go through `move_camera` / `edit_sphere`
    (the UI key analogues) which reset accumulation like ``ReInitScene``.

    ``tile_rows``: when set, each pass traces the frame in horizontal
    bands of that many rows (bounded memory for big frames x big scenes).
    """

    def __init__(self, scene: Scene, cam_orig: Sequence[float],
                 cam_target: Sequence[float], width: int, height: int,
                 cfg: IntegratorConfig | None = None, seed: int = 0,
                 reference_dims: bool = False, backend: str = "auto",
                 tile_rows: int | None = None,
                 rng_impl: str | None = None):
        if reference_dims:
            width, height = cam_mod.reference_dims(width, height)
        if backend == "auto":
            # The fused megakernel is ~2-3x the XLA tracer on TPU (<=64
            # spheres), and the per-depth bounce kernel is 2.67x on
            # complex.scn's 783 (render_pass routes by sphere count); on
            # CPU the interpreter/Mosaic path has no advantage. Above
            # ~1024 spheres the bounce kernel's fully unrolled scans
            # outgrow the Mosaic scoped-VMEM budget — XLA takes over.
            backend = ("pallas" if jax.default_backend() == "tpu"
                       and scene.num_spheres <= 1024 else "xla")
        self.backend = backend
        self.tile_rows = tile_rows
        self.seed = seed
        self.rng_impl = rng_impl
        self.cfg = cfg or IntegratorConfig()
        self.width, self.height = width, height
        self.scene = scene
        self.camera = Camera.make(cam_orig, cam_target, width, height,
                                  self.cfg.fov_deg)
        self.light_idx = static_light_indices(scene)
        self.state = init_state(width, height, self.cfg, seed, rng_impl)

    def step(self, direct_only: bool = False) -> RenderState:
        # The XLA backend always goes through the banded program (one band
        # when untiled): banding is then a pure memory-layout choice and any
        # tile_rows produces the bitwise-same image — XLA's shape-dependent
        # fma fusion makes a separate "fused full-frame" program round a few
        # pixels 1 ulp differently. The pallas untiled path keeps the fused
        # in-kernel-camera megakernel (`render_pass`) for peak throughput;
        # its tiled variant is a statistically-identical realization (host
        # camera math vs in-kernel).
        if self.tile_rows or self.backend != "pallas":
            return self._step_tiled(direct_only)
        self.state = render_pass(self.scene, self.camera, self.state,
                                 self.cfg, self.width, self.height,
                                 self.light_idx, direct_only, self.backend)
        return self.state

    def step_light(self, n_passes: int = 1) -> RenderState:
        """``n_passes`` light-tracing passes splatted onto the film — the
        living ``RadianceLightTracing`` integrator mode (CLI ``--mode
        light``); ``n_passes > 1`` chains them in one device program
        (`light_splat_chunk`)."""
        if n_passes == 1:
            self.state = light_splat_pass(self.scene, self.camera,
                                          self.state, self.cfg, self.width,
                                          self.height, self.light_idx)
        else:
            self.state = light_splat_chunk(self.scene, self.camera,
                                           self.state, jnp.int32(n_passes),
                                           self.cfg, self.width,
                                           self.height, self.light_idx)
        return self.state

    def _step_tiled(self, direct_only: bool = False) -> RenderState:
        self.state = tiled_pass(self.scene, self.camera, self.state,
                                self.cfg, self.width, self.height,
                                self.light_idx, self.tile_rows,
                                self.backend, direct_only)
        return self.state

    def step_n(self, n_passes: int, direct_only: bool = False) -> RenderState:
        """``n_passes`` progressive passes in ONE device program
        (`render_chunk`) — the serving-mode path that amortizes per-pass
        dispatch latency. Equal to ``n_passes`` `step` calls."""
        self.state = render_chunk(self.scene, self.camera, self.state,
                                  jnp.int32(n_passes), self.cfg,
                                  self.width, self.height, self.light_idx,
                                  self.tile_rows, self.backend, direct_only)
        return self.state

    def render(self, spp: int, direct_only: bool = False,
               chunk: int = 1) -> np.ndarray:
        """Accumulate ``spp`` passes; ``chunk > 1`` runs them in jit-fused
        chunks of that many passes (`step_n`) — same image, fewer
        dispatches."""
        done = 0
        while done < spp:
            k = min(max(chunk, 1), spp - done)
            if k == 1:
                self.step(direct_only)
            else:
                self.step_n(k, direct_only)
            done += k
        return np.asarray(self.state.colors)

    # -- interactive-equivalent edits (display_func.c:278-437) --------------

    def reset(self) -> None:
        """``ReInit``: restart accumulation, keep scene+camera."""
        self.state = init_state(self.width, self.height, self.cfg, self.seed,
                                self.rng_impl)

    def move_camera(self, axis: str, amount: float) -> None:
        self.camera = cam_mod.translate(self.camera, axis, amount,
                                        self.width, self.height)
        self.reset()

    def rotate_camera(self, axis: str, angle: float) -> None:
        self.camera = cam_mod.rotate(self.camera, axis, angle,
                                     self.width, self.height)
        self.reset()

    def edit_sphere(self, index: int, dp) -> None:
        """Move sphere ``index`` by ``dp`` (the numpad-edit analogue,
        ``display_func.c:347-369``) and restart like ``ReInitScene``."""
        p = self.scene.p.at[index].add(jnp.asarray(dp, dtype=jnp.float32))
        self.scene = self.scene.replace(p=p)
        self.light_idx = static_light_indices(self.scene)
        self.reset()


def render_image(scene: Scene, cam_orig, cam_target, width: int, height: int,
                 spp: int, cfg: IntegratorConfig | None = None,
                 seed: int = 0, reference_dims: bool = False) -> np.ndarray:
    """One-call render -> float32 ``[H, W, 3]`` (row 0 = bottom)."""
    r = Renderer(scene, cam_orig, cam_target, width, height, cfg, seed,
                 reference_dims)
    return r.render(spp)
