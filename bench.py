#!/usr/bin/env python
"""Benchmark: rays/sec/chip on cornell.scn (BASELINE.md metric).

Times, on the Cornell box at 512x512:
- the forward progressive pass (pallas megakernel, sustained);
- the XLA-tracer forward pass (always reported — the pallas/XLA gap is a
  tracked number, VERDICT r1 weak#4);
- the differentiable fwd+bwd "training step" with the BIDIRECTIONAL
  (VPL) estimator — the framework's headline capability — on both the
  hand-written pallas adjoint (`ops.pallas_grad`) and the XLA remat path.

The headline metric is primary-rays/sec fwd+bwd, measured as chained
steps INSIDE one jit (gradient-accumulation shape, differenced trip
counts so the dispatch round trip cancels) — the device's true
per-step time. Rounds 1-2 timed per-dispatch calls over the remote-TPU
tunnel, which buried single-digit-ms steps under ~90 ms RTT — or, worse,
re-timed memoized identical dispatches as near-zero (both measured;
tools/bench_megakernel.py) — so rounds 1-2 numbers are not comparable.
`extra` adds the bounce-aware numbers the reference's
meter never had (``smallpt_cpu.c:282-287`` counts primary samples only):
traced segments/sec (extension rays + NEE/VPL shadow rays, alive lanes
only) and a sphere-test FLOP model with a %-of-VPU-peak LOWER bound, so
"actually fast" is judged against speed-of-light, not just round 0.

Prints ONE JSON line. The reference publishes no numbers (BASELINE.md),
so ``vs_baseline`` is reported against 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the TPU tunnel's remote compiles are
# minutes-long; cached executables make repeat bench runs seconds-long.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e VPU model: one (8,128) f32 vreg op/cycle @ 940 MHz, FMA = 2 flops.
# The utilization figure counts ONLY ray-sphere quadratic flops (~26/test)
# — shading/NEE arithmetic is real work too, so the reported percentage
# is a lower bound on actual VPU occupancy.
_VPU_PEAK_FLOPS = 8 * 128 * 2 * 0.94e9
_FLOPS_PER_SPHERE_TEST = 26.0


# NOTE there is deliberately no per-dispatch _timeit helper: repeated
# dispatches of IDENTICAL (args, executable) are memoized by the remote-
# TPU tunnel (a 52 ms step re-timed as 2.4 ms once the server had seen
# it), and varying-arg single dispatches pay a noisy 80-200 ms RTT that
# buries single-digit-ms kernels (rounds 1-2 numbers were RTT-bound).
# Every leg below times chained device-side work inside one jit and
# differences two trip counts so the RTT cancels.


def _median(xs):
    xs = sorted(xs)
    m = len(xs) // 2
    return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])


def _sustained(chunk_fn, state, n_short=8, n_long=200, reps=3):
    """Serving-mode throughput: passes chained INSIDE one jitted program
    (`render.progressive.render_chunk` — the `Renderer.step_n` path).
    Reported per-pass time is ``(t(n_long) - t(n_short)) / (n_long -
    n_short)``: the host->device dispatch round trip (~90 ms over the
    remote-TPU tunnel, which used to be ~half of the old chained-step
    "sustained" number) is common to both calls and cancels.

    Round 5 methodology fix (tools/bench_adjoint.py found it first): the
    long leg's DEVICE time must clearly exceed the ~35-50 ms dispatch
    variance of the tunnel, and min-of-reps biases low when the short
    leg lands on a slow dispatch — trip counts are sized so the delta is
    ~100 ms at the leg's scale and the MEDIAN of positive per-rep deltas
    is reported."""
    st = jax.block_until_ready(chunk_fn(state, jnp.int32(2)))  # compile
    deltas = []
    for _ in range(reps * 3):
        if len(deltas) >= reps:
            break
        ts = []
        for n in (n_short, n_long):
            # Chain the evolving state through the timing calls: identical
            # (args, executable) re-dispatches are memoized server-side
            # over the TPU tunnel and would time as ~0.
            t0 = time.perf_counter()
            st = jax.block_until_ready(chunk_fn(st, jnp.int32(n)))
            ts.append(time.perf_counter() - t0)
        # Tunnel noise can make the delta <= 0; a nonpositive rep is a
        # measurement failure, not a time — discard it (ADVICE r3).
        d = (ts[1] - ts[0]) / (n_long - n_short)
        if d > 0.0:
            deltas.append(d)
    if not deltas:
        raise RuntimeError(
            f"sustained timing: all reps nonpositive (tunnel noise "
            f"swamped n_long={n_long}; raise the trip counts)")
    return _median(deltas)


_T0 = time.perf_counter()


def main() -> None:
    width = int(os.environ.get("BENCH_WIDTH", "512"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))

    from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
    from gpu_bidirectional_raytracer_tpu.diff import gradients as G
    from gpu_bidirectional_raytracer_tpu.integrators import path_tracer
    from gpu_bidirectional_raytracer_tpu.integrators.direct import (
        static_light_indices,
    )
    from gpu_bidirectional_raytracer_tpu.render.progressive import (
        frame_rays,
        init_state,
        render_chunk,
        render_pass,
    )
    from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

    scn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "assets", "scenes", "cornell.scn")
    orig, target, scene = load_scene(scn)
    cfg = IntegratorConfig()  # GPU intent: bidirectional, use_vpl=True
    from gpu_bidirectional_raytracer_tpu import rng as rng_mod

    cam = Camera.make(orig, target, width, height)
    light_idx = static_light_indices(scene)
    key = rng_mod.make_key(0)  # the default (mix32) tape on EVERY leg
    n_rays = width * height
    L = max(len(light_idx), 1)
    n_vpl_window = cfg.vpl_depth * cfg.max_vlp

    # ---- forward progressive pass --------------------------------------
    state = init_state(width, height, cfg)

    def fwd_pallas(state):
        return render_pass(scene, cam, state, cfg, width, height, light_idx,
                           False, "pallas")

    def chunk_pallas(state, n):
        return render_chunk(scene, cam, state, n, cfg, width, height,
                            light_idx, None, "pallas")

    def chunk_xla(state, n):
        return render_chunk(scene, cam, state, n, cfg, width, height,
                            light_idx, None, "xla")

    # Failures are RECORDED, never silently swallowed (VERDICT r2 weak#9):
    # a pallas regression must show up in the driver-captured JSON, not
    # quietly publish XLA numbers under the headline key.
    errors: dict[str, str] = {}

    def _err(leg: str, e: Exception) -> None:
        errors[leg] = f"{type(e).__name__}: {e}"[:300]

    # Leg order is budget-aware (VERDICT r3 #2: the round-3 complex leg
    # never ran because every secondary leg compiled first): headline
    # forward -> headline fwd+bwd -> complex.scn -> then the tracked
    # secondary legs, each budget-gated.
    try:
        jax.block_until_ready(fwd_pallas(state))  # smoke: pallas routes
        t_sustained = _sustained(chunk_pallas, state)
        t_fwd_pl = t_sustained
    except Exception as e:
        _err("fwd_pallas", e)
        t_fwd_pl = None
        t_sustained = _sustained(chunk_xla, state)

    # ---- fwd+bwd training step: bidirectional (VPL) estimator ----------
    tgt = jnp.zeros((height, width, 3), jnp.float32)

    # Training step: fwd+bwd evals chained inside ONE jit (gradient-
    # accumulation shape) — the per-step device time, same differencing
    # as _sustained; fresh fold_in'd keys per rep defeat server-side
    # memoization of identical dispatches.
    def _fb_sustained(bscene, bcam, btgt, bw, bh, bli, backend,
                      n_short=2, n_long=66, reps=3):
        # Trip counts (2, 66) + median-of-positive-deltas: the census
        # tool (tools/bench_adjoint.py) measured that (4, 36) with
        # min-of-reps under-reads the step ~2x at this scale — the
        # long leg's device time must clearly exceed the ~35-50 ms
        # tunnel dispatch variance.
        # The rep keys are salted with HOST entropy: with fixed keys a
        # REPEAT bench run re-dispatches identical (args, executable)
        # pairs, which the tunnel memoizes server-side — a second run
        # of the same build read the 1.5 ms step as 0.86 (measured).
        salt = jnp.uint32(time.time_ns() & 0xFFFFFFFF)

        @jax.jit
        def loop(key, n):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                loss, g = G.render_loss_grad(bscene, bcam, k, btgt, cfg,
                                             bw, bh, bli, 1,
                                             backend=backend)
                return acc + loss + jnp.sum(g.p)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jax.block_until_ready(loop(key, jnp.int32(2)))
        deltas = []
        for r in range(reps * 3):
            if len(deltas) >= reps:
                break
            k = jax.random.fold_in(jax.random.fold_in(key, salt),
                                   jnp.uint32(0xB0 + r))
            ts = []
            for n in (n_short, n_long):
                t0 = time.perf_counter()
                jax.block_until_ready(loop(k, jnp.int32(n)))
                ts.append(time.perf_counter() - t0)
            d = (ts[1] - ts[0]) / (n_long - n_short)
            if d > 0.0:  # nonpositive = tunnel noise, discard (ADVICE r3)
                deltas.append(d)
        if not deltas:
            raise RuntimeError(
                f"fwd+bwd timing: all reps nonpositive (tunnel "
                f"noise swamped n_long={n_long})")
        return _median(deltas)

    try:
        t_fb = _fb_sustained(scene, cam, tgt, width, height, light_idx,
                             "pallas")
        bwd_backend = "pallas"
    except Exception as e:
        _err("fwd_bwd_pallas", e)
        t_fb = _fb_sustained(scene, cam, tgt, width, height, light_idx,
                             "xla")
        bwd_backend = "xla"
    t_fb_sus = t_fb

    # ---- many-sphere leg: complex.scn (783 spheres) ---------------------
    # Driver-captured so the many-sphere numbers aren't tool-claimed only.
    # Runs IMMEDIATELY after the two headline legs (VERDICT r3 #2 — in
    # round 3 every secondary leg compiled first and the 580s budget ran
    # out at 1272s elapsed). Skipped only when the budget really is spent
    # or BENCH_SKIP_COMPLEX=1.
    # Default budget 1200s: the driver invokes bench WITHOUT a timeout
    # (round-3 PROGRESS.jsonl cmd; its JSON was captured at 1272s
    # elapsed), so the budget is self-imposed pacing for cold-compile
    # worst cases, not a hard wall. A warmed .jax_cache makes the whole
    # run minutes shorter than this.
    complex_extra: dict = {}
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))

    def _left():
        return budget_s - (time.perf_counter() - _T0)

    if (os.environ.get("BENCH_SKIP_COMPLEX") != "1" and _left() > 120.0):
        try:
            corig, ctarget, cscene = load_scene(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "assets", "scenes", "complex.scn"))
            cw, ch = 512, 384
            ccam = Camera.make(corig, ctarget, cw, ch)
            cli = static_light_indices(cscene)
            cstate = init_state(cw, ch, cfg)

            def cchunk(st, n):
                # 'pallas' routes >64-sphere scenes to the per-depth
                # bounce kernel (ops.pallas_bounce) inside render_pass;
                # 'auto' is a Renderer-level alias, not a backend.
                return render_chunk(cscene, ccam, st, n, cfg, cw, ch,
                                    cli, None, "pallas")

            complex_extra["complex_ms_fwd"] = round(
                _sustained(cchunk, cstate, n_short=2, n_long=12,
                           reps=2) * 1e3, 3)

            ctgt = jnp.zeros((ch, cw, 3), jnp.float32)
            try:
                complex_extra["complex_ms_fwd_bwd"] = round(
                    _fb_sustained(cscene, ccam, ctgt, cw, ch, cli,
                                  "pallas", n_short=2, n_long=8,
                                  reps=2) * 1e3, 3)
                complex_extra["complex_bwd_backend"] = "pallas_hybrid"
            except Exception as e:
                _err("complex_fwd_bwd_pallas", e)
        except Exception as e:
            _err("complex_leg", e)
    else:
        complex_extra["complex_skipped"] = (
            "env" if os.environ.get("BENCH_SKIP_COMPLEX") == "1"
            else f"budget ({time.perf_counter() - _T0:.0f}s elapsed)")

    # ---- secondary tracked legs (each budget-gated) ---------------------
    # XLA-tracer forward (the pallas/XLA gap is a tracked number).
    t_sustained_xla = None
    if _left() > 90.0:
        try:
            t_sustained_xla = _sustained(chunk_xla, state, n_long=40)
        except Exception as e:
            _err("sustained_xla", e)
    t_fwd = t_sustained_xla or t_sustained

    # RNG-impl ablation: threefry (rounds-1..3 contract tape) and rbg
    # (hardware bit generator) against the mix32 default — the tape-cost
    # ledger behind VERDICT r3 #1 (see render.progressive.init_state).
    rng_extra: dict = {}
    for impl, label in (("threefry", "threefry"), ("rbg", "fast_rng")):
        if _left() < 90.0:
            break
        try:
            st_i = init_state(width, height, cfg, seed=0, rng_impl=impl)
            t_i = _sustained(chunk_pallas if t_fwd_pl else chunk_xla, st_i)
            rng_extra[f"pass_ms_sustained_{label}"] = round(t_i * 1e3, 3)
            rng_extra[f"rays_per_sec_sustained_{label}"] = round(
                n_rays / t_i, 1)
        except Exception as e:
            _err(f"sustained_{label}", e)

    # XLA remat fwd+bwd (the hand-written-adjoint speedup denominator).
    t_fb_xla = None
    if _left() > 120.0 and os.environ.get("BENCH_SKIP_XLA_BWD") != "1":
        try:
            t_fb_xla = _fb_sustained(scene, cam, tgt, width, height,
                                     light_idx, "xla", n_long=16)
        except Exception as e:
            _err("fwd_bwd_xla", e)

    # ---- bounce-aware work census (one instrumented XLA trace) ---------
    segments = n_ext = shadow_rays = sphere_tests = None
    flops_model = None
    if _left() > 60.0:
        try:
            rays = frame_rays(cam, cfg, width, height, key, jnp.int32(0))
            _, stats = jax.jit(
                lambda: path_tracer.trace(scene, cfg, light_idx, rays, key,
                                          jnp.int32(0), with_stats=True))()
            n_ext = int(stats["extension_segments"])
            n_dv = int(stats["diffuse_vertices"])
            shadow_rays = n_dv * (L + (n_vpl_window if cfg.use_vpl else 0))
            segments = n_ext + shadow_rays
            sphere_tests = segments * scene.num_spheres
            flops_model = sphere_tests * _FLOPS_PER_SPHERE_TEST
        except Exception as e:
            _err("census", e)

    dev = jax.devices()[0]
    t_best_fwd = t_fwd_pl if t_fwd_pl else t_fwd
    t_headline = t_fb_sus if t_fb_sus else t_fb
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_fwd_bwd_cornell",
        "value": round(n_rays / t_headline, 1),
        "unit": "rays/s",
        "vs_baseline": 1.0,
        "extra": {
            "bwd_backend": bwd_backend,
            # l2/pallas/spp1 routes to the single-kernel fused step
            # (ops.pallas_grad.trace_pallas_loss_grad, round 5): no
            # separate forward kernel, occ facts reused by the adjoint.
            "fwd_bwd_fused": bwd_backend == "pallas",
            "estimator": "bidirectional_vpl",
            "rays_per_sec_fwd": round(n_rays / t_fwd, 1),
            "rays_per_sec_fwd_pallas": (
                round(n_rays / t_fwd_pl, 1) if t_fwd_pl else None),
            "pass_ms_fwd": round(t_fwd * 1e3, 3),
            "pass_ms_fwd_pallas": (
                round(t_fwd_pl * 1e3, 3) if t_fwd_pl else None),
            "rays_per_sec_sustained": round(n_rays / t_sustained, 1),
            "pass_ms_sustained": round(t_sustained * 1e3, 3),
            "pass_ms_sustained_xla": (
                round(t_sustained_xla * 1e3, 3) if t_sustained_xla
                else None),
            "rng_impl_default": "mix32",
            **rng_extra,
            "pass_ms_fwd_bwd_sustained": (
                round(t_fb_sus * 1e3, 3) if t_fb_sus else None),
            "rays_per_sec_fwd_bwd_sustained": (
                round(n_rays / t_fb_sus, 1) if t_fb_sus else None),
            "pass_ms_fwd_bwd_xla": (
                round(t_fb_xla * 1e3, 3) if t_fb_xla else None),
            "segments_per_pass": segments,
            "extension_segments": n_ext,
            "shadow_rays": shadow_rays,
            "segments_per_sec_fwd": (
                round(segments / t_best_fwd, 1) if segments else None),
            "segments_per_sec_fwd_bwd": (
                round(segments / t_fb, 1) if segments else None),
            "sphere_tests_per_pass": sphere_tests,
            "model_gflops_per_pass": (
                round(flops_model / 1e9, 3) if flops_model else None),
            "vpu_util_lower_bound_pct_fwd": (
                round(100.0 * flops_model / t_best_fwd / _VPU_PEAK_FLOPS, 2)
                if flops_model else None),
            "resolution": f"{width}x{height}",
            "device": str(dev.device_kind),
            "platform": dev.platform,
            **complex_extra,
            **({"errors": errors} if errors else {}),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
