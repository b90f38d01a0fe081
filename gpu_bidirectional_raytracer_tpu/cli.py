"""Command-line interface: ``render`` and ``optimize``.

The headless replacement for the reference's GLUT event loop + argv handling
(``smallpt_cpu.c:389-441``: ``smallptCPU [width height scene.scn]``). Same
positional semantics, plus progressive snapshots, checkpoint/resume, and the
inverse-rendering driver the reference approximated with keyboard edits.

Usage:
    python -m gpu_bidirectional_raytracer_tpu.cli render [scene.scn]
        [--width 640] [--height 480] [--spp 64] [--out out.ppm]
        [--mode gpu|cpu] [--reference-dims] [--snapshot-every N]
        [--checkpoint DIR] [--resume]
    python -m gpu_bidirectional_raytracer_tpu.cli view [scene.scn]
        [--width 128] [--height 96]         # interactive terminal viewer
    python -m gpu_bidirectional_raytracer_tpu.cli optimize target.ppm
        [scene.scn] [--steps 100] [--lr 0.05] [--params p,rad,c,e]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load(scene_path: str | None, camera_scale: float = 1.0):
    from gpu_bidirectional_raytracer_tpu.scene import builtin
    from gpu_bidirectional_raytracer_tpu.scene.parser import (load_scene,
                                                              scale_world)

    if scene_path:
        orig, target, scene = load_scene(scene_path)
    else:
        orig, target, scene = (builtin.DEFAULT_CAMERA_ORIG,
                               builtin.DEFAULT_CAMERA_TARGET,
                               builtin.cornell_box())
    if camera_scale != 1.0:
        orig, target, scene = scale_world(orig, target, scene, camera_scale)
    return orig, target, scene


def _config(mode: str):
    from gpu_bidirectional_raytracer_tpu.core.types import IntegratorConfig

    # "light" = the light-tracing splat integrator (GPU-intent config).
    return (IntegratorConfig.cpu_golden() if mode == "cpu"
            else IntegratorConfig.gpu())


def _rng_resume_hint(stored_dtype: str | None) -> str:
    """Flag suggestion matching a checkpoint's stored PRNG-key dtype tag.

    Pre-round-4 checkpoints were written under the then-default threefry
    tape, so the common mismatch today is `--rng mix32` (the current
    default) against a `key<fry>` checkpoint."""
    hints = {
        "key<fry>": "resume with --rng threefry (pre-round-4 checkpoints "
                    "used the threefry default)",
        "key<rbg>": "resume with --fast-rng (or --rng rbg)",
        "key<mx32>": "resume without --rng/--fast-rng (mix32 is the "
                     "default)",
    }
    return hints.get(stored_dtype,
                     "resume under the setting it was written with")


def cmd_render(args) -> int:
    from gpu_bidirectional_raytracer_tpu.render import film
    from gpu_bidirectional_raytracer_tpu.render.progressive import Renderer
    from gpu_bidirectional_raytracer_tpu.utils import checkpoint as ckpt

    orig, target, scene = _load(args.scene, args.camera_scale)
    rng_impl = "rbg" if args.fast_rng else args.rng
    r = Renderer(scene, orig, target, args.width, args.height,
                 cfg=_config(args.mode), seed=args.seed,
                 reference_dims=args.reference_dims,
                 backend=args.backend, tile_rows=args.tile_rows,
                 rng_impl=rng_impl)

    if args.checkpoint and args.resume:
        try:
            restored = ckpt.restore(args.checkpoint, r.state)
        except Exception as e:
            # Cross-impl resumes in older orbax surfaced as an opaque
            # key shape/dtype mismatch ((2,) mix32/threefry vs (4,)
            # rbg). Match the KEY DTYPE TAG (`key<...>`) or the shape
            # pair — not bare 'key', which appears in unrelated restore
            # errors and would mislabel them (ADVICE r4).
            msg = str(e)
            if "key<" in msg or ("(2,)" in msg and "(4,)" in msg):
                print(
                    f"error: checkpoint at {args.checkpoint} was written "
                    f"under a different --rng/--fast-rng setting than "
                    f"this run (the PRNG key layout differs); "
                    f"{_rng_resume_hint(None)}\n  ({e})",
                    file=sys.stderr)
                return 2
            raise
        if restored is not None:
            if restored.key.dtype != r.state.key.dtype:
                # Orbax restores the SAVED key impl regardless of the
                # template: the run would silently continue on the
                # checkpoint's RNG, ignoring --rng/--fast-rng (ADVICE
                # r3/r4). Name the stored impl and suggest the flag
                # that matches it.
                print(
                    f"error: checkpoint at {args.checkpoint} was written "
                    f"under a different --rng/--fast-rng setting "
                    f"(stored key {restored.key.dtype}, requested "
                    f"{r.state.key.dtype}); "
                    f"{_rng_resume_hint(str(restored.key.dtype))}",
                    file=sys.stderr)
                return 2
            r.state = restored
            print(f"resumed at sample {int(r.state.sample)}", file=sys.stderr)

    t0 = time.time()
    start = int(r.state.sample)
    # Chunked stepping (render_chunk / light_splat_chunk) amortizes
    # per-pass dispatch latency — the dominant cost of short passes over
    # a remote-TPU link. Chunk boundaries respect snapshot/checkpoint
    # cadence; chunk=1 is the legacy per-pass loop.
    chunk = max(args.chunk, 1)
    s = start
    while s < args.spp:
        k = min(chunk, args.spp - s)
        if args.snapshot_every:
            k = min(k, args.snapshot_every - (s % args.snapshot_every))
        if args.checkpoint:
            cad = max(args.snapshot_every or 16, 1)
            k = min(k, cad - (s % cad))
        if args.mode == "light":
            r.step_light(k)
        elif k == 1:
            r.step()
        else:
            r.step_n(k)
        if s == start:
            import jax

            jax.block_until_ready(r.state.colors)
        s += k
        if args.snapshot_every and s % args.snapshot_every == 0:
            elapsed = time.time() - t0
            name = film.snapshot_name(r.cfg.max_vlp, elapsed, s)
            film.write_ppm(np.asarray(r.state.colors), name)
            print(f"pass {s}: wrote {name}", file=sys.stderr)
        if args.checkpoint and s % max(args.snapshot_every or 16, 1) == 0:
            ckpt.save(args.checkpoint, r.state)
    elapsed = time.time() - t0
    from gpu_bidirectional_raytracer_tpu.utils.profiling import ThroughputMeter

    meter = ThroughputMeter(pixels_per_pass=r.width * r.height,
                            total_time=elapsed, passes=args.spp - start)
    print(meter.report(), file=sys.stderr)

    written = film.write_image(np.asarray(r.state.colors), args.out)
    print(f"wrote {written}", file=sys.stderr)
    if args.checkpoint:
        ckpt.save(args.checkpoint, r.state)
    return 0


def cmd_view(args) -> int:
    from gpu_bidirectional_raytracer_tpu.render.progressive import Renderer
    from gpu_bidirectional_raytracer_tpu.render.viewer import run_viewer

    orig, target, scene = _load(args.scene, args.camera_scale)
    r = Renderer(scene, orig, target, args.width, args.height,
                 cfg=_config(args.mode), seed=args.seed,
                 backend=args.backend)
    run_viewer(r)
    return 0


def cmd_optimize(args) -> int:
    import jax.numpy as jnp

    from gpu_bidirectional_raytracer_tpu.core.types import Camera
    from gpu_bidirectional_raytracer_tpu.diff.gradients import InverseRenderer
    from gpu_bidirectional_raytracer_tpu.render import film
    from gpu_bidirectional_raytracer_tpu.scene.parser import write_scene

    orig, target_cam, scene = _load(args.scene)
    target_img = film.read_ppm(args.target).astype(np.float32) / 255.0
    # Invert the gamma quantization to approximate linear radiance.
    target_lin = jnp.asarray(target_img ** 2.2)
    h, w, _ = target_img.shape
    cam = Camera.make(orig, target_cam, w, h)

    import dataclasses

    cfg = _config(args.mode)
    if args.vis_tau > 0.0:
        # Straight-through visibility gradients: cast-shadow motion
        # carries gradient (types.IntegratorConfig.vis_grad_tau).
        cfg = dataclasses.replace(cfg, vis_grad_tau=args.vis_tau)
    if args.sil_tau > 0.0:
        # Straight-through coverage gradients: primary-hit silhouette
        # motion carries gradient (types.IntegratorConfig.sil_grad_tau).
        cfg = dataclasses.replace(cfg, sil_grad_tau=args.sil_tau)
    inv = InverseRenderer(scene=scene, cam=cam, target=target_lin,
                          cfg=cfg, width=w, height=h,
                          lr=args.lr, spp=args.spp, loss=args.loss,
                          optimize=tuple(args.params.split(",")),
                          backend=args.backend)
    for i in range(args.steps):
        loss = inv.step()
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {loss:.6g}", file=sys.stderr)
    write_scene(orig, target_cam, inv.scene, args.out)
    print(f"wrote optimized scene to {args.out}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gpu_bidirectional_raytracer_tpu")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu/tpu); overrides both "
                         "JAX_PLATFORMS and any sitecustomize pinning")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="progressive render to PPM")
    p.add_argument("scene", nargs="?", default=None)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--out", default="out.ppm")
    p.add_argument("--mode", choices=("gpu", "cpu", "light"),
                   default="gpu")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--reference-dims", action="store_true",
                   help="apply the reference's +1 to both axes")
    p.add_argument("--snapshot-every", type=int, default=0)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--backend", choices=("auto", "xla", "pallas"), default="auto",
                   help="eye-trace implementation (pallas = fused TPU "
                        "megakernel, ~2x faster on TPU)")
    p.add_argument("--rng", choices=("mix32", "threefry", "rbg"),
                   default=None,
                   help="render-tape PRNG (default mix32: replay-stable "
                        "cheap counter hash; threefry: rounds-1..3 "
                        "heritage contract; rbg: hardware bit generator, "
                        "fastest, not replay-stable across backends)")
    p.add_argument("--fast-rng", dest="fast_rng", action="store_true",
                   help="alias for --rng rbg (serving-mode tape: XLA "
                        "hardware RngBitGenerator; not bitwise-"
                        "replayable across backends)")
    p.add_argument("--chunk", type=int, default=16,
                   help="progressive passes fused per device program "
                        "(render_chunk); 1 = one dispatch per pass")
    p.add_argument("--tile-rows", type=int, default=None,
                   help="trace in horizontal bands of N rows (bounds "
                        "memory for huge frames / many-sphere scenes)")
    p.add_argument("--camera-scale", type=float, default=1.0,
                   help="uniformly scale world geometry (camera, sphere "
                        "positions, radii) before rendering. Escape hatch "
                        "for normalized-coordinate scenes like "
                        "hall_of_mirrors.scn, which are black under the "
                        "reference camera's ~10-unit ray-origin "
                        "displacement (device.cu:596-597); try 100")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("view", help="interactive terminal viewer "
                                    "(the GLUT-window replacement)")
    p.add_argument("scene", nargs="?", default=None)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--mode", choices=("gpu", "cpu"), default="gpu")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", choices=("auto", "xla", "pallas"), default="auto")
    p.add_argument("--camera-scale", type=float, default=1.0,
                   help="uniformly scale world geometry (see render)")
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("optimize", help="inverse rendering against a target")
    p.add_argument("target")
    p.add_argument("scene", nargs="?", default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--params", default="p,rad")
    p.add_argument("--mode", choices=("gpu", "cpu"), default="cpu")
    p.add_argument("--vis-tau", dest="vis_tau", type=float, default=0.0,
                   help="straight-through visibility-gradient width in "
                        "scene units (0 = detached-path gradients only; "
                        "~2 for Cornell-scale scenes)")
    p.add_argument("--sil-tau", dest="sil_tau", type=float, default=0.0,
                   help="straight-through primary-silhouette-gradient "
                        "width in scene units (0 = off; visible-sphere "
                        "coverage motion carries gradient when > 0)")
    p.add_argument("--loss", choices=("l2_unbiased", "l2", "log"),
                   default="l2_unbiased")
    p.add_argument("--backend", choices=("auto", "xla", "pallas", "mxu"),
                   default="auto",
                   help="fwd+bwd implementation (pallas = hand-written "
                        "fused adjoint, ~2.9x the XLA remat step on TPU; "
                        "mxu = matmul-formulated sphere scans, the "
                        "differentiable many-sphere fast path that "
                        "pallas also falls back to above 64 spheres)")
    p.add_argument("--out", default="optimized.scn")
    p.set_defaults(fn=cmd_optimize)

    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
