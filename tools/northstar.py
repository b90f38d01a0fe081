#!/usr/bin/env python
"""North-star parity runs (BASELINE.md).

Two studies, each writing artifacts + one JSON line:

1. ``--leg tpu`` / ``--leg cpu`` / ``--leg compare``:
   cornell.scn 1024x768 @ 1024 spp with the CPU-reference estimator
   (`IntegratorConfig.cpu_golden`). Because the random tape is
   counter-addressed (rng.py), the TPU and CPU runs consume IDENTICAL
   randoms — so the comparison is per-pixel float parity of the same
   deterministic computation on two backends, far stronger than a
   statistical match. The chain to the reference semantics: the scalar
   golden oracle == this tracer at thumbnail scale
   (tests/test_golden_parity.py), and this run extends tracer CPU == TPU
   to the full north-star config.

2. ``--leg emulate``: quantitative closure of the ~9% brightness offset
   vs the reference's own shipped render (assets/images/path.png;
   BASELINE.md "Image parity"). Renders the built-in Cornell scene at the
   reference's default dims twice — documented-intent scheduler vs the
   `stale_vpl_window` emulation of the reference defect
   (smallpt_cpu.c:292 + device.cu:510-514) — and reports each render's
   NCC + best global gain against path.png. Hypothesis confirmed if the
   emulated run's gain moves to ~1.0.

Run the TPU legs on the chip (ambient platform), the cpu leg anywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _jax(platform: str | None):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if platform:
        jax.config.update("jax_platforms", platform)
    return jax


def render_leg(platform: str | None, width: int, height: int, spp: int,
               out_name: str) -> None:
    jax = _jax(platform)
    from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
    from gpu_bidirectional_raytracer_tpu.render import film
    from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

    orig, target, scene = load_scene(
        os.path.join(REPO, "assets", "scenes", "cornell.scn"))
    cfg = IntegratorConfig.cpu_golden()
    # backend xla on BOTH legs: the parity claim is the same program on
    # two backends, not pallas-vs-XLA estimator equivalence (that parity
    # has its own tests).
    r = Renderer(scene, orig, target, width, height, cfg=cfg, backend="xla")
    t0 = time.time()
    for s in range(spp):
        r.step()
        if (s + 1) % 64 == 0:
            jax.block_until_ready(r.state.colors)
            print(f"[{out_name}] pass {s+1}/{spp} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    img = np.asarray(r.state.colors)
    np.save(os.path.join(ART, out_name + ".npy"), img)
    film.write_image(img, os.path.join(ART, out_name + ".png"))
    print(json.dumps({"leg": out_name, "mean": float(img.mean()),
                      "seconds": round(time.time() - t0, 1),
                      "platform": jax.default_backend()}))


def compare() -> None:
    a = np.load(os.path.join(ART, "northstar_tpu.npy")).astype(np.float64)
    b = np.load(os.path.join(ART, "northstar_cpu.npy")).astype(np.float64)
    diff = np.abs(a - b)
    scale = np.maximum(np.abs(b), 1e-3)
    rel = diff / scale
    ncc = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    out = {
        "config": "cornell.scn 1024x768 @ 1024spp, cpu_golden estimator",
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "max_rel_diff_at_radiance_gt_1e-3": float(rel.max()),
        "p999_rel_diff": float(np.quantile(rel, 0.999)),
        "ncc": ncc,
        "allclose_rtol_1e-3_atol_1e-4": bool(
            np.allclose(a, b, rtol=1e-3, atol=1e-4)),
    }
    with open(os.path.join(ART, "NORTHSTAR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def emulate(spp: int) -> None:
    jax = _jax(None)
    from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
    from gpu_bidirectional_raytracer_tpu.render import film
    from gpu_bidirectional_raytracer_tpu.scene import builtin
    from gpu_bidirectional_raytracer_tpu.core import vecmath as vm

    from PIL import Image

    ref = np.asarray(Image.open(
        "/root/reference/assets/images/path.png").convert("RGB"),
        dtype=np.float64)

    results = {}
    for name, stale in (("intent", False), ("stale_bug", True)):
        cfg = IntegratorConfig(stale_vpl_window=stale)
        r = Renderer(builtin.cornell_box(), builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, 640, 480, cfg=cfg,
                     reference_dims=True)
        t0 = time.time()
        st = r.state
        for s in range(spp):
            st = r.step()
            if (s + 1) % 2048 == 0:
                jax.block_until_ready(st.colors)
                print(f"[{name}] pass {s+1}/{spp} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        img = np.asarray(st.colors)
        byte = np.asarray(vm.gamma_to_byte(img), dtype=np.float64)
        byte = byte[::-1]  # film row 0 = bottom; png is top-down
        film.write_image(
            img, os.path.join(ART, f"cornell_emulate_{name}_{spp}spp.png"))
        ncc = float(np.corrcoef(byte.ravel(), ref.ravel())[0, 1])
        gain = float((byte * ref).sum() / np.maximum((byte * byte).sum(),
                                                     1e-9))
        mean_diff = float(np.abs(byte - ref).mean())
        mean_diff_g = float(np.abs(byte * gain - ref).mean())
        results[name] = {
            "ncc": ncc, "best_global_gain": gain,
            "mean_abs_diff_8bit": mean_diff,
            "mean_abs_diff_8bit_after_gain": mean_diff_g,
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)
    out = {"spp": spp, "vs": "reference assets/images/path.png",
           "results": results,
           "hypothesis_confirmed_if": "stale_bug gain closer to 1.0 and "
                                      "smaller mean_abs_diff than intent"}
    with open(os.path.join(ART, "STALE_WINDOW.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", required=True,
                    choices=["tpu", "cpu", "compare", "emulate"])
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    args = ap.parse_args()
    os.makedirs(ART, exist_ok=True)
    if args.leg == "tpu":
        render_leg(None, args.width, args.height, args.spp, "northstar_tpu")
    elif args.leg == "cpu":
        render_leg("cpu", args.width, args.height, args.spp,
                   "northstar_cpu")
    elif args.leg == "compare":
        compare()
    else:
        emulate(args.spp)


if __name__ == "__main__":
    main()
