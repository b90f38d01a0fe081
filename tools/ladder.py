#!/usr/bin/env python
"""BASELINE config-ladder quality gates (BASELINE.md "configs").

Each rung renders its full config on the AMBIENT platform (TPU in
production, auto backend — the pallas megakernel path) as the committed
artifact, and gates on a SAME-TAPE cross-backend parity check: the
first ``ref_spp`` passes are re-rendered on both the ambient backend
and a CPU-device XLA leg with the identical counter-addressed tape
(rng.py), so the two legs compute the same deterministic estimate and
must agree to float-parity tightness (NCC ~1, sub-percent cell means)
— knife-edge decision flips only (the north-star mechanism,
tools/northstar.py). A statistical low-spp-reference comparison was
measured unsound here: the bidirectional estimator shares one VPL
window per pass across every pixel, so few-pass image means swing
2-3x (heavy-tailed 1/r^2 gather) and no honest tolerance would catch
real regressions. A regression in any kernel, backend routing,
scheduler, or scene handling fails the gate LOUDLY (nonzero exit) —
this replaces round 2's "finite at low spp" smoke coverage of the
upper rungs (VERDICT r2 weak/next #8).

Rungs (BASELINE.json "configs"):
  simple.scn        256x256 @ 16 spp
  cornell.scn       512x512 @ 256 spp
  cornell_mirror    512x512 @ 1024 spp
  cornell_glass     512x512 @ 1024 spp
  caustic.scn       512x384 @ 4096 spp
(The 10-sphere inverse-rendering rung is exercised by
tests/test_gradients.py recovery tests and examples/inverse_rendering.py.)

Artifacts: artifacts/ladder_<rung>.png + artifacts/LADDER.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/ladder.py \
          [--rung NAME] [--scale N]
``--scale N`` divides every spp by N (CI-speed smoke of the same gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
if REPO not in sys.path:
    sys.path.insert(0, REPO)

RUNGS = {
    "simple": ("simple.scn", 256, 256, 16),
    "cornell": ("cornell.scn", 512, 512, 256),
    "mirror": ("cornell_mirror.scn", 512, 512, 1024),
    "glass": ("cornell_glass.scn", 512, 512, 1024),
    "caustic": ("caustic.scn", 512, 384, 4096),
}
# Parity-leg spp divisor: the same-tape cross-backend check needs only
# enough passes to exercise the full pipeline (VPL refresh cadence,
# window slide, every material); the comparison is deterministic, not
# statistical, so a prefix of the rung's tape suffices.
REF_DIV = 8
REF_MIN, REF_MAX = 8, 64
CELL = 16


def _cells(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    return img[: h // CELL * CELL, : w // CELL * CELL].reshape(
        h // CELL, CELL, w // CELL, CELL, 3).mean(axis=(1, 3))


def evaluate_rung(full: np.ndarray, head: np.ndarray,
                  ref: np.ndarray) -> tuple[dict, bool]:
    """The rung acceptance: same-tape cross-backend parity of the head
    legs (deterministic — sub-percent bounds; knife-edge decision flips
    only) + finiteness of the full-config artifact render. Pure, so
    tests/test_ladder_gate.py can assert it fails on real regressions
    (brightness skew, NaN, structural damage)."""
    ca, cb = _cells(head), _cells(ref)
    ncc = float(np.corrcoef(ca.ravel(), cb.ravel())[0, 1])
    scale_ref = max(float(cb.mean()), 1e-6)
    cell_rel = np.abs(ca - cb).mean(axis=-1) / scale_ref
    res = {
        "mean": float(full.mean()),
        "head_mean": float(head.mean()), "ref_mean": float(ref.mean()),
        "ncc_cells": ncc,
        "mean_rel_cell_err": float(cell_rel.mean()),
        "p95_rel_cell_err": float(np.quantile(cell_rel, 0.95)),
        "finite": bool(np.isfinite(full).all()),
    }
    checks = {
        "finite": res["finite"],
        "ncc>=0.999": ncc >= 0.999,
        "mean_rel<=1%": res["mean_rel_cell_err"] <= 0.01,
        "p95_rel<=3%": res["p95_rel_cell_err"] <= 0.03,
        "global_mean<=1%": abs(res["head_mean"] - res["ref_mean"])
        <= 0.01 * max(res["ref_mean"], 1e-6),
    }
    res["checks"] = checks
    return res, all(checks.values())


def run_rung(name: str, scale: int) -> dict:
    import jax

    from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
    from gpu_bidirectional_raytracer_tpu.render import film
    from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

    scn, w, h, spp = RUNGS[name]
    spp = max(spp // scale, 4)
    ref_spp = min(max(spp // REF_DIV, REF_MIN), REF_MAX, spp)
    orig, target, scene = load_scene(
        os.path.join(REPO, "assets", "scenes", scn))
    cfg = IntegratorConfig()        # production bidirectional estimator

    import contextlib

    legs = {}
    cpu0 = jax.devices("cpu")[0]
    for leg, backend, n, ctx in (
        # Full-config artifact render (ambient platform, auto backend).
        ("tpu", "auto", spp, contextlib.nullcontext()),
        # Same-tape parity prefix on the ambient backend ...
        ("tpu_head", "auto", ref_spp, contextlib.nullcontext()),
        # ... vs an independent chain: CPU devices + the XLA tracer (the
        # ambient platform is pinned to the TPU tunnel, so place
        # explicitly). Same seed => identical counter-addressed tape.
        ("cpu_ref", "xla", ref_spp, jax.default_device(cpu0)),
    ):
        with ctx:
            r = Renderer(scene, orig, target, w, h, cfg=cfg,
                         backend=backend)
            t0 = time.time()
            img = r.render(n, chunk=32)  # render_chunk: passes fused in-jit
            jax.block_until_ready(r.state.colors)
            legs[leg] = dict(img=img,
                             spp=n, seconds=round(time.time() - t0, 1))
    full = legs["tpu"]["img"]
    a, b = legs["tpu_head"]["img"], legs["cpu_ref"]["img"]
    film.write_image(full, os.path.join(ART, f"ladder_{name}.png"))

    res, passed = evaluate_rung(full, a, b)
    res = {
        "scene": scn, "dims": f"{w}x{h}",
        "spp": legs["tpu"]["spp"], "ref_spp": legs["cpu_ref"]["spp"],
        "seconds": legs["tpu"]["seconds"],
        "head_seconds": legs["tpu_head"]["seconds"],
        "ref_seconds": legs["cpu_ref"]["seconds"],
        **res,
    }
    res["passed"] = passed
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", choices=list(RUNGS), default=None)
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()
    os.makedirs(ART, exist_ok=True)
    names = [args.rung] if args.rung else list(RUNGS)
    out, ok = {}, True
    path = os.path.join(ART, "LADDER.json")
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for name in names:
        res = run_rung(name, args.scale)
        out[name] = res
        ok = ok and res["passed"]
        print(json.dumps({name: res}), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    if not ok:
        print("LADDER GATE FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
