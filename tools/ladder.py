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
  inverse           10-sphere recovery (position+radius+albedo) — the
                    ladder's final rung (BASELINE.md:25), gated on final
                    loss and per-parameter recovery error
                    (`run_inverse_rung`; VERDICT r3 #5)

Artifacts: artifacts/ladder_<rung>.png + artifacts/LADDER.json (+ the
inverse rung's before/after PNGs).
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


# ---- the inverse-rendering rung (BASELINE.md:25's final rung) -------------

# Perturbations applied to the true scene; recovery must walk them back.
_INV_POS_OFF = (4.0, 0.0, 3.0)   # ball A position offset (scene units)
_INV_RAD_OFF = 2.5               # ball B radius offset
_INV_ALB_OFF = (-0.3, 0.2, 0.1)  # ball C albedo offset


def _inverse_scene():
    """Seeded 10-sphere diffuse scene: floor + back wall + light + seven
    varied balls — the '10-sphere inverse rendering' config. Diffuse-only
    so every perturbed parameter is carried by the validated gradient
    paths (interior shading + sil/vis carriers)."""
    import jax.numpy as jnp

    from gpu_bidirectional_raytracer_tpu.core.types import Scene

    rng_ = np.random.default_rng(11)
    balls_p = np.array([[-22.0, 8.0, -8.0], [0.0, 10.0, -20.0],
                        [20.0, 7.0, -4.0], [-8.0, 6.0, 12.0],
                        [10.0, 5.0, 14.0], [26.0, 12.0, -24.0],
                        [-28.0, 14.0, -26.0]])
    balls_r = np.array([8.0, 10.0, 7.0, 6.0, 5.0, 9.0, 9.0])
    balls_c = 0.25 + 0.65 * rng_.random((7, 3))
    p = np.concatenate([
        np.array([[0.0, -1e4, 0.0],       # floor plane (top at y=0)
                  [0.0, 0.0, -1e4 - 44.0],  # back wall (front at z=-44)
                  [0.0, 70.0, 30.0]]),    # light
        balls_p])
    rad = np.concatenate([[1e4, 1e4, 12.0], balls_r])
    e = np.zeros((10, 3))
    e[2] = (22.0, 22.0, 22.0)
    c = np.concatenate([
        np.array([[0.75, 0.75, 0.75], [0.6, 0.65, 0.75], [0.0, 0.0, 0.0]]),
        balls_c])
    return Scene(rad=jnp.asarray(rad, jnp.float32),
                 p=jnp.asarray(p, jnp.float32),
                 e=jnp.asarray(e, jnp.float32),
                 c=jnp.asarray(c, jnp.float32),
                 refl=jnp.zeros((10,), jnp.int32))


def evaluate_inverse_rung(res: dict) -> tuple[dict, bool]:
    """Gate: the fit must recover a large fraction of each perturbation
    and shrink the loss. PARAMETER error is the primary gate — bounds
    sized at ~2x the measured recovery under the FLAGSHIP pallas-adjoint
    + tau-annealing configuration (round 5, v5e: pos 4.0 -> 0.66, gate
    <=1.2; rad 2.5 -> 0.135, gate <=0.6; albedo 0.3 -> 0.036, gate
    <=0.10; loss 2.19 -> 0.68). The loss check (<=0.6x start) now also
    holds with real margin because annealing shrinks the carrier's
    sigmoid-band bias floor (round 4 fixed-tau measured 0.51x). A
    regression in any gradient path (detached shading, sil/vis
    carriers, the pallas adjoint, optimizer plumbing) blows through
    the parameter bounds. tests/test_ladder_gate.py asserts the
    failure modes."""
    checks = {
        "loss_reduced": res["loss_final"] <= 0.6 * res["loss_start"],
        "pos_err<=1.2": res["pos_err_final"] <= 1.2,
        "rad_err<=0.6": res["rad_err_final"] <= 0.6,
        "albedo_err<=0.10": res["albedo_err_final"] <= 0.10,
        "finite": bool(np.isfinite(res["loss_final"])),
    }
    return {**res, "checks": checks}, all(checks.values())


def run_inverse_rung(scale: int) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gpu_bidirectional_raytracer_tpu.core.types import (
        Camera,
        IntegratorConfig,
    )
    from gpu_bidirectional_raytracer_tpu.diff import gradients as G
    from gpu_bidirectional_raytracer_tpu.integrators.direct import (
        static_light_indices,
    )
    from gpu_bidirectional_raytracer_tpu.render import film

    w, h = 96, 72
    steps = max(240 // scale, 40)
    truth = _inverse_scene()
    cam = Camera.make(jnp.array([0.0, 26.0, 70.0]),
                      jnp.array([0.0, 8.0, -6.0]), w, h)
    li = static_light_indices(truth)
    key = jax.random.key(0)
    cfg0 = IntegratorConfig.cpu_golden()
    target = G.render_radiance(truth, cam, key, cfg0, w, h, li, spp=4)
    film.write_image(np.asarray(target),
                     os.path.join(ART, "ladder_inverse_target.png"))

    # Perturb three balls: A's position, B's radius, C's albedo.
    A, B, C = 3, 4, 5
    wrong = truth.replace(
        p=truth.p.at[A].add(jnp.asarray(_INV_POS_OFF, jnp.float32)),
        rad=truth.rad.at[B].add(_INV_RAD_OFF),
        c=truth.c.at[C].add(jnp.asarray(_INV_ALB_OFF, jnp.float32)))
    film.write_image(
        np.asarray(G.render_radiance(wrong, cam, key, cfg0, w, h, li, 4)),
        os.path.join(ART, "ladder_inverse_start.png"))

    # Coverage + shadow carriers on: the perturbations are silhouette-
    # and shadow-dominated at this scale. The room (walls + light,
    # spheres 0-2) is KNOWN — its gradients are masked so it cannot
    # absorb transient error while the balls are wrong (unmasked, the
    # 1e4-radius planes drifted ~5 units and left a loss floor).
    cfg = dataclasses.replace(cfg0, sil_grad_tau=2.0, vis_grad_tau=2.0)
    ball_mask = np.concatenate([np.zeros(3), np.ones(7)]).astype(np.float32)
    # UNIFIED FLAGSHIP (VERDICT r4 #1): backend 'auto' = the hand-written
    # pallas adjoint on TPU — the same configuration as the bench
    # headline — with the tau-ANNEALING schedule as the de-chaos
    # mechanism. Round 4 pinned this rung to XLA because fixed-tau
    # descent is chaotic near the carrier's biased equilibrium: the
    # pallas adjoint's 1-3% pointwise gradient differences (recorded in
    # the artifact as grad_dist_*) steered 240-step trajectories into a
    # different basin (rad_err 1.11 vs 0.16). VERDICT's first suggestion
    # — per-step tape RESAMPLING — was tried and FAILS outright at this
    # budget (l2_unbiased spp 4: pos stays at 3.1 of 4.0; gradient noise
    # swamps the carriers). Annealing tau 2.0 -> 0.1 over 5/8 of the
    # descent instead SHRINKS the band equilibrium both backends are
    # sensitive to: measured on v5e, pallas+anneal recovers pos 0.66 /
    # rad 0.135 / alb 0.036 (fixed-tau pallas: 1.35/1.11/0.017) and the
    # XLA leg stays in-gate, so one configuration now both holds the
    # throughput headline and provably recovers scenes.
    inv = G.InverseRenderer(scene=wrong, cam=cam, target=target, cfg=cfg,
                            width=w, height=h, lr=0.12, spp=4,
                            optimize=("p", "rad", "c"), resample=False,
                            loss="l2", backend="auto",
                            tau_anneal=0.05,
                            anneal_steps=max(steps * 5 // 8, 1),
                            anneal_stages=8,
                            grad_mask={k: ball_mask
                                       for k in ("p", "rad", "c")})

    def errs(sc):
        return (float(jnp.abs(sc.p[A] - truth.p[A]).max()),
                float(jnp.abs(sc.rad[B] - truth.rad[B])),
                float(jnp.abs(sc.c[C] - truth.c[C]).max()))

    # Per-parameter pallas<->XLA gradient distance at the start point
    # (VERDICT r4 #1: recorded in the artifact). ~2-6% relative — the
    # small pointwise differences whose 240-step compounding the
    # annealing schedule defuses.
    grad_dist = {}
    if inv.backend == "pallas":
        _, gx = G.render_loss_grad(wrong, cam, key, target, cfg, w, h,
                                   li, 4, "l2", "xla")
        _, gp = G.render_loss_grad(wrong, cam, key, target, cfg, w, h,
                                   li, 4, "l2", "pallas")
        for f in ("p", "rad", "c"):
            a = np.asarray(getattr(gx, f))
            b = np.asarray(getattr(gp, f))
            grad_dist[f"grad_dist_{f}"] = round(
                float(np.abs(b - a).max() / max(np.abs(a).max(), 1e-12)),
                4)

    t0 = time.time()
    loss0 = inv.step()
    for _ in range(steps - 1):
        loss = inv.step()
    p_err, r_err, a_err = errs(inv.scene)
    film.write_image(
        np.asarray(G.render_radiance(inv.scene, cam, key, cfg0, w, h,
                                     li, 4)),
        os.path.join(ART, "ladder_inverse_recovered.png"))
    res = {
        "scene": "10-sphere seeded diffuse (ladder._inverse_scene)",
        "dims": f"{w}x{h}", "steps": steps, "spp": 4,
        "seconds": round(time.time() - t0, 1),
        "loss_start": float(loss0), "loss_final": float(loss),
        "pos_err_start": float(np.abs(_INV_POS_OFF).max()
                               if hasattr(np.abs(_INV_POS_OFF), "max")
                               else max(abs(x) for x in _INV_POS_OFF)),
        "pos_err_final": p_err,
        "rad_err_start": abs(_INV_RAD_OFF), "rad_err_final": r_err,
        "albedo_err_start": max(abs(x) for x in _INV_ALB_OFF),
        "albedo_err_final": a_err,
        "backend": inv.backend,
        "tau_anneal": "0.05 over 5/8 of descent, 8 stages",
        **grad_dist,
    }
    res, passed = evaluate_inverse_rung(res)
    res["passed"] = passed
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", choices=list(RUNGS) + ["inverse"],
                    default=None)
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()
    os.makedirs(ART, exist_ok=True)
    names = [args.rung] if args.rung else list(RUNGS) + ["inverse"]
    out, ok = {}, True
    path = os.path.join(ART, "LADDER.json")
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for name in names:
        res = (run_inverse_rung(args.scale) if name == "inverse"
               else run_rung(name, args.scale))
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
