#!/usr/bin/env python
"""Forward-megakernel speed-of-light study (VERDICT r2 #6).

Where do the ~3.4 ms of a sustained cornell 512x512 pallas pass go?
Decomposition by MEASUREMENT. Every leg times PASSES chained passes
INSIDE one jit (`lax.fori_loop` over the sample counter, fresh salted
key per timing call) — the only tunnel-safe pattern: un-jitted per-pass
dispatch over the TPU HTTP tunnel costs a noisy ~80-200 ms RTT per call
that buries a 3 ms kernel (measured; first revision of this tool did
exactly that), and identical re-dispatches are memoized server-side.

- depth sweep (max_depth 1..7): the per-bounce marginal cost of the
  unrolled megakernel body;
- estimator ablation: bidirectional vs use_vpl=False (drops the VPL
  vacuum scan + gather per bounce) vs direct_only;
- tile_rows sweep: grid granularity vs scoped-VMEM pressure;
- pass plumbing: random-tape generation + accumulate outside the kernel.

Prints one JSON line per leg + a final roofline summary comparing the
achieved arithmetic rate against the v5e VPU peak under an instruction
census of the kernel body (quadratic scans AND the
transcendental/select-heavy shading — the honest denominator; the
quadratic-only "4.34% of peak" of BENCH_r02 undercounts the work by
design). Writes artifacts/MEGAKERNEL.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_megakernel.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpu_bidirectional_raytracer_tpu import rng  # noqa: E402
from gpu_bidirectional_raytracer_tpu.core.types import (  # noqa: E402
    Camera,
    IntegratorConfig,
)
from gpu_bidirectional_raytracer_tpu.integrators.direct import (  # noqa: E402
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.ops.pallas_trace import (  # noqa: E402
    trace_pallas_camera,
)
from gpu_bidirectional_raytracer_tpu.scene import builtin  # noqa: E402

W = H = 512
N_SHORT, N_LONG = 8, 104   # differenced trip counts (see sustained)
REPS = 3


def sustained(fn, key):
    """Per-pass seconds of chained passes inside ONE jit, net of RTT.

    ``fn(key, s) -> [N, 3]`` radiance of pass ``s``. The passes run in a
    DYNAMIC-trip-count `fori_loop` (one compile), and the reported time
    is ``(t(N_LONG) - t(N_SHORT)) / (N_LONG - N_SHORT)`` — the ~80-200 ms
    tunnel round-trip around each dispatch is common to both calls and
    cancels in the difference. Fresh fold_in'd keys per call defeat
    server-side memoization of identical executions; best of REPS pairs
    (tunnel noise is right-skewed).
    """

    @jax.jit
    def loop(key, s0, n):
        def body(i, acc):
            return acc + fn(key, s0 + i).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jax.block_until_ready(loop(key, jnp.int32(0), jnp.int32(2)))  # compile
    best = float("inf")
    for r in range(REPS):
        k = jax.random.fold_in(key, jnp.uint32(r + 1))
        ts = []
        for n in (N_SHORT, N_LONG):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(k, jnp.int32(1), jnp.int32(n)))
            ts.append(time.perf_counter() - t0)
        d = (ts[1] - ts[0]) / (N_LONG - N_SHORT)
        if d > 0.0:  # nonpositive delta = tunnel noise (ADVICE r3)
            best = min(best, d)
    if best == float("inf"):
        raise RuntimeError("all timing reps nonpositive (tunnel noise)")
    return best


def main() -> None:
    scene = builtin.cornell_box()
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, W, H)
    li = static_light_indices(scene)
    key = jax.random.key(int(time.time()))
    from gpu_bidirectional_raytracer_tpu.integrators import light_tracer

    base = IntegratorConfig()
    out = {"resolution": f"{W}x{H}", "device": str(jax.devices()[0]
                                                   .device_kind)}

    def make(cfg, tile_rows=16, with_vpls=True):
        def run(key, s):
            vpls = (light_tracer.trace_light_paths(scene, cfg, li, key, s)
                    if (cfg.use_vpl and with_vpls) else None)
            return trace_pallas_camera(scene, cfg, li, cam, W, H, key, s,
                                       vpls=vpls, vlp_index=jnp.int32(0),
                                       tile_rows=tile_rows)
        return run

    # ---- depth sweep (bidirectional estimator) -------------------------
    depth_ms = {}
    for d in range(1, base.max_depth + 1):
        cfg = dataclasses.replace(base, max_depth=d)
        depth_ms[d] = round(sustained(make(cfg), key) * 1e3, 3)
        print(json.dumps({"leg": f"depth_{d}", "ms": depth_ms[d]}),
              flush=True)
    out["depth_sweep_ms"] = depth_ms
    marg = {f"{d}->{d+1}": round(depth_ms[d + 1] - depth_ms[d], 3)
            for d in range(1, base.max_depth)}
    out["marginal_bounce_ms"] = marg

    # ---- estimator ablation --------------------------------------------
    out["ablation_ms"] = {}
    for name, cfg in (
        ("bidirectional", base),
        ("no_vpl", dataclasses.replace(base, use_vpl=False)),
    ):
        out["ablation_ms"][name] = round(sustained(make(cfg), key) * 1e3, 3)
        print(json.dumps({"leg": name, "ms": out["ablation_ms"][name]}),
              flush=True)

    # ---- tile_rows sweep -----------------------------------------------
    out["tile_rows_ms"] = {}
    for tr in (8, 16, 32, 64):
        try:
            ms = round(sustained(make(base, tile_rows=tr), key) * 1e3, 3)
        except Exception as e:
            ms = f"{type(e).__name__}"
        out["tile_rows_ms"][tr] = ms
        print(json.dumps({"leg": f"tile_rows_{tr}", "ms": ms}), flush=True)

    # ---- pass plumbing outside the kernel ------------------------------
    n = W * H
    L = max(len(li), 1)

    @jax.jit
    def tape_only(key, s):
        tot = rng.site_uniforms(key, s, 0, rng.CAM_JITTER, 2, n)
        rows = [tot]
        for d in range(base.max_depth):
            rows.append(rng.site_uniforms(key, s, d, rng.LIGHT_UV,
                                          2 * L, n))
            rows.append(rng.site_uniforms(key, s, d, rng.DIFF_UV, 2, n))
            rows.append(rng.site_uniforms(key, s, d, rng.REFR_RR, 1, n))
        return sum(r.sum() for r in rows)

    out["tape_gen_ms"] = round(sustained(tape_only, key) * 1e3, 3)

    @jax.jit
    def vpl_only(key, s):
        return light_tracer.trace_light_paths(scene, base, li, key, s).rad

    out["vpl_refresh_ms"] = round(sustained(vpl_only, key) * 1e3, 3)
    print(json.dumps({"leg": "plumbing", "tape_ms": out["tape_gen_ms"],
                      "vpl_ms": out["vpl_refresh_ms"]}), flush=True)

    # ---- roofline summary ----------------------------------------------
    # Instruction census of one bounce per lane (hand count of
    # _bounce_step, L=1, V=1): 3 scans x 9 spheres x ~26 flops = 702
    # quadratic flops; shading/NEE/scatter ~= 250 flops + 8
    # transcendentals (sin, cos, exp-free sigmoidless path: sqrt x5,
    # sin, cos, rsqrt-as-div) -- TPU transcendentals run on the slower
    # XLU pipe, ~8x a vreg op, so count them as 8 flop-equivalents each.
    flops_per_lane_bounce = 702 + 250 + 8 * 8
    total = flops_per_lane_bounce * n * base.max_depth
    t_kernel = (depth_ms[base.max_depth]
                - out["tape_gen_ms"] - out["vpl_refresh_ms"]) * 1e-3
    peak = 8 * 128 * 2 * 0.94e9
    out["model_gflops_per_pass"] = round(total / 1e9, 2)
    out["kernel_ms_est"] = round(t_kernel * 1e3, 3)
    out["achieved_gflops"] = round(total / max(t_kernel, 1e-9) / 1e9, 1)
    out["pct_vpu_peak_census"] = round(
        100 * total / max(t_kernel, 1e-9) / peak, 1)
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "artifacts", "MEGAKERNEL.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
