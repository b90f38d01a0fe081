#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md north star: >=85% rays/s from
1 chip to 2 hosts).

Measures sustained render throughput on growing device subsets of the
current platform and reports efficiency vs linear scaling. On a pod slice
this produces the real 1-chip -> N-chip numbers; on CPU
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
it validates the harness itself (CPU timings are not meaningful).

Usage: python tools/bench_scaling.py [width height spp]
"""

import json
import sys
import time

import jax

from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
from gpu_bidirectional_raytracer_tpu.parallel import mesh as pmesh
from gpu_bidirectional_raytracer_tpu.scene import builtin


def sustained_rays_per_sec(devices, width, height, passes):
    mesh = pmesh.make_mesh(devices)
    height = pmesh.pad_height_to(mesh, height)
    r = Renderer(builtin.cornell_box(), builtin.DEFAULT_CAMERA_ORIG,
                 builtin.DEFAULT_CAMERA_TARGET, width, height,
                 cfg=IntegratorConfig())
    r.state = pmesh.shard_state(r.state, mesh)
    r.step()
    jax.block_until_ready(r.state.colors)  # compile
    t0 = time.perf_counter()
    for _ in range(passes):
        r.step()
    jax.block_until_ready(r.state.colors)
    dt = (time.perf_counter() - t0) / passes
    return width * height / dt


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    results = {}
    base = None
    for n in sizes:
        rps = sustained_rays_per_sec(devs[:n], width, height, passes)
        if base is None:
            base = rps
        eff = rps / (base * n)
        results[n] = {"rays_per_sec": round(rps, 1),
                      "efficiency_vs_1": round(eff, 4)}
        print(f"{n:3d} device(s): {rps / 1e6:9.2f} Mrays/s  "
              f"efficiency {eff:6.1%}", flush=True)
    print(json.dumps({"metric": "scaling_efficiency",
                      "platform": devs[0].platform,
                      "results": results}))


if __name__ == "__main__":
    main()
