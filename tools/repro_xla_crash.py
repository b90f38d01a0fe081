#!/usr/bin/env python
"""Minimal repro of the XLA:CPU compile-state segfault (VERDICT r3 #6).

The test suite's crash signature: ONE process that live-compiles many
reverse-mode render programs eventually dies with
``Fatal Python error: Segmentation fault`` inside
``backend_compile_and_load`` on the NEXT large grad compile (reproduced
twice at tests/test_silhouette_grad.py, ~87% through a cold-cache
single-process run; each crashing test passes in isolation).

This script reproduces the load shape without pytest: it live-compiles
``--n`` DISTINCT fwd+bwd render programs (unique widths force unique
programs; the persistent cache is disabled so every compile is real),
then one large silhouette-carrier grad — the program class the suite
dies on. ``--clear-every K`` inserts ``jax.clear_caches()`` every K
compiles (the mitigation tests/conftest.py now applies): dropping the
executable references bounds live compile state, which is the
accumulation hypothesis.

Usage:
    python tools/repro_xla_crash.py --n 160                 # expect crash
    python tools/repro_xla_crash.py --n 160 --clear-every 20  # expect pass

Prints RSS after every 10 compiles; on a crash the kernel reports
SIGSEGV (exit 139) — run under ``timeout`` in a disposable shell. Exit 0
means the final large compile survived.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache: every compile must be real work.


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def n_maps() -> int:
    """Memory-mapping count — the resource the crash actually exhausts.

    Measured (round 4): each live-compiled executable holds ~350-400
    mmap'd regions (LLVM JIT code/data sections); at the kernel default
    ``vm.max_map_count = 65530`` the process hits the cap after ~150
    large compiles, LLVM's section allocator gets ENOMEM
    (``execution_engine.cc: LLVM compilation error: Cannot allocate
    memory``), and the next load segfaults — RSS stays tiny throughout,
    which is why the crash looked arbitrary.
    """
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--clear-every", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    from gpu_bidirectional_raytracer_tpu.core.types import (
        Camera,
        IntegratorConfig,
    )
    from gpu_bidirectional_raytracer_tpu.diff import gradients as G
    from gpu_bidirectional_raytracer_tpu.integrators.direct import (
        static_light_indices,
    )
    from gpu_bidirectional_raytracer_tpu.scene import builtin

    scene = builtin.cornell_box()
    li = static_light_indices(scene)
    key = jax.random.key(0)
    cfg = IntegratorConfig.cpu_golden()

    print(f"jax {jax.__version__}, devices {len(jax.devices())}, "
          f"n={args.n}, clear_every={args.clear_every}", flush=True)
    for i in range(args.n):
        w = 16 + i  # unique width => unique program, no cache reuse
        h = 12
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        tgt = jnp.zeros((h, w, 3), jnp.float32)
        loss, g = G.render_loss_grad(scene, cam, key, tgt, cfg, w, h,
                                     li, 1, loss="l2")
        jax.block_until_ready(loss)
        if args.clear_every and (i + 1) % args.clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 10 == 0:
            print(f"compile {i + 1}/{args.n}  rss {rss_mb():.0f} MB  maps {n_maps()}", flush=True)

    # The large reverse-mode program the suite dies on: full GPU-intent
    # estimator + silhouette carrier at a bigger frame.
    print("large grad compile ...", flush=True)
    cfg_big = dataclasses.replace(IntegratorConfig(),
                                  sil_grad_tau=2.0, vis_grad_tau=2.0)
    w, h = 64, 48
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    tgt = jnp.zeros((h, w, 3), jnp.float32)
    loss, g = G.render_loss_grad(scene, cam, key, tgt, cfg_big, w, h,
                                 li, 2, loss="l2_unbiased")
    jax.block_until_ready(loss)
    print(f"SURVIVED  rss {rss_mb():.0f} MB  maps {n_maps()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
