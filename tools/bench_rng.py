#!/usr/bin/env python
"""Tape-cost microbench: threefry vs mix32 vs rbg on the real device.

Measures (a) generation of the full megakernel random tape for the
cornell 512x512 pass shape (the `ops.pallas_trace._build_tape` rows +
camera jitter) per PRNG impl, and (b) the sustained render pass per impl
(render_chunk, differenced trip counts so dispatch RTT cancels). This is
the measurement behind promoting mix32 to the default tape (VERDICT r3
#1: the threefry tape was ~half of every 1.66 ms pass).

Writes artifacts/RNG_TAPE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
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
    _build_tape,
)
from gpu_bidirectional_raytracer_tpu.render.progressive import (  # noqa: E402
    init_state,
    render_chunk,
)
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene  # noqa: E402

W = H = 512
IMPLS = ("threefry", "mix32", "rbg")


def _diff_time(loop_fn, n_short=8, n_long=72, reps=3):
    jax.block_until_ready(loop_fn(jnp.int32(2)))
    best = float("inf")
    for r in range(reps):
        ts = []
        for n in (n_short, n_long):
            t0 = time.perf_counter()
            jax.block_until_ready(loop_fn(jnp.int32(n), r))
            ts.append(time.perf_counter() - t0)
        d = (ts[1] - ts[0]) / (n_long - n_short)
        if d > 0.0:
            best = min(best, d)
    return best


def main() -> None:
    scn = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "scenes", "cornell.scn")
    orig, target, scene = load_scene(scn)
    cfg = IntegratorConfig()
    li = static_light_indices(scene)
    cam = Camera.make(orig, target, W, H)
    n = W * H
    L = max(len(li), 1)
    out: dict = {"device": str(jax.devices()[0].device_kind),
                 "resolution": f"{W}x{H}",
                 "tape_rows": (2 * L + 3) * cfg.max_depth + 2}

    for impl in IMPLS:
        key = rng.make_key(0, impl)

        @jax.jit
        def tape_loop(trips, salt=0, key=key):
            def body(i, acc):
                k = jax.random.fold_in(key, i + salt * 1000)
                t = _build_tape(cfg, L, k, i, n)
                ju = rng.site_uniforms(k, i, 0, rng.CAM_JITTER, 2, n)
                # consume the WHOLE tape — a single-element read lets XLA
                # dead-code-eliminate the generation (measured: ~0.02 ms
                # for every impl, i.e. nothing)
                return acc + t.sum() + ju.sum()
            return jax.lax.fori_loop(0, trips, body, jnp.float32(0.0))

        t = _diff_time(lambda tr, r=0: tape_loop(tr, r))
        out[f"tape_ms_{impl}"] = round(t * 1e3, 4)
        print(f"tape {impl}: {t * 1e3:.3f} ms", flush=True)

    for impl in IMPLS:
        state = init_state(W, H, cfg, 0, impl)

        def chunk(n_p, r=0, state=state):
            return render_chunk(scene, cam, state, n_p, cfg, W, H, li,
                                None, "pallas")

        t = _diff_time(chunk)
        out[f"pass_ms_{impl}"] = round(t * 1e3, 4)
        print(f"pass {impl}: {t * 1e3:.3f} ms", flush=True)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "RNG_TAPE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
