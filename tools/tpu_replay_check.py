#!/usr/bin/env python
"""On-device proof of the mix32 replay contract (VERDICT r3 #1).

tests/test_core.py::TestMix32Contract pins the frozen mix32 bitstream on
CPU against hard-coded vectors and an independent numpy model. This tool
re-checks the SAME frozen vectors on the real TPU and then renders a
thumbnail with the default (mix32) tape on both the TPU and an in-process
CPU device, asserting the random TAPES are bitwise equal and reporting
image agreement (renders differ only by float-rounding decision flips,
the north-star mechanism — tapes must NOT differ at all).

Output: one JSON object, committed to artifacts/REPLAY_MIX32.json.

Role parity: the replay guarantee replaces the reference's reproducible
MT19937 pool fill (/root/reference/src/MersenneTwister_kernel.cu:63-110)
— same-seed same-numbers — extended across heterogeneous backends.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpu_bidirectional_raytracer_tpu import rng  # noqa: E402
from gpu_bidirectional_raytracer_tpu.core.types import (  # noqa: E402
    Camera,
    IntegratorConfig,
)
from gpu_bidirectional_raytracer_tpu.integrators.direct import (  # noqa: E402
    static_light_indices,
)
from gpu_bidirectional_raytracer_tpu.render.progressive import (  # noqa: E402
    init_state,
    render_chunk,
)
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene  # noqa: E402

FROZEN_BITS = (548861987, 1529853855, 2658193586, 2202051641,
               4195756677, 650042591, 1373203663, 3478316495)


def main() -> None:
    out: dict = {"device": str(jax.devices()[0].device_kind),
                 "platform": jax.default_backend()}

    # --- frozen vectors on the ambient (TPU) backend ---------------------
    ks = rng.stream_key(rng.make_key(42), 3, 2, rng.DIFF_UV)
    bits = np.asarray(jax.random.bits(ks, (8,), jnp.uint32))
    out["frozen_vectors_ok"] = bool(
        tuple(int(b) for b in bits) == FROZEN_BITS)

    # large-tape agreement with the independent numpy model
    k0, k1 = (int(x) for x in np.asarray(jax.random.key_data(ks)))
    n = 1 << 20
    dev_bits = np.asarray(jax.random.bits(ks, (n,), jnp.uint32))
    model = rng.mix32_reference(k0, k1, np.arange(n))
    out["model_tape_1M_bitwise"] = bool(np.array_equal(dev_bits, model))

    # --- full render tape: TPU vs in-process CPU device -------------------
    scn = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "scenes", "cornell.scn")
    orig, target, scene = load_scene(scn)
    w, h = 64, 64
    cfg = IntegratorConfig()
    li = static_light_indices(scene)
    key = rng.make_key(0)
    sites = [(0, 0, rng.CAM_JITTER, 2), (0, 2, rng.DIFF_UV, 2),
             (3, 1, rng.LIGHT_UV, 2), (1, 4, rng.REFR_RR, 1),
             (0, 0, rng.LIGHT_RAY_UV, 4), (2, 1, rng.LIGHT_SCATTER, 3)]

    def tape(dev):
        with jax.default_device(dev):
            rows = [rng.site_uniforms(jax.device_put(key, dev), s, d, p,
                                      kk, w * h)
                    for (s, d, p, kk) in sites]
            return np.concatenate([np.asarray(r) for r in rows], axis=0)

    tpu_tape = tape(jax.devices()[0])
    cpu_tape = tape(jax.devices("cpu")[0])
    out["tape_tpu_eq_cpu_bitwise"] = bool(np.array_equal(tpu_tape, cpu_tape))

    # --- thumbnail render both ways (image-level context) ----------------
    cam = Camera.make(orig, target, w, h)

    def render(dev):
        with jax.default_device(dev):
            st = init_state(w, h, cfg, 0)
            st = render_chunk(scene, cam, st, jnp.int32(8), cfg, w, h, li)
            return np.asarray(st.colors)

    a = render(jax.devices()[0])
    b = render(jax.devices("cpu")[0])
    diff = np.abs(a - b)
    denom = np.abs(b) + 1e-4
    out["render_spp8_max_rel_diff"] = float((diff / denom).max())
    out["render_spp8_mean_rel_diff"] = float((diff / denom).mean())
    out["render_spp8_pixels_offending_1e-3"] = float(
        ((diff / denom).max(axis=-1) > 1e-3).mean())

    ok = (out["frozen_vectors_ok"] and out["model_tape_1M_bitwise"]
          and out["tape_tpu_eq_cpu_bitwise"])
    out["ok"] = bool(ok)
    print(json.dumps(out, indent=1))
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "REPLAY_MIX32.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
