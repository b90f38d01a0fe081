"""Counter-based random number streams.

TPU-native replacement for BOTH reference RNGs:

- the 4096-lane Mersenne-Twister device pool + ad-hoc affine-mod index
  hashes (``MersenneTwister_kernel.cu:63-110``, ``device.cu:273,562,619``),
- the two-seed multiply-with-carry CPU generator (``simplernd.h:11-25``).

Design: every random draw is addressed by a logical coordinate
``(base_key, sample, depth, purpose[, lane])`` through `jax.random.fold_in`
chains over the threefry counter PRNG. This makes draws

- *replayable*  — a pixel's entire random tape is a pure function of its
  coordinates, so renders are bitwise reproducible across runs, across
  backends (CPU golden vs TPU), and across mesh shardings;
- *differentiable-friendly* — no mutable pool state threads through the
  trace, so `jax.grad` sees a pure function;
- *checkpointable* — resume needs only (key, sample).

The legacy generators are also provided (`mwc_random`, `fill_pool`) for
heritage parity tests; the renderer itself never uses them.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

# Counter-based draws must be value-identical under any output sharding;
# partitionable threefry guarantees it (and shards RNG generation itself).
jax.config.update("jax_threefry_partitionable", True)

# Purpose codes — stable address space for draw sites.
CAM_JITTER = 0     # sub-pixel film jitter (device.cu:565-566)
LIGHT_UV = 1       # light-sphere surface sampling in NEE (device.cu:479)
DIFF_UV = 2        # cosine-hemisphere scatter (device.cu:676-677)
REFR_RR = 3        # Fresnel Russian-roulette branch (device.cu:757)
LIGHT_RAY_UV = 4   # light-subpath emission point + direction (device.cu:178-191)
LIGHT_SCATTER = 5  # light-subpath bounce scatter (device.cu:357-358, 439)


def stream_key(key: Array, sample, depth, purpose: int) -> Array:
    """Derive the key addressing one (sample, depth, purpose) draw site."""
    k = jax.random.fold_in(key, jnp.asarray(sample, dtype=jnp.uint32))
    k = jax.random.fold_in(k, jnp.asarray(depth, dtype=jnp.uint32))
    return jax.random.fold_in(k, jnp.uint32(purpose))


def uniforms(key: Array, sample, depth, purpose: int, shape) -> Array:
    """Uniform [0,1) float32 draws for one site, batched over ``shape``.

    The batch axis layout is part of the spec: the golden CPU model and the
    vectorized TPU renderer call this with identical arguments and index the
    identical array, giving bitwise-equal random tapes.
    """
    return jax.random.uniform(stream_key(key, sample, depth, purpose), shape,
                              dtype=jnp.float32)


def site_uniforms(key: Array, sample, depth, purpose: int,
                  k: int, n: int, lane_offset=None,
                  lane_total: int | None = None,
                  lane_ids: Array | None = None) -> Array:
    """``[k, n]`` uniforms for one draw site, one column per pixel/lane.

    One threefry counter block per site: element ``[j, i]`` is a pure
    function of ``(key, sample, depth, purpose, j, i)``. Because threefry
    is counter-based and partitionable, the array's VALUES are independent
    of the device sharding of the pixel axis — a 1-chip and an n-chip run
    draw bitwise-identical tapes (asserted in tests/test_parallel.py). The
    reference instead hashed a shared pool with layout-dependent
    affine-mod indices (``device.cu:273,562,619``).

    ``lane_offset``/``lane_total``: address a WINDOW of a larger tape —
    returns columns ``[lane_offset, lane_offset + n)`` of the
    ``[k, lane_total]`` site block. This is what makes tiled/banded and
    shard-local rendering bitwise-equal to the monolithic render: every
    consumer draws from the same global counter space regardless of how
    the pixel axis is split. Threefry generation is elementwise over the
    flat index, so XLA fuses the slice into generation and only the
    window's counters are actually evaluated.

    ``lane_ids``: an arbitrary per-lane GATHER of the global tape —
    returns column ``lane_ids[i]`` of the ``[k, lane_total]`` site block
    at position ``i``. This is how the lane-compacting tracer
    (path_tracer with scan_backend='pallas') keeps its permuted lanes on
    their pixels' tape: values depend only on the id, never on the lane
    position, so any permutation replays the identical tape.
    """
    k_site = stream_key(key, sample, depth, purpose)
    if lane_ids is not None:
        assert lane_total is not None, "lane_ids requires lane_total"
        full = jax.random.uniform(k_site, (k, lane_total), dtype=jnp.float32)
        return full[:, lane_ids]
    if lane_offset is None:
        return jax.random.uniform(k_site, (k, n), dtype=jnp.float32)
    assert lane_total is not None, "lane_offset requires lane_total"
    full = jax.random.uniform(k_site, (k, lane_total), dtype=jnp.float32)
    return jax.lax.dynamic_slice(
        full, (jnp.int32(0), jnp.asarray(lane_offset, jnp.int32)), (k, n))


def normals(key: Array, sample, depth, purpose: int, shape) -> Array:
    """Gaussian draws (replaces the never-launched BoxMullerGPU,
    ``MersenneTwister_kernel.cu:128-136``)."""
    return jax.random.normal(stream_key(key, sample, depth, purpose), shape,
                             dtype=jnp.float32)


def fill_pool(key: Array, n: int, sample: int = 0) -> Array:
    """Materialize a flat pool of ``n`` uniforms.

    Capability-parity with the reference's ``RandomGPU`` pool fill
    (``smallpt_cpu.c:322``); provided for tooling/tests. The renderer draws
    per-site instead — a pool is an anti-pattern under jit (large dead
    HBM traffic, replay-hostile indexing).
    """
    return uniforms(key, sample, 0, 0xFFFF, (n,))


# -- Legacy generators (heritage parity only) --------------------------------

def mwc_random(seed0: int, seed1: int) -> tuple[float, int, int]:
    """One step of the reference CPU RNG (``simplernd.h:11-25``).

    Returns (float in [0,1), new_seed0, new_seed1). Bit-exact including the
    mantissa-reinterpret trick.
    """
    seed0 = (36969 * (seed0 & 0xFFFF) + (seed0 >> 16)) & 0xFFFFFFFF
    seed1 = (18000 * (seed1 & 0xFFFF) + (seed1 >> 16)) & 0xFFFFFFFF
    ires = ((seed0 << 16) + seed1) & 0xFFFFFFFF
    bits = np.uint32((ires & 0x007FFFFF) | 0x40000000)
    f = float(np.frombuffer(bits.tobytes(), dtype=np.float32)[0])
    return (f - 2.0) / 2.0, seed0, seed1


def mwc_sequence(seed0: int, seed1: int, n: int) -> np.ndarray:
    """Vector of ``n`` successive MWC draws (stateful, host-side)."""
    out = np.empty((n,), dtype=np.float32)
    for i in range(n):
        out[i], seed0, seed1 = mwc_random(seed0, seed1)
    return out
