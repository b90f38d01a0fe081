"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference had no fake backend at all (tests/README.md lists GPU testing
as manual); we use XLA's host-platform device-count override so sharding and
multi-chip code paths are exercised without TPUs. Must run before jax is
imported anywhere.
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a remote TPU
# tunnel whose per-op compile round-trips are far too slow for a test suite,
# and a sitecustomize may re-pin the platform via jax.config after env vars
# are read — so set both the env var and the config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the interpret-mode pallas adjoint tests
# (tests/test_pallas_grad.py) expand the fully-unrolled reverse sweep into
# XLA graphs whose CPU compiles run ~60-90s each; caching makes repeat
# suite runs minutes faster. Keyed by backend+jaxlib, safe to share.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)


# -- XLA:CPU compile-state crash guard (VERDICT r3 #6) -----------------------
# ROOT CAUSE (measured, round 4 — tools/repro_xla_crash.py): every live
# XLA:CPU executable holds ~480 mmap'd LLVM-JIT code/data sections; the
# kernel's default `vm.max_map_count` is 65530, so ONE process exceeds the
# cap after ~140 live compile-heavy programs. LLVM's section allocator then
# gets ENOMEM ("execution_engine.cc: LLVM compilation error: Cannot
# allocate memory") and the next load SEGFAULTS inside
# backend_compile_and_load — the crash the suite hit at ~160 tests
# (tests/test_silhouette_grad.py under -n 0, cold cache). RSS stays small
# throughout, which is why it looked arbitrary.
#
# Guards, in order: pyproject's `-n 4` (xdist) distributes the load; this
# fixture drops every in-process executable reference every N tests (CHEAP:
# the persistent disk cache makes any re-compile a fast cache load); and a
# map-count canary fails GRACEFULLY near the kernel cap instead of letting
# LLVM segfault.
_CLEAR_EVERY = 20
_test_counter = {"n": 0}


def _n_maps() -> int:
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def _max_map_count() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:  # non-Linux: no cap to guard
        return 1 << 30


@pytest.fixture(autouse=True)
def _compile_state_guard():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY != 0:
        return
    jax.clear_caches()
    cap = _max_map_count()
    maps = _n_maps()
    if maps > 0.9 * cap:
        pytest.fail(
            f"mmap-count canary: {maps} maps vs vm.max_map_count={cap} "
            f"even after jax.clear_caches() — the next large XLA:CPU "
            f"compile would segfault (see tools/repro_xla_crash.py). "
            f"Split this worker's load or raise vm.max_map_count.",
            pytrace=False)
