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
