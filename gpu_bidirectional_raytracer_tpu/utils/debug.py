"""Numerical-health checks.

The reference has no sanitizers at all (SURVEY.md §5 — launches wrapped in
`cudaGetLastError` printf and nothing else); the JAX build gets race-freedom
structurally, and this module adds the numeric guardrails: NaN/Inf detection
on render state and a debug context that enables `jax_debug_nans`.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


def check_state(state, where: str = "") -> None:
    """Raise if the accumulation state contains non-finite values."""
    bad = []
    for name in ("colors",):
        arr = getattr(state, name)
        n_bad = int(jnp.sum(~jnp.isfinite(arr)))
        if n_bad:
            bad.append(f"{name}: {n_bad} non-finite")
    if bad:
        raise FloatingPointError(
            f"render state corrupted{f' at {where}' if where else ''}: "
            + "; ".join(bad))


def finite_or_zero(x):
    """Clamp non-finite lanes to zero (a last-resort salvage for beauty
    renders; correctness paths should raise via `check_state` instead)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


@contextlib.contextmanager
def nan_debugging():
    """Enable `jax_debug_nans` for the scope (traps the op that produced
    the first NaN — the analogue the reference never had)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def image_stats(colors) -> dict:
    """Quick health summary for logging."""
    a = np.asarray(colors)
    return {
        "mean": float(a.mean()),
        "max": float(a.max()),
        "nonfinite": int((~np.isfinite(a)).sum()),
        "negative": int((a < 0).sum()),
    }
