"""Profiling and throughput metering.

Upgrades the reference's wall-clock instrumentation — ``WallClockTime`` +
the per-pass ``"Rendering time %.3f sec ... Sample/sec %.1fK"`` printf
(``display_func.c:61-72``, ``smallpt_cpu.c:282-287``) — with the same
derived metric (pixels x passes / elapsed) plus optional `jax.profiler`
traces for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class ThroughputMeter:
    """Accumulates pass timings; the ``Sample/sec`` meter as an object."""

    pixels_per_pass: int
    total_time: float = 0.0
    passes: int = 0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.total_time += dt
        self.passes += 1
        return False

    @property
    def samples_per_sec(self) -> float:
        if self.total_time == 0:
            return 0.0
        return self.pixels_per_pass * self.passes / self.total_time

    def report(self) -> str:
        # Mirrors smallpt_cpu.c:286's format, totals included.
        return (f"Rendering time {self.total_time / max(self.passes, 1):.3f} sec "
                f"(pass {self.passes}) Total:{self.total_time:.2f} "
                f"Sample/sec {self.samples_per_sec / 1e3:.1f}K")


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture a `jax.profiler` trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
