"""Profiling and throughput metrics.

TPU-native replacement for the reference's ad-hoc telemetry (frame-ms
printouts every 30 frames, renderer.cpp:1388-1396; ImGui FPS counter,
renderer.cpp:810): `jax.profiler` trace capture plus a rays/s meter with
correct device synchronization.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Timer:
    """Wall-clock timer that blocks on device results, so measured spans
    cover actual device execution (the `block_until_ready` discipline
    replacing the reference's mutex/condvar synchronization)."""

    name: str = "timer"
    samples: list = field(default_factory=list)

    @contextlib.contextmanager
    def time(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.samples.append(time.perf_counter() - t0)

    def measure(self, fn, *args, warmup: int = 1, repeats: int = 3):
        """Best-of-N timing of fn(*args) with compile warmup."""
        out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(max(0, warmup - 1)):
            jax.block_until_ready(fn(*args))
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.samples.append(time.perf_counter() - t0)
        return out

    @property
    def best(self):
        return min(self.samples) if self.samples else float("nan")

    @property
    def mean(self):
        return (
            sum(self.samples) / len(self.samples)
            if self.samples
            else float("nan")
        )


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/blackhole_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def emit_metric(metric: str, value: float, unit: str, **extra) -> str:
    """One-line JSON metric record (the bench.py output contract)."""
    line = json.dumps(
        {"metric": metric, "value": value, "unit": unit, **extra}
    )
    print(line)
    return line
