"""Profiling + debug guards.

- :class:`PhaseTimer` — wall-clock per-phase timing (input pipeline / encode /
  decode-step), the breakdown the north-star metrics need (expressions/sec/chip,
  p50 latency; BASELINE.md).
- :func:`trace` — context manager around ``jax.profiler`` for on-device traces.
- :func:`enable_nan_debugging` — the debug-mode equivalent of the reference's
  NaN hard-exit (engine.py:75-77) and all-masked-context guard (models/utils.py:60-89):
  flips ``jax_debug_nans`` so the failing op is localized instead of surfacing as a
  poisoned loss.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Dict, List


class PhaseTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            out[name] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_s": sum(xs) / len(xs),
                "p50_s": statistics.median(xs),
                "max_s": max(xs),
            }
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)
