"""Profiling: running-average function timers + JAX trace capture.

TPU-native counterpart of reference src/utils/profiler.py: tier 1 is the
`@time_function` running-average profiler printed at exit; tier 2 replaces
the torch.profiler chrome traces with `jax.profiler` traces (viewable in
TensorBoard/Perfetto) captured at configured steps.
"""

from __future__ import annotations

import atexit
import functools
import os
import time
from typing import Dict, Optional

PROFILER_ENABLED = False
_STATS: Dict[str, list] = {}


def enable():
    global PROFILER_ENABLED
    PROFILER_ENABLED = True


def time_function(fn):
    """Decorator accumulating running-average wall durations
    (reference profiler.py:60-123). No device fencing — wrap host-level
    functions, not jitted internals."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if not PROFILER_ENABLED:
            return fn(*args, **kwargs)
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        dur = time.perf_counter() - start
        name = f"{fn.__module__}.{fn.__qualname__}"
        entry = _STATS.setdefault(name, [0.0, 0])
        entry[0] += dur
        entry[1] += 1
        return out

    return wrapped


def print_profile():
    if not _STATS:
        return
    print("\n== profiler (avg seconds) ==")
    rows = sorted(_STATS.items(), key=lambda kv: -kv[1][0] / max(kv[1][1], 1))
    for name, (total, count) in rows:
        print(f"{total / count:10.4f}s  x{count:<6d} {name}")


atexit.register(print_profile)


class JaxTraceProfiler:
    """Captures jax.profiler traces at fixed steps
    (reference PytorchProfiler, profiler.py:141-188)."""

    def __init__(self, log_dir: str, steps=(12, 17)):
        self.log_dir = os.path.join(log_dir, "jax_trace")
        self.steps = set(steps)
        self._active = False

    def maybe_start(self, step: int):
        import jax

        if step in self.steps and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int):
        import jax

        if self._active and step in self.steps:
            jax.profiler.stop_trace()
            self._active = False
