"""Tracing & timing — first-class observability the reference lacks.

The reference's only instrumentation is ad-hoc ``time.time()`` prints
(`Backend/app.py:385,600-607`, `visualization_service.py:166-169`,
`compare_models.py:917-1091` — SURVEY.md §5.1). Here:

- ``span(name)`` — context manager recording wall time into a process-local
  registry (and emitting a ``jax.profiler.TraceAnnotation`` so spans show up
  in device traces);
- ``Timer`` — aggregating timer with p50/p95 percentiles;
- ``trace_to(dir)`` — full ``jax.profiler`` device trace capture for
  perfetto/tensorboard viewing.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import numpy as np

_registry: dict[str, list[float]] = defaultdict(list)
_lock = threading.Lock()


class Timer:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        with _lock:
            _registry[self.name].append(dt)
        return False

    @staticmethod
    def report() -> dict[str, dict[str, float]]:
        with _lock:
            out = {}
            for name, samples in _registry.items():
                arr = np.asarray(samples)
                out[name] = {
                    "count": len(arr),
                    "total_s": float(arr.sum()),
                    "mean_ms": float(arr.mean() * 1e3),
                    "p50_ms": float(np.percentile(arr, 50) * 1e3),
                    "p95_ms": float(np.percentile(arr, 95) * 1e3),
                }
            return out

    @staticmethod
    def reset() -> None:
        with _lock:
            _registry.clear()


@contextlib.contextmanager
def span(name: str):
    """Wall-clock span + device-trace annotation."""
    try:
        import jax.profiler

        annotation = jax.profiler.TraceAnnotation(name)
        annotation.__enter__()
    except Exception:
        annotation = None
    with Timer(name):
        try:
            yield
        finally:
            if annotation is not None:
                annotation.__exit__(None, None, None)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler device trace under ``log_dir``."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
