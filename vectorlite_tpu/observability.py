"""Observability: request metrics and device profiling hooks.

The reference's observability is logs only — ``tracing`` + tower-http
``TraceLayer`` per-request logging (reference: src/main.rs:25,
src/server.rs:374-375) with no metrics endpoint. The TPU-native equivalent
(SURVEY §5) adds:

* structured per-request latency logging plus in-memory p50/p99 counters,
  exposed at ``GET /stats`` (an extension; ``/health`` stays reference-
  compatible),
* ``jax.profiler`` integration: set ``VECTORLITE_JAX_PROFILE_DIR`` to
  capture a Perfetto-compatible device trace of the serving hot path via
  ``profile_span`` / the ``POST /debug/trace`` route.
"""

from __future__ import annotations

import bisect
import contextlib
import logging
import os
import threading
import time

logger = logging.getLogger("vectorlite_tpu.observability")


class LatencyRecorder:
    """Per-route latency reservoir with percentile readout."""

    _MAX_SAMPLES = 2048

    def __init__(self):
        self._lock = threading.Lock()
        self._samples: dict[str, list[float]] = {}
        self._counts: dict[str, int] = {}
        self._errors: dict[str, int] = {}

    def record(self, route: str, seconds: float, ok: bool = True) -> None:
        with self._lock:
            samples = self._samples.setdefault(route, [])
            bisect.insort(samples, seconds)
            if len(samples) > self._MAX_SAMPLES:
                # drop a pseudo-random element to keep the reservoir bounded
                del samples[len(samples) // 2]
            self._counts[route] = self._counts.get(route, 0) + 1
            if not ok:
                self._errors[route] = self._errors.get(route, 0) + 1

    def snapshot(self) -> dict:
        with self._lock:
            out = {}
            for route, samples in self._samples.items():
                if not samples:
                    continue
                n = len(samples)
                out[route] = {
                    "count": self._counts.get(route, 0),
                    "errors": self._errors.get(route, 0),
                    "p50_ms": round(samples[n // 2] * 1e3, 3),
                    "p99_ms": round(samples[min(n - 1, n * 99 // 100)] * 1e3, 3),
                    "max_ms": round(samples[-1] * 1e3, 3),
                }
            return out


@contextlib.contextmanager
def profile_span(name: str):
    """jax.profiler trace annotation around a serving step; also starts a
    one-shot device trace when VECTORLITE_JAX_PROFILE_DIR is set."""
    trace_dir = os.environ.get("VECTORLITE_JAX_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


_trace_lock = threading.Lock()
_trace_active = False


def capture_device_trace(seconds: float = 2.0) -> str:
    """Capture a jax.profiler device trace for `seconds`; returns the
    output directory. One capture at a time."""
    global _trace_active
    trace_dir = os.environ.get(
        "VECTORLITE_JAX_PROFILE_DIR", "/tmp/vectorlite_jax_trace"
    )
    import jax

    with _trace_lock:
        if _trace_active:
            raise RuntimeError("a trace capture is already running")
        _trace_active = True
    try:
        jax.profiler.start_trace(trace_dir)
        time.sleep(seconds)
        jax.profiler.stop_trace()
    finally:
        with _trace_lock:
            _trace_active = False
    logger.info("device trace written to %s", trace_dir)
    return trace_dir
