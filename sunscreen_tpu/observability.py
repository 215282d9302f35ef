"""Logging, tracing, and metrics facade.

The reference instruments its crates with `log`/`env_logger` (e.g.
`sunscreen_runtime`'s run-loop logging and the `debugger` feature); the
TPU-native equivalents are:

- module loggers under the `sunscreen_tpu` namespace — enable with
  `sunscreen_tpu.observability.enable_logging("DEBUG")` or the standard
  `logging` machinery (env: SUNSCREEN_TPU_LOG=DEBUG at import);
- `trace(label)` — a context manager that wall-clocks a region, logs
  it, and (when profiling is active) also opens a
  `jax.profiler.TraceAnnotation` so regions show up in TensorBoard
  traces;
- `start_profiler(logdir)` / `stop_profiler()` — jax.profiler capture
  of device timelines (XLA ops, Pallas kernels, transfers);
- `metrics` — a process-wide counter/gauge registry the runtime feeds
  (programs run, ciphertext ops, noise-budget floor observed).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

_ROOT = "sunscreen_tpu"


def get_logger(name: str | None = None) -> logging.Logger:
    return logging.getLogger(f"{_ROOT}.{name}" if name else _ROOT)


def enable_logging(level: str = "INFO") -> None:
    """Attach a stderr handler to the framework's logger namespace
    (reference: env_logger::init + RUST_LOG)."""
    logger = logging.getLogger(_ROOT)
    logger.setLevel(getattr(logging, level.upper()))
    if not any(isinstance(h, logging.StreamHandler)
               for h in logger.handlers):
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)


if os.environ.get("SUNSCREEN_TPU_LOG"):
    enable_logging(os.environ["SUNSCREEN_TPU_LOG"])


class _Metrics:
    """Counters and gauges (reference analogue: the debugger/session
    stats the runtime exposes)."""

    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)
        self.gauges: dict[str, float] = {}

    def incr(self, name: str, by: int = 1) -> None:
        self.counters[name] += by

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    def gauge_min(self, name: str, value: float) -> None:
        cur = self.gauges.get(name)
        self.gauges[name] = value if cur is None else min(cur, value)

    def snapshot(self) -> dict:
        return {"counters": dict(self.counters),
                "gauges": dict(self.gauges)}

    def reset(self) -> None:
        self.counters.clear()
        self.gauges.clear()


metrics = _Metrics()


@contextlib.contextmanager
def trace(label: str, logger: logging.Logger | None = None):
    """Wall-clock a region; logs at DEBUG and records a metrics gauge.
    Inside an active jax profiler capture the region is also annotated
    on the device timeline."""
    import jax

    log = logger or get_logger("trace")
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(label):
        yield
    dt = time.perf_counter() - t0
    metrics.incr(f"trace.{label}.count")
    metrics.gauge(f"trace.{label}.last_s", dt)
    log.debug("%s: %.3f ms", label, dt * 1e3)


_PROFILER_ACTIVE = False


def start_profiler(logdir: str) -> None:
    """Capture device timelines to `logdir` (view with TensorBoard)."""
    global _PROFILER_ACTIVE
    import jax
    jax.profiler.start_trace(logdir)
    _PROFILER_ACTIVE = True
    get_logger().info("profiler capturing to %s", logdir)


def stop_profiler() -> None:
    global _PROFILER_ACTIVE
    import jax
    if _PROFILER_ACTIVE:
        jax.profiler.stop_trace()
        _PROFILER_ACTIVE = False
