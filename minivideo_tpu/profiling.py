"""Structured performance observability.

SURVEY.md §5 names jax.profiler/Perfetto traces + structured stage
metrics as the TPU-native equivalent of the reference's MiniTraces +
external valgrind workflow (PROFILING.md).  Two tools:

- device_trace(logdir): context manager around jax.profiler traces
  (view with TensorBoard/Perfetto).  Enabled from the outside via
  MINIVIDEO_TPU_PROFILE=<dir> — bench.py and the batch pipeline wrap
  their hot sections in it.  Degrades to a no-op where the backend
  does not support profiling (e.g. tunneled devices).
- StageTimer: named wall-clock stage accumulator with a one-line
  summary, for the host-side pipeline stages (parse/pack/recon/export).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from . import trace


@contextmanager
def device_trace(logdir: str | None = None):
    """jax.profiler trace if enabled and supported, else no-op.

    logdir defaults to $MINIVIDEO_TPU_PROFILE; no-op when unset."""
    logdir = logdir or os.environ.get("MINIVIDEO_TPU_PROFILE")
    if not logdir:
        yield
        return
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:                  # noqa: BLE001 — degrade
        trace.warning("MAIN", "jax.profiler unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                trace.info("MAIN", "device trace written to %s", logdir)
            except Exception as e:          # noqa: BLE001
                trace.warning("MAIN", "stop_trace failed: %s", e)


class StageTimer:
    """Accumulates wall time + item counts per named pipeline stage."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self.items: dict[str, int] = {}

    @contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.acc[name] = self.acc.get(name, 0.0) + dt
            self.items[name] = self.items.get(name, 0) + items

    def summary(self) -> str:
        parts = []
        for name, s in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            n = self.items.get(name, 0)
            rate = f" ({n / s:.1f}/s)" if n and s > 0 else ""
            parts.append(f"{name}: {s:.3f}s{rate}")
        return " | ".join(parts)

    def report(self, module: str = "MAIN"):
        trace.info(module, "stage times: %s", self.summary())
