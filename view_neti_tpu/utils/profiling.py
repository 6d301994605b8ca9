"""Profiling / tracing helpers.

The reference has no tracing at all (SURVEY.md §5 — only tqdm bars). Here:
  * `trace(logdir)` — context manager around jax.profiler.trace, producing
    xplane traces viewable in TensorBoard/XProf (set
    VIEW_NETI_TRACE_DIR=... or cfg to enable in the Coach loop).
  * `annotate(name)` — TraceAnnotation for host-side phases.
  * `StepTimer` — cheap steady-state steps/sec EMA for the train loop.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Host-side named region visible in traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking-free steady-state throughput estimate (EMA of step time)."""

    def __init__(self, alpha: float = 0.1, skip: int = 2):
        self.alpha = alpha
        self.skip = skip
        self._n = 0
        self._rejects = 0
        # total outlier ticks excluded from the EMA over the timer's life
        # (ADVICE r2: masked stalls must be visible — bench.py surfaces
        # this count so a clean run is distinguishable from one whose
        # steady-state rate hides transient hiccups)
        self.rejected_total = 0
        self._last = None
        self.ema_s: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._n += 1
            if self._n > self.skip:
                if (self.ema_s is not None and dt > 5 * self.ema_s
                        and self._rejects < 3):
                    # jit compile / validation / checkpoint hiccup —
                    # steady-state estimate must not absorb it. A RUN of
                    # slow ticks is a real regime change though; after 3
                    # consecutive rejects the EMA adapts.
                    self._rejects += 1
                    self.rejected_total += 1
                    self._last = now
                    return self.ema_s
                self._rejects = 0
                self.ema_s = (dt if self.ema_s is None
                              else (1 - self.alpha) * self.ema_s
                              + self.alpha * dt)
        self._last = now
        return self.ema_s

    def imgs_per_sec(self, batch_size: int) -> Optional[float]:
        return batch_size / self.ema_s if self.ema_s else None
