#!/usr/bin/env python
"""Instrument the Coach E2E loop: where does per-dispatch host time go?

Reuses bench.py's _bench_e2e setup (synthetic DTU scan, shipped mode-2
recipe) but monkeypatches the Coach to time each host phase per dispatch:
  prep     — batch pull + stack (next(stream) + _build_batch + np.stack)
  dispatch — the jitted multi() call's return latency (async submit cost)
  fetch    — materializing the previous dispatch's metrics (lag-1 fetch)
  log      — TB/file logging
  total    — dispatch-to-dispatch wall interval

Env: BENCH_STEPS (default 40), BENCH_SPD (default 0 = auto 4).

Usage: python tools/profile_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_STEPS", "40")

import numpy as np


def main():
    import bench
    from view_neti_tpu.training import coach as coach_mod

    phases = {"prep": [], "dispatch": [], "fetch": [], "refetch": [],
              "lrcalc": [], "log": [], "interval": []}
    state = {"last_dispatch_end": None}

    orig_build = coach_mod.Coach._build_batch
    orig_resolve = coach_mod.Coach._resolve_multi
    orig_logm = coach_mod.Coach._log_step_metrics

    def timed_build(self, b):
        t0 = time.perf_counter()
        out = orig_build(self, b)
        phases["prep"].append(time.perf_counter() - t0)
        return out

    def timed_resolve(self, w, stacked):
        fn = orig_resolve(self, w, stacked)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            t1 = time.perf_counter()
            phases["dispatch"].append(t1 - t0)
            if state["last_dispatch_end"] is not None:
                phases["interval"].append(t1 - state["last_dispatch_end"])
            state["last_dispatch_end"] = t1
            return out

        return wrapped

    def timed_logm(self, pending, timer):
        t0 = time.perf_counter()
        end_step, n_opt, metrics, ipt = pending
        _ = np.asarray(metrics["total_loss"], np.float32)
        t1 = time.perf_counter()
        # inline copy of Coach._log_step_metrics with per-phase timing
        losses = np.atleast_1d(np.asarray(metrics["total_loss"], np.float32))
        t2 = time.perf_counter()
        stride = max(1, len(losses) // max(1, n_opt))
        losses = losses[stride - 1::stride]
        ips = timer.imgs_per_sec(ipt)
        t3 = time.perf_counter()
        for idx, loss in enumerate(losses):
            step_at = end_step - (len(losses) - 1 - idx)
            # host lr table, same as Coach._log_step_metrics — calling the
            # jnp lr_schedule here would dispatch a device op mid-loop (the
            # r2 pathology this profiler exists to detect) and measure a
            # regressed loop rather than the shipped one
            logs = {"total_loss": float(loss),
                    "lr": float(self._lr_host[
                        min(step_at, len(self._lr_host) - 1)])}
            if ips and idx == len(losses) - 1:
                logs["imgs_per_sec"] = ips
            self.logger.log_metrics(logs, step=step_at)
        t4 = time.perf_counter()
        phases["fetch"].append(t1 - t0)
        phases["refetch"].append(t2 - t1)
        phases["lrcalc"].append(t3 - t2)
        phases["log"].append(t4 - t3)
        return float(losses[-1])

    coach_mod.Coach._build_batch = timed_build
    coach_mod.Coach._resolve_multi = timed_resolve
    coach_mod.Coach._log_step_metrics = timed_logm

    bench._bench_e2e()

    def stats(name, xs, per="dispatch"):
        if not xs:
            return
        xs = np.asarray(xs) * 1000
        tail = xs[len(xs) // 2:]
        print(f"# {name:9s} n={len(xs):3d} "
              f"median={np.median(tail):8.1f}ms  p90={np.percentile(tail, 90):8.1f}ms  "
              f"max={tail.max():8.1f}ms  (tail half, per {per})",
              file=sys.stderr)

    print("# --- phase breakdown (steady-state tail) ---", file=sys.stderr)
    stats("prep", phases["prep"], per="micro-batch")
    stats("dispatch", phases["dispatch"])
    stats("fetch", phases["fetch"])
    stats("refetch", phases["refetch"])
    stats("lrcalc", phases["lrcalc"])
    stats("log", phases["log"])
    stats("interval", phases["interval"])


if __name__ == "__main__":
    main()
