#!/usr/bin/env python
"""Run the full benchmark matrix at HEAD on the real TPU (VERDICT r3
item 2): every shipped mode, serialized the way the tunnel requires.

The axon tunnel allows ONE JAX process at a time and wedges on
back-to-back starts (CLAUDE.md environment facts), so this runner:
  * probes the relay first and waits for it (bounded);
  * runs each bench config as its own subprocess with a bounded timeout;
  * sleeps BENCH_MATRIX_GAP (default 75 s) between processes;
  * records every JSON line + the git SHA + timestamps into
    BENCH_MATRIX.json at the repo root.

Usage:  python tools/bench_matrix.py [--only default,mode3,...] [--steps N]
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# name -> (env overrides, timeout seconds)
CONFIGS = {
    # the headline: shipped augmented recipe end-to-end through the Coach
    "default": ({}, 4200),
    # mode-3 multi-scene pretraining recipe (grouped fused window)
    "mode3": ({"BENCH_MODE": "3"}, 4200),
    # raw device step, on-device augmentation (round-1-comparable)
    "raw_aug": ({"BENCH_E2E": "0", "BENCH_AUG": "1"}, 3600),
    # true MultiSteps accumulation (fuse_accumulation=false)
    "true_accum": ({"BENCH_FUSE": "0"}, 4200),
    # inference: 768x576, 30 DPM++ steps, CFG, 3 seeds
    "inference": ({"BENCH_INFER": "1"}, 3600),
    # full 34-view x 3-seed validation sweep
    "val_sweep": ({"BENCH_VAL": "1"}, 5400),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of "
                         + ",".join(CONFIGS))
    ap.add_argument("--steps", type=int, default=None,
                    help="override BENCH_STEPS for the training modes")
    ap.add_argument("--gap", type=float,
                    default=float(os.environ.get("BENCH_MATRIX_GAP", "75")))
    ap.add_argument("--out", type=Path, default=REPO / "BENCH_MATRIX.json")
    args = ap.parse_args()
    names = (args.only.split(",") if args.only else list(CONFIGS))
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:   # fail fast, BEFORE the relay wait / earlier configs run
        raise SystemExit(f"unknown config(s) {unknown}; "
                         f"choose from {list(CONFIGS)}")

    from view_neti_tpu.utils import relay
    if relay.tpu_requested():
        print("waiting for relay ...", flush=True)
        if not relay.wait_for_relay(
                float(os.environ.get("BENCH_RELAY_WAIT", "900"))):
            raise SystemExit("relay unreachable; aborting matrix")
        print("relay up", flush=True)

    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         cwd=REPO, capture_output=True,
                         text=True).stdout.strip()
    results = []
    if args.out.exists():
        try:
            results = json.loads(args.out.read_text())
        except Exception:
            results = []
    for i, name in enumerate(names):
        env_over, timeout = CONFIGS[name]
        env = dict(os.environ)
        env.update(env_over)
        if args.steps and name in ("default", "mode3", "true_accum"):
            env["BENCH_STEPS"] = str(args.steps)
        print(f"== [{i + 1}/{len(names)}] {name} {env_over} "
              f"(timeout {timeout}s) ==", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py")], env=env,
                capture_output=True, text=True, timeout=timeout,
                cwd=str(REPO))
            line = next((ln for ln in proc.stdout.strip().splitlines()[::-1]
                         if ln.startswith("{")), None)
            rec = json.loads(line) if line else {
                "error": f"no JSON line (rc={proc.returncode})"}
            if proc.returncode != 0 and "error" not in rec:
                rec["error"] = f"rc={proc.returncode}"
            rec["stderr_tail"] = proc.stderr.strip().splitlines()[-3:]
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout after {timeout}s"}
        rec.update(config=name, env=env_over, git_sha=sha,
                   wall_s=round(time.time() - t0, 1),
                   when=time.strftime("%Y-%m-%d %H:%M:%S"))
        print(json.dumps(rec), flush=True)
        results.append(rec)
        args.out.write_text(json.dumps(results, indent=2))
        if i + 1 < len(names):
            print(f"(cooling {args.gap:.0f}s between JAX processes)",
                  flush=True)
            time.sleep(args.gap)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
