#!/usr/bin/env python
"""Aggregate saved DTU inference results into a CSV.

Parity with /root/reference/scripts/summarize_dtu.py:1-90: recomputes
PSNR/SSIM/LPIPS per seed from the saved results bundles across scans and
writes a summary CSV. The reference's filename mismatch bug
(summarize_dtu.py:57 vs inference.py:135, SURVEY.md §3.5) is avoided by
globbing.

Usage:
  python scripts/summarize_dtu.py --results_dirs outputs/scan* \
      --iteration 3000 --out results/summarize_dtu.csv
"""
import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dirs", type=Path, nargs="+", required=True)
    ap.add_argument("--iteration", type=int, required=True)
    ap.add_argument("--out", type=Path,
                    default=Path("results/summarize_dtu.csv"))
    ap.add_argument("--do_lpips", action="store_true")
    ap.add_argument("--lpips_weights", type=str,
                    default=os.environ.get("LPIPS_WEIGHTS"),
                    help=".npz from tools/export_lpips.py; implies "
                         "--do_lpips")
    args = ap.parse_args()

    import jax.numpy as jnp
    import pandas as pd
    from flax import serialization
    from view_neti_tpu.ops import metrics as M

    lpips_fn = None
    if args.do_lpips or args.lpips_weights:
        from view_neti_tpu.ops.metrics import make_lpips
        if not args.lpips_weights:
            print("warn: LPIPS with RANDOM VGG weights (relative numbers "
                  "only) — pass --lpips_weights or set LPIPS_WEIGHTS for "
                  "real LPIPS", file=sys.stderr)
        lpips_fn = make_lpips(args.lpips_weights)

    rows = []
    for d in args.results_dirs:
        # offline-inference bundles first, then in-training validation
        # bundles (validate.py writes validation-iter_*.msgpack every
        # round — both families re-score identically). The explicit
        # *.msgpack suffix keeps the glob off the PNG sheets written to
        # the same dir (ADVICE r3); mode-3 runs save one bundle per
        # eval token, so ALL matches are scored, tagged by bundle name.
        matches = (
            sorted(d.glob(f"results_all_iter_{args.iteration}*.msgpack"))
            or sorted(d.glob(f"validation-iter_{args.iteration}-*.msgpack")))
        if not matches:
            print(f"warn: no results bundle in {d}")
            continue
        for path in matches:
            bundle = serialization.msgpack_restore(path.read_bytes())
            preds = np.asarray(bundle["imgs_pred"])     # (S, bs, h, w, 3)
            gt = np.asarray(bundle["imgs_gt"])          # (bs, h, w, 3)
            masks = np.asarray(bundle["masks"])
            for si in range(preds.shape[0]):
                p = preds[si]
                mse = np.asarray(M.masked_mse(jnp.asarray(p),
                                              jnp.asarray(gt),
                                              jnp.asarray(masks)))
                psnr = np.asarray(M.psnr_from_mse(jnp.asarray(mse)))
                ssim = np.asarray(M.ssim(jnp.asarray(p * masks),
                                         jnp.asarray(gt * masks)))
                lpips = (np.asarray(lpips_fn(
                    jnp.asarray(p * masks) * 2 - 1,
                    jnp.asarray(gt * masks) * 2 - 1))
                    if lpips_fn else np.zeros_like(ssim))
                rows.append(dict(scan=d.name, bundle=path.stem, seed=si,
                                 mse=mse.mean(), psnr=psnr.mean(),
                                 ssim=ssim.mean(), lpips=lpips.mean()))
    df = pd.DataFrame(rows)
    summary = df.groupby("seed")[["mse", "psnr", "ssim", "lpips"]].mean()
    print(summary)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(args.out, index=False)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
