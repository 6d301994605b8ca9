#!/usr/bin/env python
"""Offline DTU novel-view inference from a saved checkpoint.

Parity with /root/reference/scripts/inference.py:1-168: loads the train
config embedded in the mapper checkpoint, regenerates all DTU view tokens,
runs the full 34-view sweep, saves figures and a results bundle. The
reference's NameError on non-mode-3 runs (inference.py:117, SURVEY.md §3.5)
is fixed: results are keyed by object token or None.

Usage:
  python scripts/inference.py --exp_dir outputs/run --iteration 3000 \
      [--seeds 0 1 2] [--num_denoising_steps 30]
"""
import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_dir", type=Path, required=True)
    ap.add_argument("--iteration", type=int, required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--num_denoising_steps", type=int, default=30)
    ap.add_argument("--calibration_dir", type=str, default=None)
    ap.add_argument("--masks_root", type=str, default=None)
    ap.add_argument("--save_dir", type=Path, default=None)
    args = ap.parse_args()

    from flax import serialization
    from view_neti_tpu.checkpoint import CheckpointHandler
    from view_neti_tpu.training.coach import Coach
    from view_neti_tpu.training.validate import ValidationHandler

    # the checkpoint's own embedded config drives the rebuild
    # (reference scripts/inference.py:63-66)
    ckpt = args.exp_dir / f"mapper-steps-{args.iteration}_view.msgpack"
    if not ckpt.exists():
        ckpt = args.exp_dir / f"mapper-steps-{args.iteration}_object.msgpack"
    cfg, _ = CheckpointHandler.load_mapper(ckpt)
    cfg.log.exp_dir = args.exp_dir
    cfg.log.overwrite_ok = True
    cfg.eval.validation_seeds = list(args.seeds)
    cfg.eval.num_validation_images = len(args.seeds)
    cfg.eval.num_denoising_steps = args.num_denoising_steps

    arch = None
    if os.environ.get("VIEW_NETI_TINY"):
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        from view_neti_tpu.training import builder
        arch = builder.tiny_arch()
        cfg.model.word_embedding_dim = arch.text.hidden_size
    coach = Coach(cfg, arch=arch, calibration_dir=args.calibration_dir)
    validator = ValidationHandler(cfg, masks_root=args.masks_root,
                                  calibration_dir=args.calibration_dir)
    results = validator.infer_dtu(
        coach, coach.trainable, step=args.iteration,
        num_steps=args.num_denoising_steps, return_instead_of_save=True)

    save_dir = args.save_dir or args.exp_dir
    save_dir.mkdir(parents=True, exist_ok=True)
    for i, fig in enumerate(results["figures"]):
        fig.savefig(save_dir / f"preds_iter_{args.iteration}_seed{i}.png",
                    dpi=150)
    bundle = {
        "imgs_pred": np.stack(results["imgs_pred"]),
        "imgs_gt": results["imgs_gt"],
        "masks": results["masks"],
        "metrics": {k: v for k, v in results.items()
                    if k.endswith("_mean")},
        "seeds": np.asarray(args.seeds),
    }
    out = save_dir / f"results_all_iter_{args.iteration}.msgpack"
    out.write_bytes(serialization.msgpack_serialize(bundle))
    print("metrics:", bundle["metrics"])
    print("saved:", out)


if __name__ == "__main__":
    main()
