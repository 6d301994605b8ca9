#!/usr/bin/env python
"""Offline DTU novel-view inference from a saved checkpoint.

Parity with /root/reference/scripts/inference.py:1-168: a pyrallis-style
InferenceConfig drivable from a YAML file + dot-overrides
(input_configs/inference.yaml), loading the train config embedded in the
mapper checkpoint, regenerating all DTU view tokens, running the full
34-view sweep, saving figures and a results bundle. The reference's
NameError on non-mode-3 runs (inference.py:117, SURVEY.md §3.5) is fixed:
results are keyed by object token or None. Unlike in-training validation,
the offline path REQUIRES the step-N mapper checkpoint (reference
inference_dtu.py:118-123) and raises when it is absent.

Usage (config-file, reference parity):
  python scripts/inference.py --config_path input_configs/inference.yaml \
      [--input_dir outputs/run --iteration 3000 --seeds "[0,1,2]"]

Legacy flags (--exp_dir/--save_dir) are still accepted.
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _parse_args():
    from view_neti_tpu.config import InferenceConfig, parse_cli
    argv = sys.argv[1:]
    if any(a.startswith(("--exp_dir", "--save_dir")) for a in argv):
        # legacy argparse surface (kept for scripts/docs written against r1)
        import argparse
        ap = argparse.ArgumentParser()
        ap.add_argument("--exp_dir", type=Path, required=True)
        ap.add_argument("--iteration", type=int, required=True)
        ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
        ap.add_argument("--num_denoising_steps", type=int, default=30)
        ap.add_argument("--calibration_dir", type=str, default=None)
        ap.add_argument("--masks_root", type=str, default=None)
        ap.add_argument("--save_dir", type=Path, default=None)
        ap.add_argument("--lpips_weights", type=str, default=None)
        a = ap.parse_args(argv)
        return InferenceConfig(
            iteration=a.iteration, input_dir=a.exp_dir,
            inference_dir=a.save_dir or a.exp_dir, seeds=list(a.seeds),
            num_denoising_steps=a.num_denoising_steps,
            calibration_dir=a.calibration_dir, masks_root=a.masks_root,
            lpips_weights=a.lpips_weights)
    return parse_cli(argv, cls=InferenceConfig)


def main():
    infer_cfg = _parse_args()
    if infer_cfg.input_dir is None or infer_cfg.iteration is None:
        raise SystemExit("input_dir and iteration are required "
                         "(set them in the YAML or pass --input_dir/"
                         "--iteration)")

    from flax import serialization
    from view_neti_tpu.checkpoint import CheckpointHandler
    from view_neti_tpu.training.coach import Coach
    from view_neti_tpu.training.validate import ValidationHandler

    # the checkpoint's own embedded config drives the rebuild
    # (reference scripts/inference.py:63-66)
    input_dir = Path(infer_cfg.input_dir)
    it = infer_cfg.iteration
    ckpt = input_dir / f"mapper-steps-{it}_view.msgpack"
    if not ckpt.exists():
        ckpt = input_dir / f"mapper-steps-{it}_object.msgpack"
    cfg, _ = CheckpointHandler.load_mapper(ckpt)
    cfg.log.exp_dir = input_dir
    cfg.log.overwrite_ok = True
    cfg.eval.validation_seeds = list(infer_cfg.seeds)
    cfg.eval.num_validation_images = len(infer_cfg.seeds)
    cfg.eval.num_denoising_steps = infer_cfg.num_denoising_steps
    cfg.debug = bool(infer_cfg.debug)
    if infer_cfg.eval_placeholder_object_tokens:
        cfg.eval.eval_placeholder_object_tokens = list(
            infer_cfg.eval_placeholder_object_tokens)
    if infer_cfg.torch_dtype in ("fp16", "bf16"):
        cfg.optim.mixed_precision = "bf16"   # TPU: fp16 maps to bf16
    elif infer_cfg.torch_dtype in ("fp32", "no"):
        cfg.optim.mixed_precision = "no"

    arch = None
    if os.environ.get("VIEW_NETI_TINY"):
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        from view_neti_tpu.training import builder
        arch = builder.tiny_arch()
        cfg.model.word_embedding_dim = arch.text.hidden_size
    lpips_fn = None
    lpips_weights = (infer_cfg.lpips_weights
                     or os.environ.get("LPIPS_WEIGHTS"))
    if lpips_weights:
        from view_neti_tpu.ops.metrics import make_lpips
        lpips_fn = make_lpips(lpips_weights)
    coach = Coach(cfg, arch=arch,
                  calibration_dir=infer_cfg.calibration_dir)
    validator = ValidationHandler(cfg, masks_root=infer_cfg.masks_root,
                                  calibration_dir=infer_cfg.calibration_dir,
                                  lpips_fn=lpips_fn)
    results = validator.infer_dtu(
        coach, coach.trainable, step=it,
        num_steps=infer_cfg.num_denoising_steps,
        return_instead_of_save=True, on_missing_ckpt="raise")

    save_dir = Path(infer_cfg.inference_dir or input_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    for i, fig in enumerate(results["figures"]):
        fig.savefig(save_dir / f"preds_iter_{it}_seed{i}.png", dpi=150)
    bundle = {
        "imgs_pred": np.stack(results["imgs_pred"]),
        "imgs_gt": results["imgs_gt"],
        "masks": results["masks"],
        "metrics": {k: v for k, v in results.items()
                    if k.endswith("_mean")},
        "seeds": np.asarray(infer_cfg.seeds),
    }
    out = save_dir / f"results_all_iter_{it}.msgpack"
    out.write_bytes(serialization.msgpack_serialize(bundle))
    print("metrics:", bundle["metrics"])
    print("saved:", out)


if __name__ == "__main__":
    main()
