#!/usr/bin/env python
"""Training entry point.

CLI parity with /root/reference/scripts/train.py:19-39:
  python scripts/train.py --config_path input_configs/train.yaml \
      --log.exp_name my_run --data.train_data_dir ... [--key value ...]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from view_neti_tpu.config import parse_cli
from view_neti_tpu.utils.misc import fixseed


def prepare_directories(cfg) -> None:
    """Create exp dir; refuse silent overwrite (reference
    scripts/train.py:27-36)."""
    exp_dir = Path(cfg.log.exp_dir)
    if cfg.log.exp_name:
        exp_dir = exp_dir / cfg.log.exp_name
        cfg.log.exp_dir = exp_dir
    if exp_dir.exists() and any(exp_dir.iterdir()) \
            and not cfg.log.overwrite_ok and not cfg.log.resume_from:
        raise FileExistsError(
            f"{exp_dir} exists; pass --log.overwrite_ok true to overwrite")
    exp_dir.mkdir(parents=True, exist_ok=True)


def main():
    cfg = parse_cli()
    fixseed(cfg.seed)
    prepare_directories(cfg)
    from view_neti_tpu.training.coach import Coach
    from view_neti_tpu.training.validate import ValidationHandler
    calibration_dir = os.environ.get("DTU_CALIBRATION_DIR")
    weights_dir = os.environ.get("SD_WEIGHTS_DIR")
    arch = None
    if os.environ.get("VIEW_NETI_TINY"):
        # miniature stack for smoke runs on slow hosts (tests/CI);
        # pin to CPU — tiny graphs aren't worth a (tunneled) TPU compile
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        from view_neti_tpu.training import builder
        arch = builder.tiny_arch()
        cfg.model.word_embedding_dim = arch.text.hidden_size
        cfg.data.resolution = 16
        cfg.data.dtu_preprocess_key = -1  # miniature DTU protocol
    coach = Coach(cfg, arch=arch, calibration_dir=calibration_dir,
                  weights_dir=weights_dir)
    # LPIPS_WEIGHTS: .npz exported by tools/export_lpips.py; when set,
    # validation metrics include real LPIPS (reference loads lpips-VGG
    # from the pip package at training/inference_dtu.py:19,637-651)
    lpips_fn = None
    lpips_weights = os.environ.get("LPIPS_WEIGHTS")
    if lpips_weights:
        from view_neti_tpu.ops.metrics import make_lpips
        lpips_fn = make_lpips(lpips_weights)
    coach.validator = ValidationHandler(
        cfg, masks_root=os.environ.get("DTU_MASKS_DIR"),
        calibration_dir=calibration_dir, lpips_fn=lpips_fn)
    coach.train()


if __name__ == "__main__":
    main()
