"""CoachLogger: stdout + file logging, config dump, metric trackers.

Parity with /root/reference/training/logger.py:10-48 (loguru -> stdlib
logging) and the accelerate tracker wiring (reference coach.py:804-828 ->
tensorboard SummaryWriter; wandb is gated on availability).
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Dict, Optional

from view_neti_tpu import config as config_lib


class CoachLogger:
    def __init__(self, cfg, name: str = "view_neti_tpu"):
        self.cfg = cfg
        self.exp_dir = Path(cfg.log.exp_dir)
        log_dir = self.exp_dir / "logs"
        log_dir.mkdir(parents=True, exist_ok=True)
        self.logger = logging.getLogger(name)
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False   # avoid double-printing via root
        self.logger.handlers.clear()
        fmt = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s")
        for h in (logging.StreamHandler(sys.stdout),
                  logging.FileHandler(log_dir / "log.txt")):
            h.setFormatter(fmt)
            self.logger.addHandler(h)
        self.step = 0
        self._writer = None
        self._wandb = None
        config_lib.dump_config(cfg, self.exp_dir / "config.yaml")
        if cfg.log.report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(
                    log_dir=str(self.exp_dir / cfg.log.logging_dir))
            except Exception as e:  # tensorboard optional
                self.log_message(f"tensorboard unavailable: {e}")
        if cfg.log.report_to in ("wandb", "all"):
            # availability-gated, matching the reference (reference
            # training/logger.py:30-33, coach.py:804-828): log through
            # wandb when the package exists, no-op otherwise
            try:
                import wandb
                self._wandb = wandb.init(
                    project="view_neti_tpu",
                    name=cfg.log.exp_name or None,
                    dir=str(self.exp_dir),
                    config=config_lib.encode(cfg))
            except ImportError:
                self.log_message(
                    "wandb requested (log.report_to="
                    f"{cfg.log.report_to!r}) but not installed; skipping")
            except Exception as e:
                self.log_message(f"wandb init failed: {e}")

    def log_message(self, msg: str) -> None:
        self.logger.info(msg)

    def update_step(self, step: int) -> None:
        self.step = step

    def log_metrics(self, metrics: Dict[str, float],
                    step: Optional[int] = None) -> None:
        step = step if step is not None else self.step
        if self._writer is not None:
            for k, v in metrics.items():
                self._writer.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()},
                            step=step)

    def log_images(self, tag: str, images, step: Optional[int] = None
                   ) -> None:
        """Validation image sheets to the trackers (reference
        validate.py:166-184 logs figures to tensorboard/wandb)."""
        import numpy as np
        step = step if step is not None else self.step
        if self._writer is not None:
            for i, img in enumerate(images):
                self._writer.add_image(f"{tag}/{i}", np.asarray(img),
                                       step, dataformats="HWC")
        if self._wandb is not None:
            import wandb
            self._wandb.log(
                {tag: [wandb.Image(np.asarray(im)) for im in images]},
                step=step)

    def log_start_of_training(self, total_batch_size: int,
                              num_samples: int) -> None:
        self.log_message("***** Running training *****")
        self.log_message(f"  Num examples = {num_samples}")
        self.log_message(
            f"  Instantaneous batch size per device = "
            f"{self.cfg.optim.train_batch_size}")
        self.log_message(
            f"  Total batch size (w. accumulation) = {total_batch_size}")
        self.log_message(
            f"  Gradient accumulation steps = "
            f"{self.cfg.optim.gradient_accumulation_steps}")
        self.log_message(
            f"  Total optimization steps = "
            f"{self.cfg.optim.max_train_steps}")

    def close(self):
        if self._writer is not None:
            self._writer.close()
        if self._wandb is not None:
            self._wandb.finish()
