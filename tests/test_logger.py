"""CoachLogger tracker tests: wandb availability gating (reference
training/logger.py:30-33, coach.py:804-828)."""
import sys
import types

import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.training.logger import CoachLogger


def _cfg(tmp_path, report_to):
    return decode(RunConfig, {
        "log": {"exp_dir": str(tmp_path), "report_to": report_to}})


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, data, step=None):
        self.logged.append((data, step))

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    run = _FakeRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **kw: run
    mod.Image = lambda arr: ("img", getattr(arr, "shape", None))
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


class TestWandbGating:
    def test_report_to_wandb_logs_when_available(self, tmp_path,
                                                 monkeypatch):
        run = _install_fake_wandb(monkeypatch)
        logger = CoachLogger(_cfg(tmp_path, "wandb"))
        assert logger._wandb is run
        logger.update_step(5)
        logger.log_metrics({"total_loss": 0.25, "lr": 1e-3})
        assert run.logged == [({"total_loss": 0.25, "lr": 1e-3}, 5)]
        logger.close()
        assert run.finished

    def test_report_to_all_enables_both(self, tmp_path, monkeypatch):
        run = _install_fake_wandb(monkeypatch)
        logger = CoachLogger(_cfg(tmp_path, "all"))
        assert logger._wandb is run

    def test_missing_wandb_noops(self, tmp_path, monkeypatch):
        monkeypatch.setitem(sys.modules, "wandb", None)  # forces ImportError
        logger = CoachLogger(_cfg(tmp_path, "wandb"))
        assert logger._wandb is None
        logger.log_metrics({"total_loss": 1.0})     # must not raise
        logger.close()

    def test_tensorboard_default_untouched(self, tmp_path):
        logger = CoachLogger(_cfg(tmp_path, "tensorboard"))
        assert logger._wandb is None
        logger.log_metrics({"total_loss": 1.0})
        logger.close()

    def test_log_images_to_wandb(self, tmp_path, monkeypatch):
        import numpy as np
        run = _install_fake_wandb(monkeypatch)
        logger = CoachLogger(_cfg(tmp_path, "wandb"))
        imgs = [np.zeros((4, 4, 3), np.uint8)] * 2
        logger.log_images("val", imgs, step=3)
        assert len(run.logged) == 1
        data, step = run.logged[0]
        assert step == 3 and len(data["val"]) == 2
