"""Bench instrumentation hooks (VERDICT r3 weak #5): the Coach's
dispatch cost-analysis capture must work through the real training loop,
because bench.py's end-to-end MFU report depends on it."""
from pathlib import Path

import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.training import builder

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
def test_dispatch_cost_analysis_through_coach(tmp_path, monkeypatch):
    from view_neti_tpu.training.coach import Coach
    monkeypatch.setenv("VIEW_NETI_BENCH_COST", "1")
    cfg = decode(RunConfig, {
        "learnable_mode": 0,
        "data": {"train_data_dir": str(TEAPOT), "repeats": 2,
                 "resolution": 16},
        "model": {"arch_view_net": 15, "word_embedding_dim": 32},
        "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
        "eval": {"validation_prompts": None},
        "optim": {"max_train_steps": 2, "train_batch_size": 2,
                  "gradient_accumulation_steps": 1}})
    coach = Coach(cfg, arch=builder.tiny_arch())
    coach.train()
    cost = coach.dispatch_cost_analysis()
    assert cost is not None, "cost hook captured nothing"
    flops, imgs = cost
    assert flops > 0
    assert imgs >= coach.micro_batch_size


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
def test_cost_hook_off_by_default(tmp_path):
    from view_neti_tpu.training.coach import Coach
    cfg = decode(RunConfig, {
        "learnable_mode": 0,
        "data": {"train_data_dir": str(TEAPOT), "repeats": 2,
                 "resolution": 16},
        "model": {"arch_view_net": 15, "word_embedding_dim": 32},
        "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
        "eval": {"validation_prompts": None},
        "optim": {"max_train_steps": 1, "train_batch_size": 2,
                  "gradient_accumulation_steps": 1}})
    coach = Coach(cfg, arch=builder.tiny_arch())
    coach.train()
    assert coach.dispatch_cost_analysis() is None
