"""User-visible config flags must observably change behavior:
optim.gradient_checkpointing, log.save_dataset_images,
log.checkpoints_total_limit, eval.validation_view_tokens
(VERDICT r1 item 6; reference coach.py:478-490,672-677, config.py:29,
validate.py:456-467)."""
from pathlib import Path

import numpy as np
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.training import builder
from view_neti_tpu.training.validate import select_validation_view_tokens

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


def _tiny_coach(tmp_path, **overrides):
    from view_neti_tpu.training.coach import Coach
    data = {"learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 2,
                     "resolution": 16},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
            "optim": {"max_train_steps": 1}}
    for dotted, v in overrides.items():
        sect, key = dotted.split(".")
        data.setdefault(sect, {})[key] = v
    cfg = decode(RunConfig, data)
    return Coach(cfg, arch=builder.tiny_arch())


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestGradientCheckpointingFlag:
    def test_flag_reaches_both_models(self, tmp_path):
        coach = _tiny_coach(tmp_path, **{"optim.gradient_checkpointing": True})
        assert coach.arch.unet.gradient_checkpointing
        assert coach.arch.text.gradient_checkpointing

    def test_flag_off_by_default(self, tmp_path):
        coach = _tiny_coach(tmp_path)
        assert not coach.arch.unet.gradient_checkpointing
        assert not coach.arch.text.gradient_checkpointing


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestSaveDatasetImages:
    def test_contact_sheet_written(self, tmp_path):
        coach = _tiny_coach(tmp_path)
        coach.save_dataset_images()
        # 5 teapot images * repeats dedupes to the file list (<=100)
        assert (tmp_path / "dataset.png").exists()


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestCheckpointsTotalLimit:
    def test_prunes_oldest_step_checkpoints(self, tmp_path):
        coach = _tiny_coach(
            tmp_path, **{"log.checkpoints_total_limit": 2})
        for step in (100, 200, 300):
            (tmp_path / f"learned_embeds-steps-{step}.msgpack").write_bytes(
                b"x")
            (tmp_path / f"mapper-steps-{step}_object.msgpack").write_bytes(
                b"x")
        (tmp_path / "learned_embeds-final.msgpack").write_bytes(b"x")
        coach._prune_old_checkpoints()
        remaining = sorted(p.name for p in tmp_path.glob("*.msgpack"))
        assert remaining == [
            "learned_embeds-final.msgpack",
            "learned_embeds-steps-200.msgpack",
            "learned_embeds-steps-300.msgpack",
            "mapper-steps-200_object.msgpack",
            "mapper-steps-300_object.msgpack"]

    def test_no_limit_keeps_everything(self, tmp_path):
        coach = _tiny_coach(tmp_path)
        for step in (100, 200, 300):
            (tmp_path / f"learned_embeds-steps-{step}.msgpack").write_bytes(
                b"x")
        coach._prune_old_checkpoints()
        assert len(list(tmp_path.glob("*.msgpack"))) == 3


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestPrefetchTraining:
    def test_train_uses_prefetch_and_cache_skips_decode(self, tmp_path):
        """Coach.train wires the PrefetchLoader (VERDICT r1 item 3) and,
        with the latent cache active, stops decoding images it throws
        away (dataset.skip_pixels)."""
        coach = _tiny_coach(tmp_path, **{
            "data.flip_p": 0.0,            # enables the latent cache
            "optim.gradient_accumulation_steps": 1,
            "optim.train_batch_size": 2,
            "optim.max_train_steps": 2})
        assert coach.cache_latents
        result = coach.train()
        assert result["steps"] == 2
        assert np.isfinite(result["final_loss"])
        assert coach.train_dataset.skip_pixels
        assert coach._latent_cache is not None


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestSuperstepDispatch:
    def test_windows_respect_boundaries_and_train(self, tmp_path):
        """optim.steps_per_dispatch scans W steps per dispatch; windows
        shrink to land exactly on save/end boundaries; per-step losses
        still log."""
        coach = _tiny_coach(tmp_path, **{
            "data.augmentation_key": 7,
            "data.flip_p": 0.0,
            "optim.gradient_accumulation_steps": 1,
            "optim.train_batch_size": 2,
            "optim.max_train_steps": 5,
            "optim.steps_per_dispatch": 2,
            "log.save_steps": 4})
        assert coach.use_pixel_cache
        assert coach.augment_spec is not None
        assert coach._dispatch_window() == 2
        result = coach.train()
        assert result["steps"] == 5
        assert np.isfinite(result["final_loss"])
        assert (Path(tmp_path) / "learned_embeds-steps-4.msgpack").exists()

    def test_superstep_with_true_accumulation(self, tmp_path):
        """With gradient accumulation (the mode-3 execution shape) windows
        count MICRO-steps: w = steps_per_dispatch * k, and done optimizer
        steps per dispatch = w // k."""
        coach = _tiny_coach(tmp_path, **{
            "data.augmentation_key": 7,
            "data.flip_p": 0.0,
            "optim.gradient_accumulation_steps": 2,
            "optim.fuse_accumulation": False,   # keep MultiSteps(k=2)
            "optim.train_batch_size": 2,
            "optim.max_train_steps": 3,
            "optim.steps_per_dispatch": 2})
        assert coach.accum_k == 2 and coach.use_pixel_cache
        assert coach._dispatch_window() == 4   # 2 opt steps x k=2 micro
        result = coach.train()
        assert result["steps"] == 3
        assert np.isfinite(result["final_loss"])

    def test_latent_cache_rides_superstep(self, tmp_path):
        """The latent cache now lives in FrozenModels.pixel_cache too, so
        augmentation-free configs superstep as well."""
        coach = _tiny_coach(tmp_path, **{
            "data.flip_p": 0.0,
            "optim.gradient_accumulation_steps": 1,
            "optim.train_batch_size": 2,
            "optim.max_train_steps": 3})
        assert coach.cache_latents and coach.use_pixel_cache
        assert coach.steps_per_dispatch > 1  # auto
        result = coach.train()
        assert result["steps"] == 3
        assert np.isfinite(result["final_loss"])
        assert coach.built.frozen.pixel_cache is not None


class TestValidationDispatch:
    """infer() routing parity (reference validate.py:388-437): mode 3 ->
    infer_mode3; DTU vocab -> infer_dtu + disentangled; mode 0 -> prompt
    bank; non-DTU 1/2/4/5 -> prompt sheet."""

    def _route(self, monkeypatch, mode, view_tokens, object_tokens):
        from view_neti_tpu.training.validate import ValidationHandler
        cfg = decode(RunConfig, {
            "learnable_mode": mode,
            "data": ({"super_category_object_tokens": ["object"]}
                     if mode == 3 else {})})
        h = ValidationHandler(cfg)
        calls = []
        for name in ("infer_mode0", "infer_mode3", "infer_dtu",
                     "infer_prompt_sheet", "infer_disentangled_objects_dtu"):
            monkeypatch.setattr(
                h, name,
                lambda *a, _n=name, **k: calls.append(_n) or {})

        class C:
            pass
        c = C()
        c.placeholder_view_tokens = view_tokens
        c.placeholder_object_tokens = object_tokens
        h.infer(c, {}, step=1)
        return calls

    def test_mode0_routes_to_prompt_bank(self, monkeypatch):
        assert self._route(monkeypatch, 0, [], ["<t>"]) == ["infer_mode0"]

    def test_mode3_routes_to_mode3(self, monkeypatch):
        assert self._route(monkeypatch, 3, ["<view_dtu12d_x>"],
                           ["<a>"]) == ["infer_mode3"]

    def test_dtu_mode2_runs_sweep_and_disentangled(self, monkeypatch):
        assert self._route(monkeypatch, 2, ["<view_dtu12d_x>"], ["<s>"]) == \
            ["infer_dtu", "infer_disentangled_objects_dtu"]

    def test_spherical_mode2_routes_to_prompt_sheet(self, monkeypatch):
        assert self._route(monkeypatch, 2, ["<view_30_45_1p2>"],
                           ["<s>"]) == ["infer_prompt_sheet"]

    def test_spherical_mode1_routes_to_prompt_sheet(self, monkeypatch):
        assert self._route(monkeypatch, 1, ["<view_30_45_1p2>"],
                           []) == ["infer_prompt_sheet"]


class TestValidationViewTokenSelection:
    def test_explicit_tokens_win(self):
        out = select_validation_view_tokens(
            [f"<v{i}>" for i in range(200)], ["<a>", "<b>"], is_dtu=False)
        assert out == ["<a>", "<b>"]

    def test_large_vocab_subsampled_every_30(self):
        toks = [f"<v{i}>" for i in range(150)]
        out = select_validation_view_tokens(toks, None, is_dtu=False)
        assert out == toks[::30]
        assert len(out) == 5

    def test_dtu_subsampled_every_3(self):
        toks = [f"<view_dtu_{i}>" for i in range(30)]
        out = select_validation_view_tokens(toks, None, is_dtu=True)
        assert out == toks[::3][:13]

    def test_capped_at_max_rows_minus_one(self):
        toks = [f"<v{i}>" for i in range(20)]
        out = select_validation_view_tokens(toks, None, is_dtu=False)
        assert len(out) == 13
        assert out == toks[:13]

    def test_small_vocab_untouched(self):
        toks = ["<v0>", "<v1>"]
        assert select_validation_view_tokens(toks, None, False) == toks
