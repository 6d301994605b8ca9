"""Resume exactness (r3): a run restored from an orbax train state must
replay the uninterrupted run's EXACT stochastic stream — no RNG state is
checkpointed because none is sequential: step keys are
fold_in(base, micro_step), epoch order is a function of (seed, epoch),
mode-3 scene resamples of the global batch counter, and per-example
stochasticity of (seed, epoch, index). The reference cannot resume at all
(reference training/coach.py:500-506 reloads weights only).
"""
from pathlib import Path

import jax
import numpy as np
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.training import builder

from test_dataset import _make_dtu_tree

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _train(cfg, calibration_dir=None):
    from view_neti_tpu.training.coach import Coach
    coach = Coach(cfg, arch=builder.tiny_arch(),
                  calibration_dir=calibration_dir)
    coach.train()
    return jax.device_get(coach.trainable)


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestMode0ResumeExact:
    def _cfg(self, exp_dir, steps, resume_from=None):
        return decode(RunConfig, {
            "learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 3,
                     "resolution": 16, "flip_p": 0.5},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "log": {"exp_dir": str(exp_dir), "save_dataset_images": False,
                    "save_steps": 2, "checkpoint_backend": "orbax",
                    **({"resume_from": str(resume_from)}
                       if resume_from else {})},
            "optim": {"max_train_steps": steps, "train_batch_size": 2,
                      "gradient_accumulation_steps": 1}})

    def test_resumed_equals_uninterrupted(self, tmp_path):
        straight = _train(self._cfg(tmp_path / "straight", 4))
        # interrupted at step 2, then resumed to 4
        _train(self._cfg(tmp_path / "parts", 2))
        resumed = _train(self._cfg(
            tmp_path / "parts", 4,
            resume_from=tmp_path / "parts" / "orbax" / "state-2"))
        for a, b in zip(_leaves(straight), _leaves(resumed)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_resume_restores_step_and_runs_remaining(self, tmp_path):
        from view_neti_tpu.training.coach import Coach
        _train(self._cfg(tmp_path / "r", 2))
        cfg = self._cfg(tmp_path / "r", 4,
                        resume_from=tmp_path / "r" / "orbax" / "state-2")
        coach = Coach(cfg, arch=builder.tiny_arch())
        assert coach.global_step == 2
        result = coach.train()
        assert result["steps"] == 4


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestMeshResumeExact:
    """The full train-interrupt-restore-continue lifecycle ON the dp×tp
    virtual device mesh: the orbax state is saved sharded from a mesh run
    and restored back onto the mesh mid-training. Must replay the
    uninterrupted mesh run exactly (same tolerance as the single-device
    resume tests)."""

    def _cfg(self, exp_dir, steps, resume_from=None):
        return decode(RunConfig, {
            "learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 3,
                     "resolution": 16, "flip_p": 0.5},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "parallel": {"use_mesh": True, "dp": 2, "tp": 2},
            "log": {"exp_dir": str(exp_dir), "save_dataset_images": False,
                    "save_steps": 2, "checkpoint_backend": "orbax",
                    **({"resume_from": str(resume_from)}
                       if resume_from else {})},
            "optim": {"max_train_steps": steps, "train_batch_size": 2,
                      "gradient_accumulation_steps": 1}})

    def _train_mesh(self, cfg):
        from view_neti_tpu.training.coach import Coach
        coach = Coach(cfg, arch=builder.tiny_arch())
        assert coach.mesh is not None, "expected a dp×tp mesh"
        assert dict(coach.mesh.shape) == {"dp": 2, "tp": 2}
        coach.train()
        return jax.device_get(coach.trainable)

    def test_resumed_equals_uninterrupted_on_mesh(self, tmp_path):
        straight = self._train_mesh(self._cfg(tmp_path / "straight", 4))
        self._train_mesh(self._cfg(tmp_path / "parts", 2))
        resumed = self._train_mesh(self._cfg(
            tmp_path / "parts", 4,
            resume_from=tmp_path / "parts" / "orbax" / "state-2"))
        for a, b in zip(_leaves(straight), _leaves(resumed)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


class TestMode3FusedResumeExact:
    def _cfg(self, exp_dir, root, steps, resume_from=None):
        return decode(RunConfig, {
            "learnable_mode": 3,
            "data": {"train_data_dir": str(root / "Rectified"),
                     "train_data_subsets": ["scan1", "scan2"],
                     "placeholder_object_tokens": ["<a>", "<b>"],
                     "super_category_object_tokens": ["object", "object"],
                     "camera_representation": "dtu-12d",
                     "dtu_subset": 0, "dtu_preprocess_key": -1,
                     "repeats": 4, "resolution": 16},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32,
                      "arch_view_disable_tl": False},
            "log": {"exp_dir": str(exp_dir), "save_dataset_images": False,
                    "save_steps": 2, "checkpoint_backend": "orbax",
                    **({"resume_from": str(resume_from)}
                       if resume_from else {})},
            "optim": {"max_train_steps": steps, "train_batch_size": 2,
                      "gradient_accumulation_steps": 2,
                      "steps_per_dispatch": 1}})

    def test_resumed_equals_uninterrupted(self, tmp_path):
        root = _make_dtu_tree(tmp_path, scans=("scan1", "scan2"),
                              size=(64, 48))
        cal = str(root / "Calibration" / "cal18")
        straight = _train(self._cfg(tmp_path / "straight", root, 4), cal)
        _train(self._cfg(tmp_path / "parts", root, 2), cal)
        resumed = _train(self._cfg(
            tmp_path / "parts", root, 4,
            resume_from=tmp_path / "parts" / "orbax" / "state-2"), cal)
        for a, b in zip(_leaves(straight), _leaves(resumed)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


class TestDeterministicSchedule:
    def _ds(self, tmp_path, seed=0):
        from view_neti_tpu.data.dataset import TextualInversionDataset
        from view_neti_tpu.tokenizer import FallbackTokenizer
        root = tmp_path / "dtu"
        if not root.exists():
            root = _make_dtu_tree(tmp_path,
                                  scans=("scan1", "scan2", "scan3"),
                                  size=(64, 48))
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=3,
            train_data_subsets=["scan1", "scan2", "scan3"],
            placeholder_object_tokens=["<a>", "<b>", "<c>"],
            dtu_subset=0, dtu_lighting="3", dtu_preprocess_key=-1,
            repeats=4, seed=seed,
            calibration_dir=str(root / "Calibration" / "cal18"))
        tok.add_tokens(ds.placeholder_tokens)
        return ds

    def test_fast_forward_matches_skipped_batches(self, tmp_path):
        from view_neti_tpu.data.dataset import DataLoader
        ds = self._ds(tmp_path)
        full = []
        loader = DataLoader(ds, batch_size=4, seed=5, group_size=2)
        for _ in range(2):          # two epochs' worth
            full.extend(iter(loader))
        ds2 = self._ds(tmp_path)
        ff = DataLoader(ds2, batch_size=4, seed=5, group_size=2,
                        start_batch=3)
        got = []
        while len(got) < len(full) - 3:
            got.extend(iter(ff))
        for a, b in zip(full[3:], got):
            np.testing.assert_array_equal(a["object_idx"],
                                          b["object_idx"])
            np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
            np.testing.assert_array_equal(a["image_idxs"],
                                          b["image_idxs"])
            np.testing.assert_allclose(a["pixel_values"],
                                       b["pixel_values"])

    def test_two_loaders_same_seed_identical(self, tmp_path):
        from view_neti_tpu.data.dataset import DataLoader
        a = list(iter(DataLoader(self._ds(tmp_path), batch_size=4,
                                 seed=1)))
        b = list(iter(DataLoader(self._ds(tmp_path), batch_size=4,
                                 seed=1)))
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["image_idxs"],
                                          bb["image_idxs"])
            np.testing.assert_array_equal(ba["object_idx"],
                                          bb["object_idx"])

    def test_epochs_differ(self, tmp_path):
        from view_neti_tpu.data.dataset import DataLoader
        ds = self._ds(tmp_path)
        loader = DataLoader(ds, batch_size=4, seed=2)
        e0 = [b["image_idxs"] for b in iter(loader)]
        e1 = [b["image_idxs"] for b in iter(loader)]
        assert not all(np.array_equal(a, b) for a, b in zip(e0, e1)), \
            "epoch orders must differ (epoch mixed into the permutation)"
