"""Mode-3 fused accumulation (r3): the k-microbatch window runs as ONE
device batch of k groups with per-group scene indices, preserving the
reference's per-microbatch scene resampling (reference coach.py:155-156,
dataset.py:584-600) while gaining the fused-batch MXU utilization the
other modes already had.

Correctness backbone: grouped conditioning must equal the per-group
scalar path exactly (the CLIP pass is per-row independent; the object
mapper runs per group), and the loader must emit group-consistent
batches.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.data.dataset import TextualInversionDataset, DataLoader
from view_neti_tpu.tokenizer import FallbackTokenizer
from view_neti_tpu.training import builder
from view_neti_tpu.training.text_forward import neti_text_conditioning
from view_neti_tpu.config import RunConfig, decode

from test_train_step import _build, _batch
from test_dataset import _make_dtu_tree


class TestGroupedConditioning:
    def test_grouped_equals_per_group_scalar(self):
        cfg, built = _build(3, n_obj=3, n_view=3)
        text = built.frozen.text
        b0 = _batch(built, B=2, mode=3, object_idx=2)
        b1 = _batch(built, B=2, mode=3, object_idx=0)
        ids = jnp.concatenate([b0.input_ids, b1.input_ids])
        ph_obj = jnp.concatenate([b0.input_ids_placeholder_object,
                                  b1.input_ids_placeholder_object])
        ph_view = jnp.concatenate([b0.input_ids_placeholder_view,
                                   b1.input_ids_placeholder_view])
        ts = jnp.array([100., 200., 300., 400.])

        ctx_g, ctxb_g = neti_text_conditioning(
            text, built.trainable, ids, ph_obj, ph_view, ts,
            object_idx=jnp.array([2, 0], jnp.int32), train=False)
        ctx_a, ctxb_a = neti_text_conditioning(
            text, built.trainable, b0.input_ids,
            b0.input_ids_placeholder_object,
            b0.input_ids_placeholder_view, ts[:2],
            object_idx=jnp.asarray(2, jnp.int32), train=False)
        ctx_b, ctxb_b = neti_text_conditioning(
            text, built.trainable, b1.input_ids,
            b1.input_ids_placeholder_object,
            b1.input_ids_placeholder_view, ts[2:],
            object_idx=jnp.asarray(0, jnp.int32), train=False)

        np.testing.assert_allclose(np.asarray(ctx_g[:, :2]),
                                   np.asarray(ctx_a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx_g[:, 2:]),
                                   np.asarray(ctx_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctxb_g[:, :2]),
                                   np.asarray(ctxb_a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctxb_g[:, 2:]),
                                   np.asarray(ctxb_b), atol=1e-5)

    def test_groups_actually_differ(self):
        cfg, built = _build(3, n_obj=3, n_view=3)
        b0 = _batch(built, B=2, mode=3, object_idx=1)
        ids = jnp.concatenate([b0.input_ids, b0.input_ids])
        ph_obj = jnp.concatenate([b0.input_ids_placeholder_object] * 2)
        ph_view = jnp.concatenate([b0.input_ids_placeholder_view] * 2)
        ts = jnp.array([100., 100., 100., 100.])
        ctx, _ = neti_text_conditioning(
            built.frozen.text, built.trainable, ids, ph_obj, ph_view, ts,
            object_idx=jnp.array([1, 2], jnp.int32), train=False)
        # identical rows conditioned on different scene slices must differ
        assert not np.allclose(np.asarray(ctx[:, 0]), np.asarray(ctx[:, 2]))


class TestGroupedLoader:
    def _ds(self, tmp_path):
        root = _make_dtu_tree(tmp_path, scans=("scan1", "scan2", "scan3"),
                              size=(64, 48))
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=3,
            train_data_subsets=["scan1", "scan2", "scan3"],
            placeholder_object_tokens=["<a>", "<b>", "<c>"],
            dtu_subset=0, dtu_lighting="3", dtu_preprocess_key=-1,
            repeats=4,
            calibration_dir=str(root / "Calibration" / "cal18"))
        tok.add_tokens(ds.placeholder_tokens)
        return ds, tok

    def test_collated_object_idx_is_per_group(self, tmp_path):
        ds, tok = self._ds(tmp_path)
        loader = DataLoader(ds, batch_size=6, group_size=2, seed=3)
        batch = next(iter(loader))
        assert batch["object_idx"].shape == (3,)
        # every sample's placeholder-object id matches its group's scene
        for g in range(3):
            scene_tok = ds.placeholder_object_tokens[
                int(batch["object_idx"][g])]
            want = tok.convert_tokens_to_ids(scene_tok)
            got = batch["input_ids_placeholder_object"][2 * g:2 * g + 2]
            assert (got == want).all(), (g, got, want)

    def test_groups_resample_scenes(self, tmp_path):
        ds, _ = self._ds(tmp_path)
        loader = DataLoader(ds, batch_size=6, group_size=2, seed=0)
        seen = set()
        for batch in loader:
            seen.update(int(x) for x in batch["object_idx"])
        assert len(seen) >= 2, "scene resampling never changed scene"

    def test_indivisible_group_size_rejected(self, tmp_path):
        ds, _ = self._ds(tmp_path)
        with pytest.raises(AssertionError):
            DataLoader(ds, batch_size=5, group_size=2)


class TestFusedMode3Coach:
    def _cfg(self, tmp_path, root, fuse):
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
            "log": {"exp_dir": str(tmp_path / f"fuse_{fuse}"),
                    "save_dataset_images": False},
            "optim": {"max_train_steps": 2, "train_batch_size": 2,
                      "gradient_accumulation_steps": 2,
                      "fuse_accumulation": fuse,
                      "steps_per_dispatch": 2}})

    def test_fused_mode3_trains(self, tmp_path):
        from view_neti_tpu.training.coach import Coach
        root = _make_dtu_tree(tmp_path, scans=("scan1", "scan2"),
                              size=(64, 48))
        cfg = self._cfg(tmp_path, root, fuse=True)
        coach = Coach(cfg, arch=builder.tiny_arch(),
                      calibration_dir=str(root / "Calibration" / "cal18"))
        assert coach.mode3_group_size == 2
        assert coach.accum_k == 1 and coach.micro_batch_size == 4
        result = coach.train()
        assert result["steps"] == 2
        assert np.isfinite(result["final_loss"])

    def test_unfused_mode3_keeps_multisteps(self, tmp_path):
        from view_neti_tpu.training.coach import Coach
        root = _make_dtu_tree(tmp_path, scans=("scan1", "scan2"),
                              size=(64, 48))
        cfg = self._cfg(tmp_path, root, fuse=False)
        coach = Coach(cfg, arch=builder.tiny_arch(),
                      calibration_dir=str(root / "Calibration" / "cal18"))
        assert coach.mode3_group_size is None
        assert coach.accum_k == 2 and coach.micro_batch_size == 2
        result = coach.train()
        assert result["steps"] == 2
        assert np.isfinite(result["final_loss"])
