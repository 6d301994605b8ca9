"""Checkpoint round-trip tests: learned embeds, mapper states, view tables,
config embedding, token-table patching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from view_neti_tpu.checkpoint import (CheckpointHandler, clean_config_dict,
                                      apply_learned_embeds_to_table)
from view_neti_tpu.config import RunConfig, decode, encode
from view_neti_tpu.models.view_tokens import build_view_token_table
from view_neti_tpu.tokenizer import FallbackTokenizer
from view_neti_tpu.data import dtu


def _handler(tmp_path, mode=2, n_view=2):
    rng = np.random.RandomState(0)
    view_tokens = [dtu.dtu_cam_params_to_token(
        rng.randn(3, 4).astype(np.float32), i) for i in range(n_view)]
    cfg = decode(RunConfig, {
        "learnable_mode": mode,
        "model": {"arch_view_net": 15, "arch_view_disable_tl": False},
        "data": {"camera_representation": "dtu-12d"}})
    h = CheckpointHandler(
        cfg, view_tokens, [600, 601], ["<thing>"], [602],
        save_root=tmp_path)
    return h, view_tokens


def _fake_trainable(rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    obj = {"net_dense0": {"kernel": rng.randn(1, 64, 16).astype(np.float32),
                          "bias": rng.randn(1, 16).astype(np.float32)}}
    view = {"net_dense0": {"kernel": rng.randn(64, 64).astype(np.float32)}}
    return {"object": obj, "view": view}


class TestCheckpoint:
    def test_learned_embeds_roundtrip(self, tmp_path):
        h, _ = _handler(tmp_path)
        table = np.random.RandomState(0).randn(640, 32).astype(np.float32)
        p = h.save_learned_embeds(table, "learned_embeds-steps-5.msgpack")
        loaded = CheckpointHandler.load_learned_embeds(p)
        assert "<thing>" in loaded
        np.testing.assert_array_equal(loaded["<thing>"], table[602])

    def test_mapper_roundtrip_with_config(self, tmp_path):
        h, view_tokens = _handler(tmp_path)
        trainable = _fake_trainable()
        consts = {"fourier_w": np.ones((32, 14), np.float32)}
        import tempfile, os
        caldir = tempfile.mkdtemp()
        rng = np.random.RandomState(3)
        for i in range(1, 4):
            m = rng.randn(3, 4)
            with open(os.path.join(caldir, f"pos_{i:03d}.txt"), "w") as f:
                f.write("\n".join(" ".join(str(x) for x in r) for r in m))
        table = build_view_token_table(view_tokens, [600, 601],
                                       calibration_dir=caldir)
        paths = h.save_mapper(trainable, consts, consts, table,
                              "mapper-steps-5.msgpack")
        assert len(paths) == 2
        view_path = [p for p in paths if "view" in p.name][0]
        cfg, payload = CheckpointHandler.load_mapper(view_path)
        assert cfg.learnable_mode == 2
        assert cfg.model.arch_view_net == 15
        np.testing.assert_array_equal(
            payload["mappers"]["view"]["params"]["net_dense0"]["kernel"],
            trainable["view"]["net_dense0"]["kernel"])
        # view table restores with bounds intact (no re-fit)
        restored = CheckpointHandler.restore_view_table(payload)
        np.testing.assert_allclose(restored.mins, table.mins)
        assert restored.deg_freedom == "dtu-12d"
        assert restored.tokens == table.tokens

    def test_object_mapper_per_token(self, tmp_path):
        h, _ = _handler(tmp_path)
        trainable = _fake_trainable()
        paths = h.save_mapper(trainable, None, None, None,
                              "mapper-steps-1.msgpack")
        obj_path = [p for p in paths if "object" in p.name][0]
        _, payload = CheckpointHandler.load_mapper(obj_path)
        assert "<thing>" in payload["mappers"]
        entry = payload["mappers"]["<thing>"]
        # slice 0 of the stacked bank
        np.testing.assert_array_equal(
            entry["params"]["net_dense0"]["bias"],
            trainable["object"]["net_dense0"]["bias"][0])

    def test_clean_config_strips_runtime_keys(self):
        cfg_enc = encode(decode(RunConfig, {}))
        cfg_enc["data"]["placeholder_view_tokens"] = ["<view_1_2_3>"]
        cfg_enc["model"]["target_norm_object"] = 0.37
        cleaned = clean_config_dict(cfg_enc)
        assert "placeholder_view_tokens" not in cleaned["data"]
        assert "target_norm_object" not in cleaned["model"]
        cfg2 = decode(RunConfig, cleaned)
        assert cfg2.model.target_norm_object is None

    def test_apply_learned_embeds(self):
        tok = FallbackTokenizer(base_vocab_size=512)
        table = np.zeros((640, 16), np.float32)
        row = np.arange(16, dtype=np.float32)
        table2, ids = apply_learned_embeds_to_table(
            table, {"<newtok>": row}, tok)
        assert len(ids) == 1
        np.testing.assert_array_equal(table2[ids[0]], row)
        assert table[ids[0]].sum() == 0  # original untouched
