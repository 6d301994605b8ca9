"""Tests for the pure-Python core: codecs, config, tokenizer, DTU helpers."""
import numpy as np
import pytest

from view_neti_tpu.utils.codec import num_to_string, string_to_num
from view_neti_tpu import constants
from view_neti_tpu.config import (RunConfig, decode, encode, parse_cli,
                                  load_config)
from view_neti_tpu.tokenizer import FallbackTokenizer, CLIP_MAX_LENGTH
from view_neti_tpu.data import dtu

pytestmark = pytest.mark.quick


class TestCodec:
    def test_int_roundtrip(self):
        assert num_to_string(5) == "5"
        assert string_to_num("5") == 5.0

    def test_decimal_roundtrip(self):
        s = num_to_string(1.2345678, tol=4)
        assert s == "1p2346"
        assert abs(string_to_num(s) - 1.2346) < 1e-9

    def test_negative(self):
        s = num_to_string(-0.5, tol=4)
        assert "." not in s
        assert string_to_num(s) == -0.5


class TestConstants:
    def test_unet_layers(self):
        assert len(constants.UNET_LAYERS) == 16
        assert constants.UNET_LAYERS[6] == "MID"

    def test_dtu_split_disjoint(self):
        assert not set(constants.DTU_TRAIN_IDX) & set(constants.DTU_TEST_IDX)
        assert not set(constants.DTU_EXCLUDE_IDX) & set(constants.DTU_TEST_IDX)
        assert len(constants.DTU_TEST_IDX) == 49 - 9 - 15

    def test_sd_timesteps(self):
        assert len(constants.SD_INFERENCE_TIMESTEPS) == 50
        assert constants.SD_INFERENCE_TIMESTEPS[0] == 999


class TestConfig:
    def test_defaults(self):
        cfg = RunConfig()
        assert cfg.optim.train_batch_size == 3
        assert cfg.model.pe_sigmas.sigma_t == 0.03
        assert cfg.model.pe_sigmas.sigma_dtu12 == 2.0

    def test_pe_sigma_exp_keys(self):
        cfg = decode(RunConfig, {"model": {"pe_sigma_exp_key": 2}})
        assert cfg.model.pe_sigmas.sigma_dtu12 == 0.5
        cfg = decode(RunConfig, {"model": {"pe_t_exp_key": 2}})
        assert cfg.model.pe_sigmas.sigma_t == 0.2

    def test_batch_size_cap(self):
        with pytest.raises(ValueError):
            decode(RunConfig, {"optim": {"train_batch_size": 4}})

    def test_encode_roundtrip(self):
        cfg = RunConfig()
        d = encode(cfg)
        assert d["optim"]["train_batch_size"] == 3
        assert d["model"]["pe_sigmas"]["sigma_l"] == 2.0
        cfg2 = decode(RunConfig, d)
        assert cfg2.optim.learning_rate == cfg.optim.learning_rate

    def test_cli_override(self):
        cfg = parse_cli(["--learnable_mode", "2",
                         "--optim.learning_rate", "5e-4",
                         "--data.dtu_subset", "6"])
        assert cfg.learnable_mode == 2
        assert cfg.optim.learning_rate == 5e-4
        assert cfg.data.dtu_subset == 6

    def test_yaml_load(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("learnable_mode: 3\n"
                     "data:\n  super_category_object_tokens: [statue]\n"
                     "  placeholder_object_tokens: ['<a>', '<b>']\n")
        cfg = load_config(p)
        assert cfg.learnable_mode == 3
        assert cfg.data.placeholder_object_tokens == ['<a>', '<b>']


class TestTokenizer:
    def test_shapes_and_specials(self):
        tok = FallbackTokenizer()
        out = tok("a photo of a cat", padding="max_length", truncation=True,
                  max_length=tok.model_max_length, return_tensors="np")
        ids = out.input_ids
        assert ids.shape == (1, CLIP_MAX_LENGTH)
        assert ids[0, 0] == tok.bos_token_id
        assert tok.eos_token_id in ids[0]

    def test_determinism(self):
        tok1, tok2 = FallbackTokenizer(), FallbackTokenizer()
        a = tok1("a photo of a dog").input_ids
        b = tok2("a photo of a dog").input_ids
        np.testing.assert_array_equal(a, b)

    def test_add_tokens(self):
        tok = FallbackTokenizer()
        n = tok.add_tokens(["<skull>", "<view_dtu12d_cam5_1_2p5_3>"])
        assert n == 2
        assert len(tok) == tok.base_vocab_size + 2
        skull_id = tok.convert_tokens_to_ids("<skull>")
        assert skull_id >= tok.base_vocab_size
        ids = tok("<skull> on a table").input_ids[0]
        assert skull_id in ids
        # re-adding is a no-op
        assert tok.add_tokens(["<skull>"]) == 0

    def test_exactly_one_placeholder_occurrence(self):
        tok = FallbackTokenizer()
        tok.add_tokens(["<x>"])
        xid = tok.convert_tokens_to_ids("<x>")
        ids = tok("a photo of a <x>", padding="max_length").input_ids[0]
        assert (ids == xid).sum() == 1

    def test_supercategory_word_encodes_to_one_token(self):
        tok = FallbackTokenizer()
        ids = tok.encode("object", add_special_tokens=False)
        assert len(ids) == 1


class TestDTU:
    def test_train_idxs(self):
        assert dtu.dtu_get_train_idxs(1) == [25]
        assert dtu.dtu_get_train_idxs(3) == [25, 22, 28]
        assert dtu.dtu_get_train_idxs(6) == [25, 22, 28, 40, 44, 48]
        assert dtu.dtu_get_train_idxs(9) == constants.DTU_TRAIN_IDX
        assert dtu.dtu_get_train_idxs(-2) == list(range(12, 36, 2))
        assert len(dtu.dtu_get_train_idxs(0)) == 9 + 25

    def test_fname_roundtrip(self):
        fname = dtu.dtu_cam_and_lighting_to_fname(24, "3")
        assert fname == "rect_025_3_r5000.png"
        cam, light = dtu.dtu_cam_info_from_fname(fname)
        assert (cam, light) == (24, "3")

    def test_lighting_filter(self):
        paths = ["rect_001_3_r5000.png", "rect_001_2_r5000.png",
                 "rect_005_3_r5000.png"]
        from pathlib import Path
        kept = dtu.dtu_filter_fnames_lighting([Path(p) for p in paths], "3")
        assert len(kept) == 2

    def test_filter_sorted_by_cam(self):
        from pathlib import Path
        paths = [Path(dtu.dtu_cam_and_lighting_to_fname(i, "3"))
                 for i in (40, 25, 22)]
        kept = dtu.dtu_filter_image_paths_from_idx(paths, [25, 22, 28, 40])
        cams = [dtu.dtu_cam_info_from_fname(p)[0] for p in kept]
        assert cams == sorted(cams) == [22, 25, 40]

    def test_cam_token_roundtrip(self):
        cam = np.arange(12, dtype=np.float32).reshape(3, 4) * 1.37 - 3.0
        token = dtu.dtu_cam_params_to_token(cam, cam_key=7)
        assert token.startswith("<view_dtu12d_cam7_")
        params, key = dtu.dtu_token_to_cam_params(token, cam_idx_as_int=True)
        assert key == 7
        np.testing.assert_allclose(params, cam.flatten(), atol=1e-4)

    def test_calibration_read(self, tmp_path):
        caldir = tmp_path / "cal18"
        caldir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(1, 4):
            m = rng.randn(3, 4)
            (caldir / f"pos_{i:03d}.txt").write_text(
                "\n".join(" ".join(f"{x:.6f}" for x in row) for row in m))
        tokens, params = dtu.dtu_generate_dset_cam_tokens_params(caldir)
        assert set(tokens) == {0, 1, 2}
        assert params[0].shape == (3, 4)
        mins, maxs = dtu.dtu_cam_bounds(params)
        assert mins.shape == (12,) and (mins <= maxs).all()
