"""Dataset tests: mode-0 on bundled teapot images, DTU modes on a synthetic
tree, augmentations, collation."""
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from view_neti_tpu.data.dataset import TextualInversionDataset, DataLoader
from view_neti_tpu.data import dtu
from view_neti_tpu.data.augment import build_augmentations, \
    apply_augmentations
from view_neti_tpu.tokenizer import FallbackTokenizer

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


def _make_dtu_tree(tmp_path, scans=("scan114",), n_cams=8, size=(1600, 1200)):
    """Synthetic DTU layout: Rectified/scanN/rect_CCC_L_r5000.png +
    Calibration/cal18/pos_CCC.txt."""
    root = tmp_path / "dtu"
    cal = root / "Calibration" / "cal18"
    cal.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, n_cams + 1):
        m = rng.randn(3, 4) * 2
        (cal / f"pos_{i:03d}.txt").write_text(
            "\n".join(" ".join(f"{x:.6f}" for x in row) for row in m))
    for scan in scans:
        d = root / "Rectified" / scan
        d.mkdir(parents=True)
        for cam in range(1, n_cams + 1):
            for light in ("3", "2"):
                img = Image.fromarray(
                    rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
                img.save(d / f"rect_{cam:03d}_{light}_r5000.png")
    return root


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestMode0:
    def test_teapot_examples(self):
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=TEAPOT, tokenizer=tok, camera_representation="spherical",
            learnable_mode=0, placeholder_object_token="<teapot>", size=64,
            repeats=2, flip_p=0.5)
        tok.add_tokens(ds.placeholder_tokens)  # the Coach does this
        assert ds.num_images == 5
        assert len(ds) == 10
        ex = ds[0]
        assert ex["pixel_values"].shape == (64, 64, 3)
        assert ex["pixel_values"].min() >= -1 and ex["pixel_values"].max() <= 1
        assert ex["input_ids"].shape == (77,)
        assert ex["input_ids_placeholder_view"] == -1
        tid = tok.convert_tokens_to_ids("<teapot>")
        assert ex["input_ids_placeholder_object"] == tid
        assert (ex["input_ids"] == tid).sum() == 1
        assert "<teapot>" in ex["text"]

    def test_dataloader_batches(self):
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=TEAPOT, tokenizer=tok, camera_representation="spherical",
            learnable_mode=0, placeholder_object_token="<t>", size=32,
            repeats=3)
        dl = DataLoader(ds, batch_size=3, shuffle=True, seed=0)
        batch = next(iter(dl))
        assert batch["pixel_values"].shape == (3, 32, 32, 3)
        assert batch["input_ids"].shape == (3, 77)
        assert batch["input_ids"].dtype == np.int32

    def test_base_cache_reuses_decode(self):
        """The decode+resize prefix caches per file; repeated draws come
        from the cache and stay identical when augmentation is off."""
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=TEAPOT, tokenizer=tok, camera_representation="spherical",
            learnable_mode=0, placeholder_object_token="<t>", size=32,
            repeats=2, flip_p=0.0)
        tok.add_tokens(ds.placeholder_tokens)
        a = ds[0]["pixel_values"]
        assert len(ds._base_cache) == 1
        b = ds[0]["pixel_values"]
        np.testing.assert_array_equal(a, b)
        # augmented draws still vary (cache holds the pre-augment base)
        ds2 = TextualInversionDataset(
            data_root=TEAPOT, tokenizer=tok, camera_representation="spherical",
            learnable_mode=0, placeholder_object_token="<t>", size=32,
            repeats=2, flip_p=0.0, augmentation_key=7)
        # per-example stochasticity is counter-derived (seed, epoch, index)
        # — r3 resume-exactness — so variation comes from the EPOCH, not
        # from repeated draws of the same position
        draws = []
        for epoch in range(4):
            ds2.set_epoch(epoch)
            draws.append(ds2[0]["pixel_values"])
        assert any(not np.array_equal(draws[0], d) for d in draws[1:])
        ds2.set_epoch(0)
        np.testing.assert_array_equal(draws[0], ds2[0]["pixel_values"])

    def test_skip_pixels_drops_decode(self):
        """With the latent cache active the Coach flips skip_pixels: items
        and batches carry ids/caption only — no image decode."""
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=TEAPOT, tokenizer=tok, camera_representation="spherical",
            learnable_mode=0, placeholder_object_token="<t>", size=32,
            repeats=2)
        tok.add_tokens(ds.placeholder_tokens)
        ds.skip_pixels = True
        ex = ds[0]
        assert "pixel_values" not in ex
        assert ex["input_ids"].shape == (77,)
        batch = next(iter(DataLoader(ds, batch_size=3, seed=0)))
        assert "pixel_values" not in batch
        assert batch["image_idxs"].shape == (3,)
        ds.skip_pixels = False
        assert ds[0]["pixel_values"].shape == (32, 32, 3)


class TestDTUModes:
    def test_mode2_scan(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified" / "scan114", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=2,
            placeholder_object_token="<skull>", dtu_subset=0,
            dtu_lighting="3", dtu_preprocess_key=1, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        # subset 0 -> all train+test idxs, capped by available cams (8)
        assert ds.num_images == len(
            [i for i in dtu.dtu_get_train_idxs(0) if i < 8])
        # placeholder tokens: views present + object
        assert len(ds.placeholder_view_tokens) == ds.num_images
        tok.add_tokens(ds.placeholder_tokens)
        ex = ds[0]
        assert ex["pixel_values"].shape == (384, 512, 3)
        assert "<view_dtu12d_cam" in ex["text"]
        assert "<skull>" in ex["text"]
        assert ex["input_ids_placeholder_view"] >= tok.base_vocab_size

    def test_lighting_filter_applied(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified" / "scan114", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=2,
            placeholder_object_token="<s>", dtu_subset=0, dtu_lighting="2",
            dtu_preprocess_key=1, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        for p in ds.image_paths:
            assert dtu.dtu_cam_info_from_fname(p)[1] == "2"

    def test_mode3_scene_sampling(self, tmp_path):
        root = _make_dtu_tree(tmp_path, scans=("scan1", "scan2"))
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=3,
            train_data_subsets=["scan1", "scan2"],
            placeholder_object_tokens=["<a>", "<b>"],
            dtu_subset=0, dtu_lighting="3", dtu_preprocess_key=1, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        tok.add_tokens(ds.placeholder_tokens)
        seen = set()
        for _ in range(20):
            ds.reset_sampled_object()
            ex = ds[0]
            seen.add(int(ex["object_idx"]))
            obj_tok = ds.placeholder_object_tokens[int(ex["object_idx"])]
            assert obj_tok in ex["text"]
        assert seen == {0, 1}

    def test_preprocess_key0_pads_square(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified" / "scan114", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=2,
            placeholder_object_token="<s>", dtu_subset=0, dtu_lighting="3",
            dtu_preprocess_key=0, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        ex = ds[0]
        assert ex["pixel_values"].shape == (512, 512, 3)
        # bottom quarter-ish should be black padding (-1 after normalize)
        assert ex["pixel_values"][-10:].mean() == pytest.approx(-1.0)

    def test_preprocess_key2(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified" / "scan114", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=2,
            placeholder_object_token="<s>", dtu_subset=0, dtu_lighting="3",
            dtu_preprocess_key=2, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        assert ds[0]["pixel_values"].shape == (576, 768, 3)

    def test_mode1_fixed_object(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=root / "Rectified" / "scan114", tokenizer=tok,
            camera_representation="dtu-12d", learnable_mode=1,
            fixed_object_token_or_path="statue", dtu_subset=0,
            dtu_lighting="3", dtu_preprocess_key=1, repeats=1,
            calibration_dir=str(root / "Calibration" / "cal18"))
        tok.add_tokens(ds.placeholder_tokens)
        ex = ds[0]
        assert "statue" in ex["text"]
        assert ex["input_ids_placeholder_object"] == -1
        assert ds.placeholder_object_tokens == []

    def test_caption_strategies(self, tmp_path):
        root = _make_dtu_tree(tmp_path)
        for strategy, marker in [(1, "in the stye of"), (2, None)]:
            tok = FallbackTokenizer()
            ds = TextualInversionDataset(
                data_root=root / "Rectified" / "scan114", tokenizer=tok,
                camera_representation="dtu-12d", learnable_mode=1,
                fixed_object_token_or_path="statue", dtu_subset=0,
                dtu_lighting="3", dtu_preprocess_key=1, repeats=1,
                caption_strategy=strategy,
                calibration_dir=str(root / "Calibration" / "cal18"))
            tok.add_tokens(ds.placeholder_tokens)
            text = ds[0]["text"]
            if marker:
                assert marker in text
            assert "statue" in text


class TestAugmentations:
    def test_all_presets_preserve_size(self):
        rng = np.random.default_rng(0)
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (64, 48, 3), np.uint8))
        for key in range(1, 9):
            steps = build_augmentations(key, (64, 48))
            out = apply_augmentations(img, steps, rng)
            assert out.size == img.size, f"preset {key}"

    def test_deterministic_given_rng(self):
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8))
        steps = build_augmentations(6, (32, 32))
        a = apply_augmentations(img, steps, np.random.default_rng(5))
        b = apply_augmentations(img, steps, np.random.default_rng(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
