"""On-device augmentation (ops/device_augment.py): correctness vs the
host/PIL parity path (data/augment.py) and structural invariants.

The device pipeline is distribution-equivalent, not bit-equivalent, to the
host path (single fused resampling pass, float math); these tests pin the
deterministic pieces against PIL/numpy and check the stochastic pieces'
gating and ranges.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance

from view_neti_tpu.ops import device_augment as da


def _img(h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


IDENTITY = da.AugmentSpec()


class TestSpecs:
    def test_presets_resolve(self):
        for key in range(1, 9):
            spec = da.from_augmentation_key(key)
            assert spec is not None and spec.jitter_p == 0.75

    def test_preset7_matches_host_table(self):
        # reference training/dataset.py:238-316 preset 7 via data/augment.py
        spec = da.from_augmentation_key(7)
        assert spec.blur_p == 0.2 and spec.rot_p == 0.75
        assert spec.crop_p == 1.0 and spec.crop_scale == (0.70, 1.3)
        assert spec.gray_p == 0.0

    def test_key0_identity_unless_flip(self):
        assert da.from_augmentation_key(0) is None
        spec = da.from_augmentation_key(0, flip_p=0.5)
        assert spec is not None and spec.flip_p == 0.5 and spec.jitter_p == 0

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError):
            da.from_augmentation_key(9)


class TestIdentityAndFlip:
    def test_identity_spec_is_normalize_only(self):
        img = _img()
        out = da.augment_one(IDENTITY, jax.random.PRNGKey(0), jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(out), img.astype(np.float32) / 127.5 - 1.0, atol=1e-5)

    def test_flip_always(self):
        img = _img()
        spec = dataclasses.replace(IDENTITY, flip_p=1.0)
        out = da.augment_one(spec, jax.random.PRNGKey(0), jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(out), img[:, ::-1].astype(np.float32) / 127.5 - 1.0,
            atol=1e-4)

    def test_flip_never(self):
        img = _img()
        spec = dataclasses.replace(IDENTITY, flip_p=1e-9)
        out = da.augment_one(spec, jax.random.PRNGKey(0), jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(out), img.astype(np.float32) / 127.5 - 1.0, atol=1e-4)


class TestColorOps:
    def test_brightness_matches_pil(self):
        """Brightness-only jitter (contrast/sat/hue strengths at 0 collapse
        their factor to exactly 1) vs PIL ImageEnhance.Brightness."""
        img = _img()
        spec = dataclasses.replace(
            IDENTITY, jitter_p=1.0, jitter_strength=(0.4, 0.0, 0.0, 0.0))
        key = jax.random.PRNGKey(3)
        out = np.asarray(da.augment_one(spec, key, jnp.asarray(img)))
        out01 = (out + 1.0) / 2.0
        # recover the sampled factor from a bright-but-unsaturated pixel
        base01 = img.astype(np.float32) / 255.0
        mask = (base01 > 0.2) & (out01 < 0.999)
        f = np.median(out01[mask] / base01[mask])
        assert 0.6 - 1e-3 <= f <= 1.4 + 1e-3
        pil = np.asarray(
            ImageEnhance.Brightness(Image.fromarray(img)).enhance(float(f)),
            dtype=np.float32) / 255.0
        np.testing.assert_allclose(out01, np.clip(pil, 0, 1), atol=2.5 / 255)

    def test_grayscale_rows_are_gray(self):
        img = _img()
        spec = dataclasses.replace(IDENTITY, gray_p=1.0)
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(0), jnp.asarray(img)))
        assert np.allclose(out[..., 0], out[..., 1], atol=1e-5)
        assert np.allclose(out[..., 1], out[..., 2], atol=1e-5)
        # luma matches PIL's "L" (ITU-R 601) within quantization
        pil_l = np.asarray(Image.fromarray(img).convert("L"),
                           dtype=np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out[..., 0], pil_l, atol=2.0 / 127.5)

    def test_hue_roundtrip(self):
        """rgb->hsv->rgb with zero shift is the identity."""
        x = jnp.asarray(_img().astype(np.float32) / 255.0)
        h, s, v = da._rgb_to_hsv(x)
        back = da._hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_blur_tiny_sigma_is_near_identity(self):
        img = _img()
        spec = dataclasses.replace(IDENTITY, blur_p=1.0,
                                   blur_sigma=(0.1, 0.2))
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(1), jnp.asarray(img)))
        base = img.astype(np.float32) / 127.5 - 1.0
        assert np.max(np.abs(out - base)) < 0.02

    def test_blur_large_sigma_smooths(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[8, 8] = 255
        spec = dataclasses.replace(IDENTITY, blur_p=1.0,
                                   blur_sigma=(1.0, 1.0))
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(1), jnp.asarray(img)))
        out01 = (out + 1) / 2
        assert out01[8, 8, 0] < 1.0 and out01[8, 7, 0] > 0.1


class TestWarp:
    def test_full_crop_no_rotation_is_identity(self):
        img = _img()
        spec = dataclasses.replace(IDENTITY, crop_p=1.0,
                                   crop_scale=(1.0, 1.0),
                                   crop_ratio=(1.0, 1.0))
        # scale 1 + ratio 1 on a non-square image clamps to (min side)^2...
        # use a square image so the box is exactly the full frame
        img = _img(32, 32)
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(5), jnp.asarray(img)))
        np.testing.assert_allclose(out, img.astype(np.float32) / 127.5 - 1.0,
                                   atol=1e-3)

    def test_rotation_preserves_center_changes_field(self):
        img = _img(33, 33, seed=2)
        spec = dataclasses.replace(IDENTITY, rot_p=1.0, rot_degrees=30.0)
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(7), jnp.asarray(img)))
        base = img.astype(np.float32) / 127.5 - 1.0
        # rotation about the center fixes the center pixel exactly
        np.testing.assert_allclose(out[16, 16], base[16, 16], atol=2e-2)
        assert not np.allclose(out, base, atol=1e-2)

    def test_rotation_fill_value(self):
        """A large rotation of a white image leaves fill (1/255) in the
        corners, matching PIL rotate fillcolor=(1,1,1)."""
        img = np.full((33, 33, 3), 255, np.uint8)
        spec = dataclasses.replace(IDENTITY, rot_p=1.0, rot_degrees=40.0)
        found = False
        for seed in range(8):
            out = np.asarray(da.augment_one(
                spec, jax.random.PRNGKey(seed), jnp.asarray(img)))
            out01 = (out + 1) / 2
            corner = out01[0, 0, 0]
            if abs(corner - 1 / 255) < 1e-3:
                found = True
                break
        assert found, "no corner landed on the fill value over 8 seeds"

    def test_crop_zoom_in(self):
        """scale < 1 crops a sub-box: the output equals some bilinear
        upsample of an interior region — check it stays within the source
        value range and differs from identity."""
        img = _img(32, 32, seed=3)
        spec = dataclasses.replace(IDENTITY, crop_p=1.0,
                                   crop_scale=(0.25, 0.25),
                                   crop_ratio=(1.0, 1.0))
        out = np.asarray(
            da.augment_one(spec, jax.random.PRNGKey(11), jnp.asarray(img)))
        base = img.astype(np.float32) / 127.5 - 1.0
        assert out.min() >= base.min() - 1e-4
        assert out.max() <= base.max() + 1e-4
        assert not np.allclose(out, base, atol=0.05)


class TestTwoPassWarp:
    def test_two_pass_equals_direct_affine_warp(self):
        """The shift+matmul two-pass warp must compute the same affine map
        as a direct (gather-style) bilinear warp. On a smooth image the
        double-resampling difference is tiny."""
        H, W = 40, 56
        yy, xx = np.mgrid[0:H, 0:W]
        img = np.stack([
            0.5 + 0.4 * np.sin(xx / 7.0),
            0.5 + 0.4 * np.cos(yy / 9.0),
            0.5 + 0.3 * np.sin((xx + yy) / 11.0)], axis=-1
        ).astype(np.float32)
        theta, i, j, bh, bw = np.deg2rad(9.0), 3.0, 5.0, 31.0, 45.0
        fill = 1.0 / 255.0
        for flip in (False, True):
            out = np.asarray(da._apply_affine(
                jnp.asarray(img), jnp.float32(theta), jnp.float32(i),
                jnp.float32(j), jnp.float32(bh), jnp.float32(bw),
                jnp.bool_(flip), rot_degrees=10.0, fill=fill))
            # direct warp of the same map (the docstring's affine)
            sw, sh = bw / W, bh / H
            cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
            xr = j + (xx + 0.5) * sw - 0.5
            yr = i + (yy + 0.5) * sh - 0.5
            xb = cx + np.cos(theta) * (xr - cx) + np.sin(theta) * (yr - cy)
            yb = cy - np.sin(theta) * (xr - cx) + np.cos(theta) * (yr - cy)
            if flip:
                xb = (W - 1) - xb
            valid = (xb > -0.5) & (xb < W - 0.5) & (yb > -0.5) & (yb < H - 0.5)
            x0 = np.clip(np.floor(xb).astype(int), 0, W - 1)
            y0 = np.clip(np.floor(yb).astype(int), 0, H - 1)
            x1 = np.clip(x0 + 1, 0, W - 1)
            y1 = np.clip(y0 + 1, 0, H - 1)
            wx = (xb - np.floor(xb))[..., None]
            wy = (yb - np.floor(yb))[..., None]
            ref = ((1 - wy) * ((1 - wx) * img[y0, x0] + wx * img[y0, x1])
                   + wy * ((1 - wx) * img[y1, x0] + wx * img[y1, x1]))
            ref = np.where(valid[..., None], ref, fill)
            # compare away from the fill boundary (sub-pixel mask edges)
            interior = valid & np.roll(valid, 2, 0) & np.roll(valid, -2, 0) \
                & np.roll(valid, 2, 1) & np.roll(valid, -2, 1)
            diff = np.abs(out - ref)[interior]
            assert diff.max() < 0.02, (flip, diff.max())


class TestBatch:
    def test_batch_shapes_and_per_sample_randomness(self):
        spec = da.from_augmentation_key(7)
        imgs = np.stack([_img(24, 32, seed=s) for s in [0, 0, 0, 0]])
        out = np.asarray(da.augment_batch(spec, jax.random.PRNGKey(0),
                                          jnp.asarray(imgs)))
        assert out.shape == imgs.shape and out.dtype == np.float32
        # identical inputs, different per-sample keys -> different outputs
        assert not np.allclose(out[0], out[1], atol=1e-3)
        assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5

    def test_jit_and_reproducible(self):
        spec = da.from_augmentation_key(7)
        imgs = jnp.asarray(np.stack([_img(16, 16, seed=s) for s in (1, 2)]))
        f = jax.jit(lambda k, x: da.augment_batch(spec, k, x))
        a = np.asarray(f(jax.random.PRNGKey(9), imgs))
        b = np.asarray(f(jax.random.PRNGKey(9), imgs))
        np.testing.assert_array_equal(a, b)


class TestTrainStepIntegration:
    def test_train_step_with_uint8_base_batch(self):
        """The step accepts uint8 bases with augment=preset 7: loss finite,
        trainable params move."""
        import dataclasses as dc

        from test_train_step import _batch, _build, _optimizer

        cfg, built = _build(2, n_view=3)
        spec = da.from_augmentation_key(7)
        opt = _optimizer(cfg, 2)
        opt_state = opt.init(built.trainable)
        from view_neti_tpu.training.train_step import make_train_step
        step = jax.jit(make_train_step(opt, augment=spec),
                       donate_argnums=(0, 1))
        batch = _batch(built, B=2)
        rng = np.random.default_rng(0)
        batch = dc.replace(batch, pixel_values=jnp.asarray(rng.integers(
            0, 256, (2, 16, 16, 3), dtype=np.uint8)))
        before = np.asarray(jax.tree_util.tree_leaves(built.trainable)[0])
        trainable, _, metrics = step(
            built.trainable, opt_state, built.frozen, batch,
            jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        after = jax.tree_util.tree_leaves(trainable)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_augment_and_moments_mutually_exclusive(self):
        import optax
        from view_neti_tpu.training.train_step import make_train_step
        with pytest.raises(ValueError):
            make_train_step(optax.adamw(1e-3), from_moments=True,
                            augment=da.from_augmentation_key(7))


class TestCropBoxDistribution:
    """RandomResizedCrop parity (ADVICE r2 medium): the emitted box aspect
    must stay inside crop_ratio even when scale*aspect draws overflow the
    image (preset 7's scale goes to 1.3); torchvision retries then falls
    back with the aspect clamped — it never emits an out-of-range ratio."""

    def _boxes(self, spec, H, W, n=500):
        def one(key):
            ka, kar, ki, kj = jax.random.split(key, 4)
            return da._sample_crop_box(ka, kar, ki, kj, H, W, spec)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        i, j, bh, bw = jax.vmap(one)(keys)
        return (np.asarray(i), np.asarray(j), np.asarray(bh),
                np.asarray(bw))

    def test_preset7_aspect_stays_in_ratio_bounds(self):
        spec = da.from_augmentation_key(7)
        H, W = 384, 512
        i, j, bh, bw = self._boxes(spec, H, W)
        ratio = bw / bh
        r0, r1 = spec.crop_ratio
        assert (ratio >= r0 - 1e-4).all() and (ratio <= r1 + 1e-4).all(), \
            (ratio.min(), ratio.max())
        assert (bw <= W + 1e-3).all() and (bh <= H + 1e-3).all()
        assert (i >= -1e-3).all() and (j >= -1e-3).all()
        assert (i + bh <= H + 1e-3).all() and (j + bw <= W + 1e-3).all()

    def test_fallback_clamps_aspect_to_ratio_edge(self):
        # a 512x64 strip can't fit any aspect in (0.75, 1.33) at scale>=0.7:
        # torchvision falls back to width=W, height=W/ratio_min
        spec = dataclasses.replace(
            IDENTITY, crop_p=1.0, crop_scale=(0.7, 1.3),
            crop_ratio=(3 / 4, 4 / 3))
        i, j, bh, bw = self._boxes(spec, H=512, W=64, n=100)
        ratio = bw / bh
        assert np.allclose(ratio, 3 / 4, atol=1e-4)
        assert np.allclose(bw, 64.0, atol=1e-3)
        # torchvision CENTERS the fallback crop (get_params i=(H-h)//2),
        # it does not place it randomly
        assert np.allclose(i, (512.0 - bh) * 0.5, atol=1e-3)
        assert np.allclose(j, 0.0, atol=1e-3)

    def test_in_bounds_draws_keep_sampled_aspect_spread(self):
        # with scale <= 1 nearly every draw is valid: the aspect should
        # SPREAD over the ratio range, not collapse to the edges
        spec = dataclasses.replace(
            IDENTITY, crop_p=1.0, crop_scale=(0.3, 0.7),
            crop_ratio=(3 / 4, 4 / 3))
        _, _, bh, bw = self._boxes(spec, H=384, W=512)
        ratio = bw / bh
        assert ratio.std() > 0.05
        assert (ratio > 0.8).any() and (ratio < 1.25).any()
