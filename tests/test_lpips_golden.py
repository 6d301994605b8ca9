"""LPIPS numeric parity harness (VERDICT r1 item 1a).

The acceptance gate is "val LPIPS within 1% of the CUDA reference"
(reference training/inference_dtu.py:637-651 via the `lpips` pip package).
The package itself is absent in this zero-egress image, so parity is
established by an INDEPENDENT reimplementation of the lpips-package math in
torch (NCHW, conv2d, exactly the published compute graph: scaling layer ->
VGG16 taps relu{1_2,2_2,3_3,4_3,5_3} -> unit channel-normalize with eps
outside the sqrt -> 1x1 lin conv -> spatial mean -> sum), fed the SAME
weights as the Flax module through weight_port.load_lpips_npz (the real
ported-weights path). Agreement to <=1e-4 validates every structural choice
(taps, padding, pooling, normalization, NHWC<->NCHW orientation, the npz
layout); the remaining variable — the pretrained weight values — is a pure
data port covered by tools/export_lpips.py.
"""
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from view_neti_tpu.ops.metrics import (LPIPS, _LPIPS_SHIFT, _LPIPS_SCALE,
                                       _VGG16_CFG, _LPIPS_TAPS, make_lpips)


def _random_lpips_npz(path: Path, rng: np.random.RandomState) -> dict:
    """Random weights in the export_lpips.py npz layout (vgg/convN/kernel
    HWIO, vgg/convN/bias, linN (1,1,1,C))."""
    out = {}
    in_ch = 3
    conv_i = 0
    tap_channels = []
    relu_i = 0
    for spec in _VGG16_CFG:
        if spec == "M":
            continue
        # he-ish scale keeps activations sane through 13 conv layers
        std = (2.0 / (9 * in_ch)) ** 0.5
        out[f"vgg/conv{conv_i}/kernel"] = rng.randn(
            3, 3, in_ch, spec).astype(np.float32) * std
        out[f"vgg/conv{conv_i}/bias"] = (
            rng.randn(spec).astype(np.float32) * 0.01)
        if relu_i in _LPIPS_TAPS:
            tap_channels.append(spec)
        in_ch = spec
        conv_i += 1
        relu_i += 1
    for i, c in enumerate(tap_channels):
        out[f"lin{i}"] = np.abs(
            rng.randn(1, 1, 1, c).astype(np.float32)) * 0.1
    np.savez(path, **out)
    return out


def _torch_lpips(weights: dict, a_nhwc: np.ndarray,
                 b_nhwc: np.ndarray) -> np.ndarray:
    """Independent lpips-package reimplementation (NCHW torch)."""
    import torch.nn.functional as F

    def prep(x):
        x = torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 3, 1, 2))).float()
        shift = torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1)
        return (x - shift) / scale

    def vgg_taps(x):
        taps = []
        conv_i = 0
        relu_i = 0
        for spec in _VGG16_CFG:
            if spec == "M":
                x = F.max_pool2d(x, 2, 2)
                continue
            w = torch.from_numpy(
                weights[f"vgg/conv{conv_i}/kernel"]).permute(3, 2, 0, 1)
            b = torch.from_numpy(weights[f"vgg/conv{conv_i}/bias"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if relu_i in _LPIPS_TAPS:
                taps.append(x)
            conv_i += 1
            relu_i += 1
        return taps

    def normalize(x):
        # lpips.normalize_tensor: eps outside the sqrt
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                    + 1e-10)

    with torch.no_grad():
        fa = vgg_taps(prep(a_nhwc))
        fb = vgg_taps(prep(b_nhwc))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = (normalize(xa) - normalize(xb)) ** 2
            lin = torch.from_numpy(weights[f"lin{i}"]).permute(3, 0, 1, 2)
            # conv1x1 no bias == channel-weighted sum
            v = F.conv2d(d, lin.reshape(1, -1, 1, 1))
            total = total + v.mean(dim=(2, 3)).squeeze(1)
    return total.numpy()


class TestLPIPSCrossImplementation:
    def test_matches_independent_torch_impl(self, tmp_path):
        rng = np.random.RandomState(0)
        npz = tmp_path / "lpips_test.npz"
        weights = _random_lpips_npz(npz, rng)
        a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        b = np.clip(a + rng.randn(2, 64, 64, 3).astype(np.float32) * 0.2,
                    -1, 1)

        flax_fn = make_lpips(weights_path=str(npz))
        d_flax = np.asarray(flax_fn(jnp.asarray(a), jnp.asarray(b)))
        d_torch = _torch_lpips(weights, a, b)

        assert d_flax.shape == d_torch.shape == (2,)
        assert (d_torch > 0).all()
        np.testing.assert_allclose(d_flax, d_torch, rtol=1e-4, atol=1e-6)

    def test_identity_is_zero_and_symmetric(self, tmp_path):
        rng = np.random.RandomState(1)
        npz = tmp_path / "lpips_test.npz"
        _random_lpips_npz(npz, rng)
        fn = make_lpips(weights_path=str(npz))
        a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(fn(a, a)), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fn(a, b)),
                                   np.asarray(fn(b, a)), rtol=1e-5)

    def test_rectangular_inputs(self, tmp_path):
        """The DTU protocol evaluates at 300x400 (reference
        inference_dtu.py:434); non-square spatial dims must work."""
        rng = np.random.RandomState(2)
        npz = tmp_path / "lpips_test.npz"
        weights = _random_lpips_npz(npz, rng)
        a = rng.uniform(-1, 1, (1, 96, 128, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (1, 96, 128, 3)).astype(np.float32)
        fn = make_lpips(weights_path=str(npz))
        d_flax = np.asarray(fn(jnp.asarray(a), jnp.asarray(b)))
        d_torch = _torch_lpips(weights, a, b)
        np.testing.assert_allclose(d_flax, d_torch, rtol=1e-4, atol=1e-6)
