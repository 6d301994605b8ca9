"""Image quality metrics in JAX: masked MSE/PSNR, SSIM, LPIPS (VGG16).

Protocol parity with the reference DTU evaluation
(/root/reference/training/inference_dtu.py:469-651):
  * metrics computed at 300x400 on object-masked images,
  * PSNR = -10/ln(10) * ln(masked MSE) (inference_dtu.py:607-613),
  * SSIM with skimage defaults: 7x7 uniform filter, data_range=1.0,
    gaussian_weights=False (inference_dtu.py:616-624),
  * LPIPS with a VGG16 backbone (inference_dtu.py:637-651) — weights are
    ported via weight_port.load_lpips_npz; random weights give relative
    numbers only (zero-egress environments).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# masked MSE / PSNR (reference inference_dtu.py:489-508, 595-613)
# --------------------------------------------------------------------------

def masked_mse(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
               ) -> jnp.ndarray:
    """MSE over mask-weighted pixels. pred/gt: (..., H, W, C) in [0, 1];
    mask broadcastable, binary."""
    mask = mask.astype(jnp.float32)
    num = jnp.sum(((pred - gt) ** 2) * mask, axis=(-3, -2, -1))
    den = jnp.maximum(jnp.sum(
        mask * jnp.ones_like(pred), axis=(-3, -2, -1)), 1.0)
    return num / den


def psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """-10/ln(10) * ln(mse) — the reference's masked PSNR definition."""
    return -10.0 / jnp.log(10.0) * jnp.log(jnp.maximum(mse, 1e-12))


def masked_psnr(pred, gt, mask) -> jnp.ndarray:
    return psnr_from_mse(masked_mse(pred, gt, mask))


# --------------------------------------------------------------------------
# SSIM (skimage.structural_similarity parity: uniform 7x7 window)
# --------------------------------------------------------------------------

def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 7) -> jnp.ndarray:
    """Mean SSIM over (H, W, C) images (batched on leading dims).

    Matches skimage defaults used by the reference: uniform filter,
    K1=0.01, K2=0.03, sample covariance normalization (N/(N-1)), and mean
    over the valid (un-padded) region.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
        squeeze = True
    else:
        squeeze = False

    nd = win_size * win_size
    cov_norm = nd / (nd - 1)

    def box(x):
        # x: (B, H, W, C): depthwise VALID box filter
        B, H, W, C = x.shape
        kh = jnp.ones((win_size, 1, 1, 1), jnp.float32) / win_size
        kw = jnp.ones((1, win_size, 1, 1), jnp.float32) / win_size
        x = jax.lax.conv_general_dilated(
            x, jnp.tile(kh, (1, 1, 1, C)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        x = jax.lax.conv_general_dilated(
            x, jnp.tile(kw, (1, 1, 1, C)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return x

    ux, uy = box(a), box(b)
    uxx, uyy, uxy = box(a * a), box(b * b), box(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = data_range
    C1 = (0.01 * R) ** 2
    C2 = (0.03 * R) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    s = num / den
    out = jnp.mean(s, axis=(1, 2, 3))
    return out[0] if squeeze else out


# --------------------------------------------------------------------------
# LPIPS (VGG16 backbone + linear heads)
# --------------------------------------------------------------------------

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# feature taps after the ReLU of these conv indices (relu1_2 ... relu5_3)
_LPIPS_TAPS = (1, 3, 6, 9, 12)

_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv tower emitting the 5 LPIPS feature taps."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_i = 0
        relu_i = 0
        for spec in _VGG16_CFG:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(spec, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            if relu_i in _LPIPS_TAPS:
                taps.append(x)
            conv_i += 1
            relu_i += 1
        return taps


class LPIPS(nn.Module):
    """LPIPS distance: normalized VGG features, 1x1 linear heads, averaged.

    Inputs in [-1, 1], NHWC. Weight layout is compatible with
    weight_port.load_lpips_npz (ported from the `lpips` pip package).
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)
        a = (a - shift) / scale
        b = (b - shift) / scale
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # lpips.normalize_tensor: x / (||x||_c + eps), eps OUTSIDE the
            # sqrt (lpips package semantics; pretrained lin weights are
            # non-negative so no abs/clamp is applied at inference)
            na = xa / (jnp.sqrt(
                jnp.sum(xa ** 2, axis=-1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt(
                jnp.sum(xb ** 2, axis=-1, keepdims=True)) + 1e-10)
            d = (na - nb) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (1, 1, 1, d.shape[-1]), jnp.float32)
            total = total + jnp.mean(
                jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


def make_lpips(weights_path: Optional[str] = None,
               rng: Optional[jax.Array] = None):
    """Build LPIPS apply fn. weights_path: .npz from weight_port; None ->
    random init (relative comparisons only)."""
    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng or jax.random.PRNGKey(0), dummy, dummy)
    if weights_path is not None:
        from view_neti_tpu.weight_port import load_lpips_npz
        variables = load_lpips_npz(weights_path, variables)

    def lpips_fn(a, b):
        return model.apply(variables, a, b)

    return jax.jit(lpips_fn)
