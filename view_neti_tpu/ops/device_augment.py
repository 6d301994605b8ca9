"""On-device (TPU) training augmentations, fused into the jitted train step.

The reference runs torchvision transforms on the host per image per step
(reference training/dataset.py:238-316 presets, applied at :605-739). On a
1-core TPU VM that host work serializes with the device step and caps the
augmented recipe's throughput (round-2 E2E profile). The TPU-native design
moves the stochastic augmentation suffix onto the chip:

  host:   decode + deterministic resize, cached once per file (uint8)
  device: [-1,1] normalize + ColorJitter + Grayscale + GaussianBlur +
          (Rotation ∘ RandomResizedCrop ∘ HorizontalFlip) as ONE fused
          bilinear warp, inside the same jit as the VAE encode + UNet step.

All randomness comes from the step's jax PRNG key (per-sample fold), so the
pipeline stays reproducible and shards over a dp mesh with no host sync.

Semantics parity notes (vs data/augment.py, the host/PIL parity path):
  * ColorJitter brightness/contrast/saturation/hue match torchvision's
    factor distributions and random op order; arithmetic is float32 in
    [0,1] instead of uint8-quantized PIL ops (differences < 1/255).
  * PIL contrast uses the rounded mean of the L channel; reproduced.
  * Rotation/crop/flip are composed into a single inverse-affine bilinear
    sample: one resampling pass instead of PIL's two (rotate, then
    crop+resize). Augmentation distributions are preserved; per-pixel
    values differ from the double-resampled host path by design.
  * RandomResizedCrop samples (area, log-aspect) like torchvision but
    clamps the box to the image instead of torchvision's 10-try rejection
    loop, and offsets are continuous rather than integer.
  * Rotation fill is 1/255 (PIL fillcolor=(1,1,1) on uint8), applied
    wherever the composed warp samples outside the source image.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AugmentSpec:
    """Static (trace-time) description of the augmentation suffix.

    Mirrors data/augment.py build_augmentations presets 1-8 (reference
    training/dataset.py:238-316) plus the mode-0 horizontal flip
    (reference training/dataset.py:686-688).
    """
    jitter_p: float = 0.0
    jitter_strength: Tuple[float, float, float, float] = (.04, .04, .04, .04)
    gray_p: float = 0.0
    blur_p: float = 0.0
    blur_sigma: Tuple[float, float] = (0.1, 0.2)
    rot_p: float = 0.0
    rot_degrees: float = 10.0
    crop_p: float = 0.0
    crop_scale: Tuple[float, float] = (0.85, 1.15)
    crop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    flip_p: float = 0.0
    fill: float = 1.0 / 255.0

    @property
    def identity(self) -> bool:
        return (self.jitter_p == 0 and self.gray_p == 0 and self.blur_p == 0
                and self.rot_p == 0 and self.crop_p == 0
                and self.flip_p == 0)


def from_augmentation_key(augmentation_key: int,
                          flip_p: float = 0.0) -> Optional[AugmentSpec]:
    """Device twin of data/augment.py build_augmentations, built from the
    same AUGMENTATION_PRESETS table (single source of truth). Returns None
    when there is nothing to do on device."""
    from view_neti_tpu.data.augment import AUGMENTATION_PRESETS
    if augmentation_key == 0:
        spec = AugmentSpec(flip_p=flip_p)
        return None if spec.identity else spec
    if augmentation_key not in AUGMENTATION_PRESETS:
        raise ValueError(f"unknown augmentation_key {augmentation_key}")
    p = AUGMENTATION_PRESETS[augmentation_key]
    spec = AugmentSpec(
        jitter_p=0.75, flip_p=flip_p,
        gray_p=p.get("gray_p", 0.0),
        blur_p=p["blur_p"],
        rot_p=p.get("rot_p", 0.0),
        crop_p=1.0 if p.get("crop_scale") else 0.0,
        crop_scale=p.get("crop_scale", (0.85, 1.15)))
    return None if spec.identity else spec


# ---------------------------------------------------------------------------
# color ops (float32, [0,1], HWC)
# ---------------------------------------------------------------------------

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601 (PIL "L")


def _luma(x: jnp.ndarray) -> jnp.ndarray:
    return x @ _LUMA


def _rgb_to_hsv(x: jnp.ndarray):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    c = maxc - minc
    safe_c = jnp.where(c > 0, c, 1.0)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(maxc > 0, c / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    return h, s, maxc


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t],
                   v),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p],
                   p),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v],
                   q),
    ], axis=-1)
    return rgb


def _color_jitter(x: jnp.ndarray, key: jax.Array,
                  strength: Tuple[float, float, float, float],
                  p: float) -> jnp.ndarray:
    b, c, s, h = strength
    kg, kb, kc, ks, kh, kp = jax.random.split(key, 6)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
    sh = jax.random.uniform(kh, (), minval=-h, maxval=h)

    def brightness(im):
        return jnp.clip(im * fb, 0.0, 1.0)

    def contrast(im):
        # PIL ImageEnhance.Contrast: blend toward the *rounded* uint8 mean
        # of the grayscale image
        mean = jnp.round(jnp.mean(_luma(im)) * 255.0) / 255.0
        return jnp.clip(mean + fc * (im - mean), 0.0, 1.0)

    def saturation(im):
        g = _luma(im)[..., None]
        return jnp.clip(g + fs * (im - g), 0.0, 1.0)

    def hue(im):
        hh, ss, vv = _rgb_to_hsv(im)
        return _hsv_to_rgb((hh + sh) % 1.0, ss, vv)

    branches = [brightness, contrast, saturation, hue]
    perm = jax.random.permutation(kg, 4)
    out = x
    for k in range(4):
        out = jax.lax.switch(perm[k], branches, out)
    applied = jax.random.uniform(kp) < p
    return jnp.where(applied, out, x)


def _grayscale(x: jnp.ndarray, key: jax.Array, p: float) -> jnp.ndarray:
    g = jnp.clip(_luma(x), 0.0, 1.0)[..., None]
    applied = jax.random.uniform(key) < p
    return jnp.where(applied, jnp.broadcast_to(g, x.shape), x)


def _gaussian_blur(x: jnp.ndarray, key: jax.Array, p: float,
                   sigma_range: Tuple[float, float]) -> jnp.ndarray:
    """3-tap separable gaussian with edge padding. The presets use
    sigma <= 0.25 px, where taps beyond +-1 are < 1e-5 of the total."""
    kp, ks = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    w1 = jnp.exp(-0.5 / (sigma * sigma))
    w = jnp.stack([w1, 1.0, w1])
    w = w / jnp.sum(w)
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)), mode="edge")
    xv = w[0] * xp[:-2] + w[1] * xp[1:-1] + w[2] * xp[2:]
    xp = jnp.pad(xv, ((0, 0), (1, 1), (0, 0)), mode="edge")
    xh = w[0] * xp[:, :-2] + w[1] * xp[:, 1:-1] + w[2] * xp[:, 2:]
    applied = jax.random.uniform(kp) < p
    return jnp.where(applied, xh, x)


# ---------------------------------------------------------------------------
# fused geometric warp: flip -> rotate -> random-resized-crop, one sample
# ---------------------------------------------------------------------------
#
# TPU design note: a direct bilinear warp is a 196k-element random gather —
# ~50 ms/step at bench shapes (TPU gathers of 3-float rows don't vectorize).
# Instead the affine map is factored Catmull-Smith style into two
# axis-aligned passes, each "per-line fractional shift (contiguous dynamic
# slices) + one dense (N x N) interpolation matmul" — all MXU/copy work, no
# scatter/gather of scalars. Exact for affine maps (each pass resamples
# along one axis only; quality equals two chained 1-D bilinear resamples).


def _tri_matrix(pos: jnp.ndarray, n: int) -> jnp.ndarray:
    """(len(pos), n) bilinear interpolation matrix: row p samples source
    coordinate pos[p] from n edge-clamped taps."""
    posc = jnp.clip(pos, 0.0, n - 1.0)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(posc[:, None] - jnp.arange(n, dtype=jnp.float32)))


def _shift_rows(x: jnp.ndarray, d: jnp.ndarray, pad: int) -> jnp.ndarray:
    """x: (R, N, C); per-row fractional translate along axis 1 by d[r]
    (edge-clamped): out[r, i] = x[r, i + d[r]] bilinear."""
    R, N, C = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad + 1), (0, 0)), mode="edge")
    k = jnp.floor(d)
    f = (d - k)[:, None, None]
    ki = jnp.clip(k.astype(jnp.int32) + pad, 0, 2 * pad)

    def slc(row, kk):
        return jax.lax.dynamic_slice(row, (kk, 0), (N + 1, C))

    sl = jax.vmap(slc)(padded, ki)
    return (1.0 - f) * sl[:, :N] + f * sl[:, 1:]


def _sample_crop_box(ka, kar, ki, kj, H: int, W: int, spec: AugmentSpec):
    """RandomResizedCrop box with torchvision semantics
    (torchvision RandomResizedCrop.get_params): K=10 (area, log-aspect)
    draws, FIRST in-bounds draw wins; if all overflow the image, fall
    back to the largest crop with the aspect CLAMPED INTO crop_ratio
    (torchvision's center-crop-style fallback). Vectorized draws + argmax
    replace the host's rejection loop — the emitted box aspect never
    leaves (crop_ratio[0], crop_ratio[1]) (ADVICE r2: the old independent
    bw/bh clamping stretched ~10% of preset-7 draws anisotropically).

    Returns (i, j, bh, bw): top-left corner + box size, all traced."""
    K = 10
    areas = H * W * jax.random.uniform(
        ka, (K,), minval=spec.crop_scale[0], maxval=spec.crop_scale[1])
    log_r = jax.random.uniform(
        kar, (K,), minval=jnp.log(spec.crop_ratio[0]),
        maxval=jnp.log(spec.crop_ratio[1]))
    aspects = jnp.exp(log_r)
    bws = jnp.sqrt(areas * aspects)
    bhs = jnp.sqrt(areas / aspects)
    valid = (bws <= W) & (bhs <= H) & (bws >= 8.0) & (bhs >= 8.0)
    pick = jnp.argmax(valid)                  # first valid draw (or 0)
    r0, r1 = spec.crop_ratio
    in_ratio = W / H
    if in_ratio < r0:
        fb_w, fb_h = float(W), W / r0
    elif in_ratio > r1:
        fb_w, fb_h = H * r1, float(H)
    else:
        fb_w, fb_h = float(W), float(H)
    any_valid = jnp.any(valid)
    bw = jnp.where(any_valid, bws[pick], fb_w)
    bh = jnp.where(any_valid, bhs[pick], fb_h)
    # torchvision places a successful draw uniformly but CENTERS the
    # fallback crop (get_params: i=(H-h)//2, j=(W-w)//2)
    i = jnp.where(any_valid, jax.random.uniform(ki, ()) * (H - bh),
                  (H - bh) * 0.5)
    j = jnp.where(any_valid, jax.random.uniform(kj, ()) * (W - bw),
                  (W - bw) * 0.5)
    return i, j, bh, bw


def _affine_warp(x: jnp.ndarray, key: jax.Array,
                 spec: AugmentSpec) -> jnp.ndarray:
    H, W = x.shape[0], x.shape[1]
    kr, krp, ka, kar, ki, kj, kf = jax.random.split(key, 7)

    # rotation angle (radians); PIL rotate is counterclockwise
    if spec.rot_p > 0:
        if spec.rot_degrees >= 45.0:
            # the two-pass shear bound is tan(theta); presets use 10 deg
            raise ValueError(
                "device-side rotation supports |degrees| < 45 "
                f"(got {spec.rot_degrees}); use the host pipeline "
                "(data.device_augment=false) for larger rotations")
        theta = jax.random.uniform(
            kr, (), minval=-spec.rot_degrees, maxval=spec.rot_degrees
        ) * (jnp.pi / 180.0)
        theta = jnp.where(jax.random.uniform(krp) < spec.rot_p, theta, 0.0)
    else:
        theta = jnp.float32(0.0)

    # crop box (i, j, bh, bw) in rotated-image coordinates
    if spec.crop_p > 0:
        i, j, bh, bw = _sample_crop_box(ka, kar, ki, kj, H, W, spec)
        if spec.crop_p < 1.0:
            crop_on = jax.random.uniform(
                jax.random.fold_in(ka, 1)) < spec.crop_p
            bh = jnp.where(crop_on, bh, H)
            bw = jnp.where(crop_on, bw, W)
            i = jnp.where(crop_on, i, 0.0)
            j = jnp.where(crop_on, j, 0.0)
    else:
        i = j = jnp.float32(0.0)
        bh, bw = jnp.float32(H), jnp.float32(W)

    flip = (jax.random.uniform(kf) < spec.flip_p) if spec.flip_p > 0 \
        else jnp.bool_(False)

    if spec.rot_p == 0 and spec.crop_p == 0 and spec.flip_p == 0:
        return x
    return _apply_affine(x, theta, i, j, bh, bw, flip,
                         rot_degrees=(spec.rot_degrees if spec.rot_p > 0
                                      else 0.0),
                         fill=spec.fill)


def _apply_affine(x: jnp.ndarray, theta, i, j, bh, bw, flip,
                  rot_degrees: float, fill: float) -> jnp.ndarray:
    """Warp with explicit (traced) parameters; rot_degrees is the STATIC
    bound on |theta| (degrees) used to size the shear pads (0 = no shear
    pass)."""
    H, W = x.shape[0], x.shape[1]
    # source-coordinate affine: output (x, y) -> source (xb, yb).
    # Crop+resize uses half-pixel centers (torchvision resize convention);
    # rotation is about the image center; horizontal flip mirrors the
    # source (flip before rotate/crop, matching the host pipeline's order
    # in dataset._augment_normalize):
    #   xr = sw*x + tx,  yr = sh*y + ty
    #   xb0 = cx + cos*(xr-cx) + sin*(yr-cy)
    #   yb  = cy - sin*(xr-cx) + cos*(yr-cy)
    #   xb  = flip ? (W-1) - xb0 : xb0
    sw, sh = bw / W, bh / H
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    tx = j + 0.5 * sw - 0.5
    ty = i + 0.5 * sh - 0.5
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    sign = jnp.where(flip, -1.0, 1.0)
    fconst = jnp.where(flip, jnp.float32(W - 1), 0.0)
    a00 = sign * cos_t * sw
    a01 = sign * sin_t * sh
    c0 = fconst + sign * (cx + cos_t * (tx - cx) + sin_t * (ty - cy))
    a10 = -sin_t * sw
    a11 = cos_t * sh
    c1 = cy - sin_t * (tx - cx) + cos_t * (ty - cy)

    # ---- pass H: T[r, xo] = img[r, e00*xo + e01*r + e0] where e01 = ±tanθ
    # (rows r are SOURCE rows here; solving y from yb=r keeps the composed
    # two-pass map exactly equal to the direct affine warp)
    a11s = jnp.where(jnp.abs(a11) < 1e-6, 1e-6, a11)
    e01 = a01 / a11s
    e00 = a00 - e01 * a10
    e0 = c0 - e01 * c1
    if rot_degrees > 0:
        # |e01| = tan(theta) <= tan(rot_degrees); shifts are centered on cy
        pad_h = int(np.ceil(np.tan(np.deg2rad(rot_degrees)) * H / 2.0)) + 2
        d = e01 * (jnp.arange(H, dtype=jnp.float32) - cy)
        s_h = _shift_rows(x, d, pad_h)
    else:
        s_h = x
    pos_x = e00 * jnp.arange(W, dtype=jnp.float32) + (e0 + e01 * cy)
    mh = _tri_matrix(pos_x, W)                       # (W_out, W_src)
    t = jnp.einsum("xs,rsc->rxc", mh, s_h)

    # ---- pass V: out[y, xo] = T[a11*y + a10*(xo-cx) + (c1 + a10*cx), xo]
    tt = jnp.swapaxes(t, 0, 1)                       # (W, H, C)
    if rot_degrees > 0:
        # |a10| = sinθ·(bw/W) <= sin(rot_degrees)
        pad_v = int(np.ceil(np.sin(np.deg2rad(rot_degrees)) * W / 2.0)) + 2
        dv = a10 * (jnp.arange(W, dtype=jnp.float32) - cx)
        s_v = _shift_rows(tt, dv, pad_v)
    else:
        s_v = tt
    pos_y = a11 * jnp.arange(H, dtype=jnp.float32) + (c1 + a10 * cx)
    mv = _tri_matrix(pos_y, H)                       # (H_out, H_src)
    out = jnp.swapaxes(jnp.einsum("ys,xsc->xyc", mv, s_v), 0, 1)

    # ---- rotation fill wherever the exact source coordinate leaves the
    # image (PIL rotate fillcolor)
    yo, xo = jnp.mgrid[0:H, 0:W]
    xb = a00 * xo + a01 * yo + c0
    yb = a10 * xo + a11 * yo + c1
    valid = ((xb > -0.5) & (xb < W - 0.5) & (yb > -0.5) & (yb < H - 0.5))
    return jnp.where(valid[..., None], out, fill)


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def augment_one(spec: AugmentSpec, key: jax.Array,
                img_u8: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (H, W, 3) float32 in [-1, 1], augmented.

    Op order matches every host preset: jitter, grayscale, blur, then the
    fused flip/rotate/crop warp."""
    x = img_u8.astype(jnp.float32) * (1.0 / 255.0)
    kj, kg, kb, kw = jax.random.split(key, 4)
    if spec.jitter_p > 0:
        x = _color_jitter(x, kj, spec.jitter_strength, spec.jitter_p)
    if spec.gray_p > 0:
        x = _grayscale(x, kg, spec.gray_p)
    if spec.blur_p > 0:
        x = _gaussian_blur(x, kb, spec.blur_p, spec.blur_sigma)
    x = _affine_warp(x, kw, spec)
    return x * 2.0 - 1.0


def augment_batch(spec: AugmentSpec, rng: jax.Array,
                  imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, H, W, 3) float32 in [-1, 1]."""
    keys = jax.random.split(rng, imgs_u8.shape[0])
    return jax.vmap(augment_one, in_axes=(None, 0, 0))(spec, keys, imgs_u8)
