"""Flax AutoencoderKL (Stable Diffusion VAE), NHWC layout.

Architecture parity with the frozen `AutoencoderKL` the reference loads
(reference training/coach.py:628-633): 128-base channels, multipliers
(1, 2, 4, 4), 2 resnet blocks per level, single-head attention at the
bottleneck, 4-channel diagonal-Gaussian latent, scaling factor 0.18215.
TPU-first: NHWC tensors (XLA's native conv layout), bf16-friendly compute
dtype with fp32 GroupNorm statistics.

Used frozen: encode() for training (reference coach.py:167-169), decode()
for inference (reference sd_pipeline_call.py:113-119).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SD_VAE_SCALING = 0.18215


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    scaling_factor: float = SD_VAE_SCALING
    # Fuse norm+silu+conv3x3 sections into one Pallas kernel
    # (ops/fused_conv.py). Forward-only: safe for the frozen VAE in BOTH
    # training (train_step stop_gradients the encode) and inference.
    # Param tree is identical either way.
    fuse_conv: bool = False


def tiny_vae_config() -> VAEConfig:
    """Small config for tests."""
    return VAEConfig(base_channels=16, channel_mults=(1, 2), norm_groups=4)


class GroupNorm(nn.Module):
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold: bool = False):
        # fp32 statistics regardless of compute dtype; fused normalize pass
        # (ops/norm.py) — param tree identical to an anonymous nn.GroupNorm
        from view_neti_tpu.ops.norm import group_norm
        return group_norm(self.groups, 1e-6, self.dtype)(x, fold)


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    fuse: bool = False

    @nn.compact
    def __call__(self, x):
        from view_neti_tpu.ops import fused_conv
        norm1 = GroupNorm(self.norm_groups, self.dtype, name="norm1")
        norm2 = GroupNorm(self.norm_groups, self.dtype, name="norm2")
        # Per-conv gating on each conv's OWN input shape: conv2 reads the
        # (B, H, W, Cout) activation, so in channel-changing blocks (the
        # encoder 128->256 / 256->512 levels) the two convs can land on
        # different sides of the measured profitability policy.
        co = self.out_channels
        shape2 = (x.shape[0], x.shape[1], x.shape[2], co)
        fuse1 = self.fuse and fused_conv.fusable(x.shape, co, self.dtype)
        fuse2 = self.fuse and fused_conv.fusable(shape2, co, self.dtype,
                                                 has_residual=True)
        if fuse1:
            a1, b1 = norm1(x, fold=True)
            k1, c1 = fused_conv.Conv3x3Params(co, name="conv1")(x.shape[-1])
            h = fused_conv.fused_affine_silu_conv3x3(
                x, a1, b1, k1.astype(self.dtype), c1.astype(self.dtype),
                out_dtype=self.dtype)
        else:
            h = norm1(x)
            h = nn.silu(h)
            h = nn.Conv(co, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
        if fuse2:
            a2, b2 = norm2(h, fold=True)
            k2, c2 = fused_conv.Conv3x3Params(co, name="conv2")(h.shape[-1])
            if x.shape[-1] != co:
                x = nn.Conv(co, (1, 1), dtype=self.dtype,
                            name="shortcut")(x)
            return fused_conv.fused_affine_silu_conv3x3(
                h, a2, b2, k2.astype(self.dtype), c2.astype(self.dtype),
                residual=x, out_dtype=self.dtype)
        h = norm2(h)
        h = nn.silu(h)
        h = nn.Conv(co, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != co:
            x = nn.Conv(co, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from view_neti_tpu.ops.attention import single_head_attention
        B, H, W, C = x.shape
        h = GroupNorm(self.norm_groups, self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        # q-chunked exact attention: at 768x576 decode resolution L=6912
        # and full (B, L, L) fp32 logits are ~570 MB/image
        h = single_head_attention(q, k, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ch = cfg.base_channels
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, mult in enumerate(cfg.channel_mults):
            out_ch = ch * mult
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, cfg.norm_groups, self.dtype,
                                cfg.fuse_conv,
                                name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.channel_mults) - 1:
                # asymmetric (0,1) pad + stride-2 conv (SD convention)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        mid_ch = ch * cfg.channel_mults[-1]
        h = ResnetBlock(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                        name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                        name="mid_block_2")(h)
        norm_out = GroupNorm(cfg.norm_groups, self.dtype, name="norm_out")
        from view_neti_tpu.ops import fused_conv
        mo_ch = 2 * cfg.latent_channels
        if cfg.fuse_conv and fused_conv.fusable(h.shape, mo_ch, self.dtype):
            a, b = norm_out(h, fold=True)
            k, c = fused_conv.Conv3x3Params(mo_ch, name="conv_out")(
                h.shape[-1])
            h = fused_conv.fused_affine_silu_conv3x3(
                h, a, b, k.astype(self.dtype), c.astype(self.dtype),
                out_dtype=self.dtype)
        else:
            h = norm_out(h)
            h = nn.silu(h)
            h = nn.Conv(mo_ch, (3, 3), padding=1,
                        dtype=self.dtype, name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="quant_conv")(h)
        return h  # moments: mean | logvar


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.base_channels
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        mid_ch = ch * cfg.channel_mults[-1]
        h = nn.Conv(mid_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                        name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                        name="mid_block_2")(h)
        for i, mult in enumerate(reversed(cfg.channel_mults)):
            out_ch = ch * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(out_ch, cfg.norm_groups, self.dtype,
                                cfg.fuse_conv,
                                name=f"up_{i}_block_{j}")(h)
            if i != len(cfg.channel_mults) - 1:
                from view_neti_tpu.ops.resize import nearest_upsample_2x
                h = nearest_upsample_2x(h)
                h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        from view_neti_tpu.ops import fused_conv
        norm_out = GroupNorm(cfg.norm_groups, self.dtype, name="norm_out")
        if cfg.fuse_conv and fused_conv.fusable(h.shape, cfg.in_channels,
                                                self.dtype):
            a, b = norm_out(h, fold=True)
            k, c = fused_conv.Conv3x3Params(cfg.in_channels,
                                            name="conv_out")(h.shape[-1])
            return fused_conv.fused_affine_silu_conv3x3(
                h, a, b, k.astype(self.dtype), c.astype(self.dtype),
                out_dtype=self.dtype)
        h = norm_out(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)

    def __call__(self, x, rng):
        """Full roundtrip (used for init)."""
        z = self.encode_sample(x, rng)
        return self.decode(z)

    def moments(self, x):
        return self.encoder(x)

    def encode_sample(self, x, rng):
        """Sample z ~ q(z|x), scaled by the SD scaling factor.

        reference coach.py:167-169: vae.encode(...).latent_dist.sample()
        * scaling_factor. logvar clamped to [-30, 20] (diffusers'
        DiagonalGaussianDistribution convention).
        """
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return (mean + std * eps) * self.config.scaling_factor

    def encode_mode(self, x):
        """Deterministic posterior mode, scaled."""
        moments = self.encoder(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return mean * self.config.scaling_factor

    def decode(self, z):
        """Decode scaled latents back to image space [-1, 1]."""
        return self.decoder(z / self.config.scaling_factor)
