"""Flax UNet2DCondition (Stable Diffusion UNet) with XTI per-layer contexts.

Architecture parity with the frozen `UNet2DConditionModel` the reference
loads (reference training/coach.py:635-640): 4-ch latents, block channels
(320, 640, 1280, 1280), 2 resnet layers per block, 16 cross-attention layers.

TPU-first redesign of the XTI conditioning contract: the reference installs a
mutable attention processor whose correctness depends on a Python counter
incrementing across exactly 16 cross-attention calls (reference
models/xti_attention_processor.py:9-22). Here every cross-attention block
carries a *static* layer index into a stacked (16, B, 77, D) context tensor
(+ a parallel bypass stack used as the V-source only — reference
xti_attention_processor.py:38-42). The mapping from static index to layer
name is constants.UNET_LAYERS; invocation order equals index order.

Layout: NHWC; attention runs through ops/attention.py (Pallas flash kernel
on TPU). Compute dtype configurable (bf16 on TPU); GroupNorm stats fp32.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from view_neti_tpu.ops.attention import multi_head_attention


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # SD1.x fixes the head COUNT (8); SD2.x fixes the head DIM (64).
    num_attention_heads: Optional[int] = 8
    attention_head_dim: Optional[int] = None
    norm_groups: int = 32
    use_linear_projection: bool = False    # True for SD2.x
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    gradient_checkpointing: bool = False
    use_flash_attention: bool = True
    # Fuse norm+silu+conv3x3 (+temb/residual) sections into one Pallas
    # kernel (ops/fused_conv.py). FORWARD-ONLY — enable solely for
    # inference-built UNets (the denoise loop never differentiates);
    # training UNets must keep this False (grads flow through the UNet
    # to the text conditioning). Param tree is identical either way.
    fuse_conv: bool = False

    def heads_for(self, channels: int) -> int:
        if self.attention_head_dim is not None:
            return channels // self.attention_head_dim
        return self.num_attention_heads


def sd15_unet_config(**overrides) -> UNetConfig:
    return UNetConfig(**overrides)


def sd21_unet_config(**overrides) -> UNetConfig:
    base = dict(cross_attention_dim=1024, num_attention_heads=None,
                attention_head_dim=64, use_linear_projection=True)
    base.update(overrides)
    return UNetConfig(**base)


def tiny_unet_config(**overrides) -> UNetConfig:
    """16 cross-attn layers preserved, tiny channels — for tests."""
    base = dict(block_out_channels=(32, 64, 64, 64), cross_attention_dim=32,
                num_attention_heads=2, norm_groups=8)
    base.update(overrides)
    return UNetConfig(**base)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep features, diffusers get_timestep_embedding parity."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


class GroupNorm(nn.Module):
    groups: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold: bool = False):
        # fp32 statistics, fused normalize pass (ops/norm.py) — param tree
        # identical to an anonymous nn.GroupNorm
        from view_neti_tpu.ops.norm import group_norm
        return group_norm(self.groups, self.eps, self.dtype)(x, fold)


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32
    fuse: bool = False

    @nn.compact
    def __call__(self, x, temb):
        from view_neti_tpu.ops import fused_conv
        norm1 = GroupNorm(self.norm_groups, dtype=self.dtype, name="norm1")
        norm2 = GroupNorm(self.norm_groups, dtype=self.dtype, name="norm2")
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        # Each conv gates INDEPENDENTLY on its own input shape: conv2 reads
        # the (B, H, W, Cout) activation, which differs from conv1's input
        # whenever the block changes channel count (e.g. the 640->1280 down
        # block — fusing conv2 there is the measured-LOSS >=1280ch regime).
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
                add_bc=t, out_dtype=self.dtype)
        else:
            h = norm1(x)
            h = nn.silu(h)
            h = nn.Conv(co, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
            h = h + t[:, None, None, :]
        if fuse2:
            a2, b2 = norm2(h, fold=True)
            k2, c2 = fused_conv.Conv3x3Params(co, name="conv2")(h.shape[-1])
            if x.shape[-1] != co:
                x = nn.Conv(co, (1, 1), dtype=self.dtype,
                            name="conv_shortcut")(x)
            return fused_conv.fused_affine_silu_conv3x3(
                h, a2, b2, k2.astype(self.dtype), c2.astype(self.dtype),
                residual=x, out_dtype=self.dtype)
        h = norm2(h)
        h = nn.silu(h)
        h = nn.Conv(co, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != co:
            x = nn.Conv(co, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """QKV attention; separate K-source and V-source tensors.

    For self-attention pass ctx_k = ctx_v = None (uses hidden states).
    For XTI cross-attention, ctx_k is the regular context and ctx_v the
    bypass context (reference xti_attention_processor.py:38-42: K from
    CONTEXT_TENSOR_i, V from CONTEXT_TENSOR_BYPASS_i).
    """
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, ctx_k=None, ctx_v=None):
        B, L, C = x.shape
        H = self.num_heads
        hd = C // H
        src_k = x if ctx_k is None else ctx_k.astype(self.dtype)
        src_v = src_k if ctx_v is None else ctx_v.astype(self.dtype)
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")(src_k)
        v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")(src_v)
        q = q.reshape(B, L, H, hd)
        k = k.reshape(B, k.shape[1], H, hd)
        v = v.reshape(B, v.shape[1], H, hd)
        out = multi_head_attention(q, k, v, use_flash=self.use_flash)
        out = out.reshape(B, L, C)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, ctx_k, ctx_v):
        C = x.shape[-1]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        x = x + CrossAttention(self.num_heads, self.dtype, self.use_flash,
                               name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(self.num_heads, self.dtype, self.use_flash,
                               name="attn2")(ln("norm2")(x), ctx_k, ctx_v)
        h = ln("norm3")(x)
        h = GEGLU(C * 4, dtype=self.dtype, name="ff_geglu")(h)
        h = nn.Dense(C, dtype=self.dtype, name="ff_out")(h)
        return x + h


class Transformer2D(nn.Module):
    """Spatial transformer wrapping one BasicTransformerBlock.

    xti_index is the static index into the stacked (16, B, 77, D) context.
    """
    num_heads: int
    xti_index: int
    norm_groups: int
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, context, context_bypass):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm(self.norm_groups, eps=1e-6, dtype=self.dtype,
                      name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, C)
        ctx_k = context[self.xti_index]
        ctx_v = context_bypass[self.xti_index]
        h = BasicTransformerBlock(self.num_heads, self.dtype, self.use_flash,
                                  name="block")(h, ctx_k, ctx_v)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class UNet2DCondition(nn.Module):
    """The SD UNet. __call__(latents, timesteps, context, context_bypass).

    latents: (B, H, W, 4) NHWC; timesteps: (B,);
    context / context_bypass: (16, B, 77, ctx_dim) stacked per-layer
    conditioning (pass the same array twice when no bypass is used).
    Returns the predicted noise/velocity, (B, H, W, 4).
    """
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, context, context_bypass=None):
        cfg = self.config
        if context.ndim == 3:  # (B, L, D) -> broadcast over the 16 layers
            context = jnp.broadcast_to(
                context[None], (16,) + context.shape)
        if context_bypass is None:
            context_bypass = context

        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        temb = timestep_embedding(timesteps, ch0, cfg.flip_sin_to_cos,
                                  cfg.freq_shift)
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc1")(
            temb.astype(self.dtype))
        temb = nn.Dense(temb_dim, dtype=self.dtype, name="time_fc2")(
            nn.silu(temb))

        res_block = (nn.remat(ResnetBlock) if cfg.gradient_checkpointing
                     else ResnetBlock)

        def make_attn(channels, xti_idx, name):
            return Transformer2D(
                num_heads=cfg.heads_for(channels), xti_index=xti_idx,
                norm_groups=cfg.norm_groups,
                use_linear_projection=cfg.use_linear_projection,
                dtype=self.dtype, use_flash=cfg.use_flash_attention,
                name=name)

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(latents.astype(self.dtype))

        num_blocks = len(cfg.block_out_channels)
        xti = 0
        skips = [x]
        # ---- down path: cross-attn blocks except the last -----------------
        for i, out_ch in enumerate(cfg.block_out_channels):
            has_attn = i < num_blocks - 1
            for j in range(cfg.layers_per_block):
                x = res_block(out_ch, cfg.norm_groups, self.dtype,
                              cfg.fuse_conv,
                              name=f"down_{i}_res_{j}")(x, temb)
                if has_attn:
                    x = make_attn(out_ch, xti, f"down_{i}_attn_{j}")(
                        x, context, context_bypass)
                    xti += 1
                skips.append(x)
            if i < num_blocks - 1:
                x = nn.Conv(out_ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid ----------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        x = res_block(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                      name="mid_res_0")(x, temb)
        x = make_attn(mid_ch, xti, "mid_attn")(x, context, context_bypass)
        xti += 1
        x = res_block(mid_ch, cfg.norm_groups, self.dtype, cfg.fuse_conv,
                      name="mid_res_1")(x, temb)

        # ---- up path: cross-attn blocks except the first ------------------
        for i, out_ch in enumerate(reversed(cfg.block_out_channels)):
            has_attn = i > 0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = res_block(out_ch, cfg.norm_groups, self.dtype,
                              cfg.fuse_conv,
                              name=f"up_{i}_res_{j}")(x, temb)
                if has_attn:
                    x = make_attn(out_ch, xti, f"up_{i}_attn_{j}")(
                        x, context, context_bypass)
                    xti += 1
            if i < num_blocks - 1:
                from view_neti_tpu.ops.resize import nearest_upsample_2x
                x = nearest_upsample_2x(x)
                x = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)

        assert xti == 16, f"XTI layer count {xti} != 16"
        x = GroupNorm(cfg.norm_groups, dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(x)
        return x
