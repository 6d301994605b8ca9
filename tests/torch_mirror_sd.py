"""Independent torch mirrors of diffusers' UNet2DConditionModel /
AutoencoderKL (test helper for tests/test_unet_vae_torch_golden.py).

Written FROM the published diffusers module semantics — NCHW, the exact
state_dict key names of the real SD checkpoints (down_blocks.N.resnets.M,
transformer_blocks.0.attn1.to_q, ff.net.0.proj, downsamplers.0.conv,
quant_conv, ...) — NOT from this repo's Flax code, so agreement between
the two implementations through weight_port is meaningful evidence that
(a) the Flax architecture reproduces diffusers' compute and (b) the
torch->Flax weight transforms are correct. diffusers itself is not
installed in this image; the reference loads these exact module classes
from the HF hub at run time (reference training/coach.py:600-640).
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_timestep_embedding(timesteps, dim, flip_sin_to_cos=True,
                           downscale_freq_shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    sin, cos = torch.sin(args), torch.cos(args)
    if flip_sin_to_cos:
        return torch.cat([cos, sin], dim=-1)
    return torch.cat([sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=4, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """diffusers Attention (cross/self), bias-free qkv, to_out ModuleList."""

    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        ctx_dim = ctx_dim if ctx_dim is not None else dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        # ctx may be a (k_source, v_source) pair: the reference's
        # XTIAttenProc feeds K from the regular context and V from the
        # bypass context (reference models/xti_attention_processor.py:38-42)
        if isinstance(ctx, (tuple, list)):
            k_src, v_src = ctx
        else:
            k_src = v_src = x if ctx is None else ctx
        B, L, C = x.shape
        H = self.heads
        hd = C // H
        q = self.to_q(x).view(B, L, H, hd).transpose(1, 2)
        k = self.to_k(k_src).view(B, k_src.shape[1], H, hd).transpose(1, 2)
        v = self.to_v(v_src).view(B, v_src.shape[1], H, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, L, C)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, dim * 4), nn.Identity(),
                                  nn.Linear(dim * 4, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.attn1 = Attention(dim, heads)
        self.attn2 = Attention(dim, heads, ctx_dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, dim, heads, ctx_dim, groups=4):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, heads, ctx_dim)])
        self.proj_out = nn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, ctx)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class _Downsampler(nn.Module):
    def __init__(self, ch, padding=1):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=padding)


class _Upsampler(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)


class _Block(nn.Module):
    pass


class MirrorUNet(nn.Module):
    """4-block SD UNet with exact diffusers key names; contexts is a list
    of 16 (B, L, D) tensors consumed in forward invocation order."""

    def __init__(self, block_out=(8, 16, 16, 16), layers_per_block=2,
                 ctx_dim=8, heads=2, groups=4, in_ch=4):
        super().__init__()
        ch0 = block_out[0]
        temb_dim = ch0 * 4
        self.conv_in = nn.Conv2d(in_ch, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim)
        n = len(block_out)
        skip_channels = [ch0]
        self.down_blocks = nn.ModuleList()
        cout = ch0
        for i, ch in enumerate(block_out):
            blk = _Block()
            has_attn = i < n - 1
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for j in range(layers_per_block):
                cin, cout = cout, ch
                resnets.append(ResnetBlock2D(cin, cout, temb_dim, groups))
                if has_attn:
                    attns.append(Transformer2DModel(cout, heads, ctx_dim,
                                                    groups))
                skip_channels.append(cout)
            blk.resnets = resnets
            if has_attn:
                blk.attentions = attns
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([_Downsampler(cout)])
                skip_channels.append(cout)
            self.down_blocks.append(blk)
        mid = _Block()
        mid.resnets = nn.ModuleList([
            ResnetBlock2D(cout, cout, temb_dim, groups),
            ResnetBlock2D(cout, cout, temb_dim, groups)])
        mid.attentions = nn.ModuleList(
            [Transformer2DModel(cout, heads, ctx_dim, groups)])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        for i, ch in enumerate(reversed(block_out)):
            blk = _Block()
            has_attn = i > 0
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for j in range(layers_per_block + 1):
                skip = skip_channels.pop()
                cin, cout = cout + skip, ch
                resnets.append(ResnetBlock2D(cin, cout, temb_dim, groups))
                if has_attn:
                    attns.append(Transformer2DModel(cout, heads, ctx_dim,
                                                    groups))
            blk.resnets = resnets
            if has_attn:
                blk.attentions = attns
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([_Upsampler(cout)])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv_out = nn.Conv2d(cout, in_ch, 3, padding=1)

    def forward(self, x, t, contexts):
        contexts = list(contexts)
        temb = self.time_embedding(
            get_timestep_embedding(t, self.conv_in.out_channels))
        x = self.conv_in(x)
        skips = [x]
        for blk in self.down_blocks:
            attns = getattr(blk, "attentions", None)
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if attns is not None:
                    x = attns[j](x, contexts.pop(0))
                skips.append(x)
            if getattr(blk, "downsamplers", None) is not None:
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, contexts.pop(0))
        x = self.mid_block.resnets[1](x, temb)
        for blk in self.up_blocks:
            attns = getattr(blk, "attentions", None)
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if attns is not None:
                    x = attns[j](x, contexts.pop(0))
            if getattr(blk, "upsamplers", None) is not None:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        assert not contexts
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VAEAttention(nn.Module):
    """diffusers AutoencoderKL bottleneck attention (single head, biased
    projections, modern to_q/to_k/to_v/to_out naming)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
        h = self.to_out[0](attn @ v)
        return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class _VAEResnet(ResnetBlock2D):
    def __init__(self, cin, cout, groups):
        super().__init__(cin, cout, temb_dim=None, groups=groups, eps=1e-6)


class MirrorEncoder(nn.Module):
    def __init__(self, block_out, layers_per_block, in_ch, latent_ch,
                 groups):
        super().__init__()
        n = len(block_out)
        self.conv_in = nn.Conv2d(in_ch, block_out[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cout = block_out[0]
        for i, ch in enumerate(block_out):
            blk = _Block()
            resnets = nn.ModuleList()
            for j in range(layers_per_block):
                cin, cout = cout, ch
                resnets.append(_VAEResnet(cin, cout, groups))
            blk.resnets = resnets
            if i < n - 1:
                # SD VAE downsample: asymmetric (0,1,0,1) pad + VALID conv
                blk.downsamplers = nn.ModuleList(
                    [_Downsampler(cout, padding=0)])
            self.down_blocks.append(blk)
        mid = _Block()
        mid.resnets = nn.ModuleList([_VAEResnet(cout, cout, groups),
                                     _VAEResnet(cout, cout, groups)])
        mid.attentions = nn.ModuleList([VAEAttention(cout, groups)])
        self.mid_block = mid
        self.conv_norm_out = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv_out = nn.Conv2d(cout, 2 * latent_ch, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if getattr(blk, "downsamplers", None) is not None:
                x = F.pad(x, (0, 1, 0, 1))
                x = blk.downsamplers[0].conv(x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class MirrorDecoder(nn.Module):
    def __init__(self, block_out, layers_per_block, out_ch, latent_ch,
                 groups):
        super().__init__()
        n = len(block_out)
        cout = block_out[-1]
        self.conv_in = nn.Conv2d(latent_ch, cout, 3, padding=1)
        mid = _Block()
        mid.resnets = nn.ModuleList([_VAEResnet(cout, cout, groups),
                                     _VAEResnet(cout, cout, groups)])
        mid.attentions = nn.ModuleList([VAEAttention(cout, groups)])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        for i, ch in enumerate(reversed(block_out)):
            blk = _Block()
            resnets = nn.ModuleList()
            for j in range(layers_per_block + 1):
                cin, cout = cout, ch
                resnets.append(_VAEResnet(cin, cout, groups))
            blk.resnets = resnets
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([_Upsampler(cout)])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv_out = nn.Conv2d(cout, out_ch, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if getattr(blk, "upsamplers", None) is not None:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class MirrorVAE(nn.Module):
    def __init__(self, block_out=(8, 16, 32, 32), layers_per_block=2,
                 in_ch=3, latent_ch=4, groups=4):
        super().__init__()
        self.encoder = MirrorEncoder(block_out, layers_per_block, in_ch,
                                     latent_ch, groups)
        self.decoder = MirrorDecoder(block_out, layers_per_block, in_ch,
                                     latent_ch, groups)
        self.quant_conv = nn.Conv2d(2 * latent_ch, 2 * latent_ch, 1)
        self.post_quant_conv = nn.Conv2d(latent_ch, latent_ch, 1)

    def moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
