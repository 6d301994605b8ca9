#!/usr/bin/env python
"""Generate the ground-truth torch state-dict key inventories that
`view_neti_tpu.weight_port` mappings are verified against
(tests/test_weight_port.py).

The reference loads these exact checkpoints from the HF hub at run time
(reference training/coach.py:600-640): `runwayml/stable-diffusion-v1-5`
(UNet2DConditionModel / AutoencoderKL from diffusers, CLIPTextModel from
transformers) and `stabilityai/stable-diffusion-2-1-base`. This
environment has no egress and no diffusers package, so:

  * text encoder keys come from a LIVE offline instantiation of
    `transformers.CLIPTextModel` at the SD-1.5 (ViT-L/14: 12 layers, 768
    wide) and SD-2.1 (OpenCLIP ViT-H trunk: 23 layers, 1024 wide) configs
    — authoritative;
  * UNet / VAE keys come from a structural generator mirroring diffusers'
    `UNet2DConditionModel` / `AutoencoderKL` module trees (key NAMES are
    identical between SD-1.5 and SD-2.1 — only shapes and
    use_linear_projection change, which doesn't alter key names). The
    generator tracks in/out channels so `conv_shortcut` appears exactly
    where diffusers instantiates it, and the totals are asserted against
    the well-known tensor counts of the published checkpoints (UNet: 686,
    VAE: 248).

Output: tests/fixtures/key_inventory/{unet_sd.txt,vae_sd.txt,
text_sd15.txt,text_sd21.txt}, one key per line, sorted.
"""
import os
import sys

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "key_inventory")


def _resnet(prefix, cin, cout, time_emb=True):
    keys = [f"{prefix}.norm1.weight", f"{prefix}.norm1.bias",
            f"{prefix}.conv1.weight", f"{prefix}.conv1.bias"]
    if time_emb:
        keys += [f"{prefix}.time_emb_proj.weight",
                 f"{prefix}.time_emb_proj.bias"]
    keys += [f"{prefix}.norm2.weight", f"{prefix}.norm2.bias",
             f"{prefix}.conv2.weight", f"{prefix}.conv2.bias"]
    if cin != cout:
        keys += [f"{prefix}.conv_shortcut.weight",
                 f"{prefix}.conv_shortcut.bias"]
    return keys


def _transformer2d(prefix):
    keys = [f"{prefix}.norm.weight", f"{prefix}.norm.bias",
            f"{prefix}.proj_in.weight", f"{prefix}.proj_in.bias",
            f"{prefix}.proj_out.weight", f"{prefix}.proj_out.bias"]
    b = f"{prefix}.transformer_blocks.0"
    for a in ("attn1", "attn2"):
        keys += [f"{b}.{a}.to_q.weight", f"{b}.{a}.to_k.weight",
                 f"{b}.{a}.to_v.weight",
                 f"{b}.{a}.to_out.0.weight", f"{b}.{a}.to_out.0.bias"]
    for i in (1, 2, 3):
        keys += [f"{b}.norm{i}.weight", f"{b}.norm{i}.bias"]
    keys += [f"{b}.ff.net.0.proj.weight", f"{b}.ff.net.0.proj.bias",
             f"{b}.ff.net.2.weight", f"{b}.ff.net.2.bias"]
    return keys


def unet_keys(block_out=(320, 640, 1280, 1280), layers_per_block=2):
    keys = ["conv_in.weight", "conv_in.bias",
            "time_embedding.linear_1.weight", "time_embedding.linear_1.bias",
            "time_embedding.linear_2.weight", "time_embedding.linear_2.bias"]
    n = len(block_out)
    cout = block_out[0]
    skip_channels = [cout]           # conv_in output feeds the first skip
    for i, ch in enumerate(block_out):
        has_attn = i < n - 1         # CrossAttnDownBlock2D x3 + DownBlock2D
        for j in range(layers_per_block):
            cin, cout = cout, ch
            keys += _resnet(f"down_blocks.{i}.resnets.{j}", cin, cout)
            if has_attn:
                keys += _transformer2d(f"down_blocks.{i}.attentions.{j}")
            skip_channels.append(cout)
        if i < n - 1:
            keys += [f"down_blocks.{i}.downsamplers.0.conv.weight",
                     f"down_blocks.{i}.downsamplers.0.conv.bias"]
            skip_channels.append(cout)
    keys += _resnet("mid_block.resnets.0", cout, cout)
    keys += _transformer2d("mid_block.attentions.0")
    keys += _resnet("mid_block.resnets.1", cout, cout)
    rev = list(reversed(block_out))
    for i, ch in enumerate(rev):
        has_attn = i > 0             # UpBlock2D + CrossAttnUpBlock2D x3
        for j in range(layers_per_block + 1):
            skip = skip_channels.pop()
            cin, cout = cout + skip, ch
            keys += _resnet(f"up_blocks.{i}.resnets.{j}", cin, cout)
            if has_attn:
                keys += _transformer2d(f"up_blocks.{i}.attentions.{j}")
        if i < n - 1:
            keys += [f"up_blocks.{i}.upsamplers.0.conv.weight",
                     f"up_blocks.{i}.upsamplers.0.conv.bias"]
    keys += ["conv_norm_out.weight", "conv_norm_out.bias",
             "conv_out.weight", "conv_out.bias"]
    return keys


def _vae_attn(prefix):
    keys = [f"{prefix}.group_norm.weight", f"{prefix}.group_norm.bias"]
    for p in ("to_q", "to_k", "to_v", "to_out.0"):
        keys += [f"{prefix}.{p}.weight", f"{prefix}.{p}.bias"]
    return keys


def vae_keys(block_out=(128, 256, 512, 512), layers_per_block=2):
    n = len(block_out)
    keys = ["encoder.conv_in.weight", "encoder.conv_in.bias"]
    cout = block_out[0]
    for i, ch in enumerate(block_out):
        for j in range(layers_per_block):
            cin, cout = cout, ch
            keys += _resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                            cin, cout, time_emb=False)
        if i < n - 1:
            keys += [f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                     f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]
    keys += _resnet("encoder.mid_block.resnets.0", cout, cout,
                    time_emb=False)
    keys += _vae_attn("encoder.mid_block.attentions.0")
    keys += _resnet("encoder.mid_block.resnets.1", cout, cout,
                    time_emb=False)
    keys += ["encoder.conv_norm_out.weight", "encoder.conv_norm_out.bias",
             "encoder.conv_out.weight", "encoder.conv_out.bias",
             "quant_conv.weight", "quant_conv.bias"]

    keys += ["post_quant_conv.weight", "post_quant_conv.bias",
             "decoder.conv_in.weight", "decoder.conv_in.bias"]
    cout = block_out[-1]
    keys += _resnet("decoder.mid_block.resnets.0", cout, cout,
                    time_emb=False)
    keys += _vae_attn("decoder.mid_block.attentions.0")
    keys += _resnet("decoder.mid_block.resnets.1", cout, cout,
                    time_emb=False)
    for i, ch in enumerate(reversed(block_out)):
        for j in range(layers_per_block + 1):
            cin, cout = cout, ch
            keys += _resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                            cin, cout, time_emb=False)
        if i < n - 1:
            keys += [f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                     f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]
    keys += ["decoder.conv_norm_out.weight", "decoder.conv_norm_out.bias",
             "decoder.conv_out.weight", "decoder.conv_out.bias"]
    return keys


def text_keys(num_layers, hidden):
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=hidden,
        intermediate_size=hidden * 4, num_hidden_layers=num_layers,
        num_attention_heads=hidden // 64, max_position_embeddings=77)
    model = CLIPTextModel(cfg)
    return list(model.state_dict().keys())


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    unet = unet_keys()
    vae = vae_keys()
    assert len(unet) == 686, f"UNet key count {len(unet)} != 686 " \
        "(published SD-1.5/2.1 UNet tensor count)"
    assert len(vae) == 248, f"VAE key count {len(vae)} != 248 " \
        "(published SD VAE tensor count)"
    inv = {"unet_sd.txt": unet, "vae_sd.txt": vae,
           "text_sd15.txt": text_keys(12, 768),
           "text_sd21.txt": text_keys(23, 1024)}
    for name, keys in inv.items():
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            f.write("\n".join(sorted(keys)) + "\n")
        print(f"wrote {path}: {len(keys)} keys", file=sys.stderr)


if __name__ == "__main__":
    main()
