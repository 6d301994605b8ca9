#!/usr/bin/env python
"""Download + lay out Stable Diffusion assets for the TPU machine.

Run on a machine WITH network access:

    python tools/export_sd_assets.py \
        --model runwayml/stable-diffusion-v1-5 --out sd15_assets/

Produces a diffusers-layout directory consumable by the TPU framework:
    sd15_assets/unet/diffusion_pytorch_model.safetensors
    sd15_assets/vae/diffusion_pytorch_model.safetensors
    sd15_assets/text_encoder/model.safetensors
    sd15_assets/tokenizer/{vocab.json,merges.txt}

On the TPU machine:
    SD_WEIGHTS_DIR=sd15_assets python scripts/train.py ... \
        --data.tokenizer_path sd15_assets/tokenizer

Also exports the reference's torch-seeded Fourier frequency matrices for
seed-parity runs (SURVEY.md §7.3.3): --export-fourier-seeds writes
fourier_w_seed{N}.npy files loadable via
models.positional_encoding.load_torch_fourier_freqs /
NeTIMapper(fourier_freqs_override=...).
"""
import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="runwayml/stable-diffusion-v1-5")
    ap.add_argument("--out", type=Path, default=Path("sd_assets"))
    ap.add_argument("--export-fourier-seeds", type=int, nargs="*",
                    default=[0])
    ap.add_argument("--fourier-dim", type=int, default=64)
    ap.add_argument("--fourier-nfeats", type=int, default=14)
    args = ap.parse_args()

    from huggingface_hub import snapshot_download
    snapshot_download(
        args.model, local_dir=args.out,
        allow_patterns=["unet/*", "vae/*", "text_encoder/*", "tokenizer/*",
                        "scheduler/*", "*.json"])
    print(f"downloaded {args.model} -> {args.out}")

    import numpy as np
    import torch
    for seed in args.export_fourier_seeds:
        torch.manual_seed(seed)
        w = torch.randn((args.fourier_dim // 2, args.fourier_nfeats))
        np.save(args.out / f"fourier_w_seed{seed}.npy", w.numpy())
        print(f"exported torch-seeded fourier freqs seed={seed} "
              f"(unscaled; multiply by per-dim sigmas at load)")


if __name__ == "__main__":
    main()
