#!/usr/bin/env python
"""Export LPIPS (VGG) weights from the `lpips` pip package to .npz.

Run this on a machine WITH network access + the `lpips` package (the
reference's eval dependency, reference training/inference_dtu.py:19):

    python tools/export_lpips.py --out lpips_vgg.npz

Then pass the .npz to view_neti_tpu.ops.metrics.make_lpips(weights_path=...)
on the TPU machine. Key layout: vgg/conv{i}/{kernel,bias} (HWIO) and
lin{i} heads — matching ops/metrics.py's LPIPS module.
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import lpips  # noqa — requires the pip package + torch hub weights
    model = lpips.LPIPS(net="vgg")

    out = {}
    conv_i = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 \
            + model.net.slice4 + model.net.slice5:
        import torch.nn as nn
        if isinstance(layer, nn.Conv2d):
            w = layer.weight.detach().numpy()           # OIHW
            out[f"vgg/conv{conv_i}/kernel"] = w.transpose(2, 3, 1, 0)
            out[f"vgg/conv{conv_i}/bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(model.lins):
        w = lin.model[1].weight.detach().numpy()        # (1, C, 1, 1)
        out[f"lin{i}"] = w.transpose(2, 3, 0, 1)        # (1, 1, 1, C)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {conv_i} convs + {len(model.lins)} heads")


if __name__ == "__main__":
    main()
