#!/usr/bin/env python
"""Microbenchmark the on-device augmentation ops at bench shapes (B=9,
384x512) to find where the ~50 ms/step goes."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compile"))

from view_neti_tpu.ops import device_augment as da

B, H, W = 9, 384, 512
imgs = jnp.asarray(np.random.randint(0, 256, (B, H, W, 3), np.uint8))
key = jax.random.PRNGKey(0)

full = da.from_augmentation_key(7)
variants = {
    "full-preset7": full,
    "jitter-only": dataclasses.replace(full, blur_p=0, rot_p=0, crop_p=0),
    "blur-only": dataclasses.replace(full, jitter_p=0, rot_p=0, crop_p=0),
    "warp-only": dataclasses.replace(full, jitter_p=0, blur_p=0),
    "crop-only": dataclasses.replace(full, jitter_p=0, blur_p=0, rot_p=0),
    "identity": da.AugmentSpec(),
}

for name, spec in variants.items():
    f = jax.jit(lambda k, x, s=spec: da.augment_batch(s, k, x))
    out = f(key, imgs)
    jax.block_until_ready(out)
    n = 20
    t0 = time.time()
    for i in range(n):
        out = f(jax.random.fold_in(key, i), imgs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:16s} {dt:7.2f} ms")
