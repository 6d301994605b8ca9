#!/usr/bin/env python
"""Standalone timing of VAE-encoder pieces at bench shapes to localize the
100 ms (B=9, 384x512, bf16)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compile"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from view_neti_tpu.models.vae import AttnBlock, ResnetBlock

B = 9
DT = jnp.bfloat16


def bench_module(name, mod, shape, n=20):
    """Chained timing: each iteration consumes the previous output (scaled
    back to the input shape via a cheap reduce) so the tunneled runtime
    cannot memoize identical executions."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B,) + shape, DT)
    vs = mod.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def f(v, x, eps):
        y = mod.apply(v, x + eps)
        return y, jnp.mean(y.astype(jnp.float32)) * 1e-20

    y, eps = f(vs, x, jnp.float32(0))
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(n):
        y, eps = f(vs, x, eps)
    jax.block_until_ready(y)
    print(f"{name:34s} {(time.time() - t0) / n * 1000:8.2f} ms", flush=True)


class Down(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.ch, (3, 3), strides=2, padding="VALID",
                       dtype=DT)(x)


def main():
    # level 0: 2 resnet blocks @ 384x512x128
    bench_module("L0 resblock x2 (384x512x128)",
                 nn.Sequential([ResnetBlock(128, 32, DT),
                                ResnetBlock(128, 32, DT)]), (384, 512, 128))
    bench_module("L0 downsample (384x512x128)", Down(128), (384, 512, 128))
    bench_module("L1 resblock x2 (192x256x256)",
                 nn.Sequential([ResnetBlock(256, 32, DT),
                                ResnetBlock(256, 32, DT)]), (192, 256, 256))
    bench_module("L1 in-conv 128->256",
                 ResnetBlock(256, 32, DT), (192, 256, 128))
    bench_module("L2 resblock x2 (96x128x512)",
                 nn.Sequential([ResnetBlock(512, 32, DT),
                                ResnetBlock(512, 32, DT)]), (96, 128, 512))
    bench_module("L3+mid resblock x4 (48x64x512)",
                 nn.Sequential([ResnetBlock(512, 32, DT)] * 4), (48, 64, 512))
    bench_module("mid attn (48x64x512)", AttnBlock(32, DT), (48, 64, 512))
    # first conv 3->128
    bench_module("conv_in 3->128 (384x512)",
                 nn.Conv(128, (3, 3), padding=1, dtype=DT), (384, 512, 3))


if __name__ == "__main__":
    main()
