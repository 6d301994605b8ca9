#!/usr/bin/env python
"""Measure the fused GN+SiLU+conv3x3 Pallas kernel (ops/fused_conv.py)
against the unfused flax ResnetBlock at the hot UNet/VAE shapes.

VERDICT r4 item 2: the step profile put conv sections at ~50 TFLOP/s vs
the 67-76 measured ceiling; this tool decides whether the fused kernel
closes that gap (standalone, before the end-to-end bench re-measures).

Chained timing (tunnel memoizes identical executions; see
tools/profile_vae.py): each iteration perturbs the input with a scalar
derived from the previous output, and the loop ends with a SCALAR fetch
(block_until_ready alone does not wait for remote completion).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compile"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def bench(name, fn, vs, x, flops, n=20):
    @jax.jit
    def f(v, x, eps):
        y = fn(v, x + eps)
        return y, jnp.mean(y.astype(jnp.float32)) * 1e-20

    y, eps = f(vs, x, jnp.float32(0))
    float(eps)  # force remote completion
    t0 = time.time()
    for _ in range(n):
        y, eps = f(vs, x, eps)
    val = float(eps)  # scalar fetch = remote sync
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt * 1000:8.2f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)
    assert val == val  # not NaN


def site(tag, block_cls, B, H, W, Cin, Cout, unet=False):
    import dataclasses  # noqa: F401
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, Cin), DT)
    # 2 conv3x3 per block (+1x1 shortcut if Cin!=Cout, excluded from flops)
    flops = 2 * 9 * B * H * W * Cin * Cout + 2 * 9 * B * H * W * Cout * Cout

    if unet:
        temb = jax.random.normal(jax.random.PRNGKey(2), (B, 1280), DT)
        for fuse in (False, True):
            mod = block_cls(Cout, 32, DT, fuse)
            vs = mod.init(jax.random.PRNGKey(1), x, temb)
            bench(f"{tag} fuse={int(fuse)} ({B}x{H}x{W}x{Cin}->{Cout})",
                  lambda v, xx, m=mod: m.apply(v, xx, temb), vs, x, flops)
    else:
        for fuse in (False, True):
            mod = block_cls(Cout, 32, DT, fuse)
            vs = mod.init(jax.random.PRNGKey(1), x)
            bench(f"{tag} fuse={int(fuse)} ({B}x{H}x{W}x{Cin}->{Cout})",
                  lambda v, xx, m=mod: m.apply(v, xx), vs, x, flops)


def main():
    from view_neti_tpu.models.vae import ResnetBlock as VaeBlock
    from view_neti_tpu.models.unet import ResnetBlock as UnetBlock

    # argv[1:] = substring filters; no args runs every site.
    want = sys.argv[1:]
    sites = [
        ("enc L0", VaeBlock, 9, 384, 512, 128, 128, False),
        ("enc L1", VaeBlock, 9, 192, 256, 256, 256, False),
        ("enc L2", VaeBlock, 9, 96, 128, 512, 512, False),
        ("dec up3", VaeBlock, 1, 576, 768, 128, 128, False),
        # boundary probes for the 128-channel profitability policy:
        # enc L0 (B=9) regresses fused, dec up3 (B=1) wins — find the
        # batch crossover for 128ch levels
        ("dec up3 B3", VaeBlock, 3, 576, 768, 128, 128, False),
        ("enc L0 B1", VaeBlock, 1, 384, 512, 128, 128, False),
        ("dec up2", VaeBlock, 1, 288, 384, 256, 256, False),
        ("dec up1", VaeBlock, 1, 144, 192, 512, 512, False),
        # unet L0 (320ch) is excluded by the compiled-mode channel
        # alignment rule (fused_conv._channels_aligned) and L2 (1280ch)
        # by the profitability policy — fuse=1 there measures the
        # fallback (== fuse=0 up to the +-13% small-site noise floor).
        # Only L1 (640ch) genuinely fuses.
        ("unet infer L0", UnetBlock, 2, 72, 96, 320, 320, True),
        ("unet infer L1", UnetBlock, 2, 36, 48, 640, 640, True),
        ("unet infer L2", UnetBlock, 2, 18, 24, 1280, 1280, True),
    ]
    for tag, cls, B, H, W, Ci, Co, unet in sites:
        if want and not any(w in tag for w in want):
            continue
        site(tag, cls, B, H, W, Ci, Co, unet=unet)


if __name__ == "__main__":
    main()
