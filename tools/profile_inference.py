#!/usr/bin/env python
"""Decompose the NVS inference second (768x576, 30 DPM++ steps, CFG):
denoise loop vs VAE decode vs host image fetch, across seed-batch widths.

Tunnel rules (CLAUDE.md): chain every iteration's input on the previous
output so the runtime cannot memoize; force a scalar fetch to wait for
remote completion. ONE JAX process at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compile"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from view_neti_tpu.models.unet import sd15_unet_config
from view_neti_tpu.models.clip_text import sd15_text_config
from view_neti_tpu.models.vae import VAEConfig, AutoencoderKL
from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule
from view_neti_tpu.inference.pipeline import make_denoise_fn

DT = jnp.bfloat16
H, W = 576, 768
N_STEPS = int(os.environ.get("PROF_STEPS", "30"))


def cost_flops(compiled, scale=1):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) * scale
    except Exception:
        return 0.0


def main():
    import flax
    unet_cfg = sd15_unet_config(use_flash_attention=True)
    from view_neti_tpu.models.unet import UNet2DCondition
    unet = UNet2DCondition(unet_cfg, dtype=DT)
    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    rng = jax.random.PRNGKey(0)
    h, w = H // 8, W // 8
    lat1 = jax.random.normal(rng, (1, h, w, 4), jnp.float32)
    ctx1 = jax.random.normal(rng, (1, 77, 768), DT) * 0.1
    print("init unet/vae vars...", flush=True)
    unet_vars = unet.init(rng, lat1.astype(DT), jnp.full((1,), 500.0),
                          jnp.repeat(ctx1[None], 16, 0),
                          jnp.repeat(ctx1[None], 16, 0))
    vae_vars = vae.init(rng, jax.random.normal(rng, (1, 8, 8, 4), DT),
                        method=AutoencoderKL.decode)
    schedule = DPMSolverSchedule()
    denoise = make_denoise_fn(unet, None, schedule, N_STEPS, 7.5, DT)

    @jax.jit
    def decode_u8(vv, lat):
        img = vae.apply(vv, lat.astype(DT), method=AutoencoderKL.decode)
        img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1)
        return jnp.round(img * 255).astype(jnp.uint8)

    @jax.jit
    def decode_f32(vv, lat):
        img = vae.apply(vv, lat.astype(DT), method=AutoencoderKL.decode)
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1)

    for B in (3, 6, 12):
        lat0 = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, 4),
                                 jnp.float32)
        ctx = (jax.random.normal(jax.random.PRNGKey(2),
                                 (N_STEPS, 16, 1, 77, 768), DT) * 0.1)
        un = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768), DT) * 0.1
        # compile
        t0 = time.time()
        out = denoise(lat0, unet_vars, ctx, ctx, un)
        float(jnp.sum(out.astype(jnp.float32)) * 1e-30)   # scalar fetch
        tc = time.time() - t0
        n = 3
        t0 = time.time()
        cur = out
        for _ in range(n):
            cur = denoise(cur, unet_vars, ctx, ctx, un)   # chained input
        float(jnp.sum(cur.astype(jnp.float32)) * 1e-30)
        dt = (time.time() - t0) / n
        # flops: fori body counted once by the cost model -> scale by steps
        comp = denoise.lower(lat0, unet_vars, ctx, ctx, un).compile()
        fl = cost_flops(comp, N_STEPS)
        print(f"denoise B={B:2d}: {dt:7.3f} s/call  {dt/B:6.3f} s/img  "
              f"{fl/dt/1e12:6.1f} TFLOP/s  (compile+1st {tc:.1f}s)",
              flush=True)
        if B in (3, 12):
            lat = cur
            t0 = time.time()
            img = decode_u8(vae_vars, lat)
            _ = np.asarray(img)
            tc = time.time() - t0
            t0 = time.time()
            for i in range(n):
                img = decode_u8(vae_vars, lat + jnp.float32(i) * 1e-9)
                b = np.asarray(img)                       # full fetch
            du8 = (time.time() - t0) / n
            imgf = decode_f32(vae_vars, lat)
            _ = np.asarray(imgf)                          # warmup + compile
            t0 = time.time()
            for i in range(n):
                imgf = decode_f32(vae_vars, lat + jnp.float32(i) * 2e-9)
                bf = np.asarray(imgf)
            df32 = (time.time() - t0) / n
            print(f"decode+fetch B={B:2d}: uint8 {du8:6.3f} s/call  "
                  f"f32 {df32:6.3f} s/call  (delta = transfer)", flush=True)


if __name__ == "__main__":
    main()
