#!/usr/bin/env python
"""Flash-attention block-size sweep at the UNet's training shapes.

Times the Pallas kernel (fwd and fwd+bwd) across (block_q, block_k)
against the jnp fallback, at the self-attention shapes the train step
actually runs (B=9, 512x384 image -> 48x64 latent: L=3072 d=40 at level
0; L=768 d=80 at level 1). Chained memoization-proof timing with a
scalar fetch as the completion barrier (see CLAUDE.md / profile_step.py).
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

from view_neti_tpu.ops.attention import mha_jnp
from view_neti_tpu.ops.flash_attention import flash_attention

DT = jnp.bfloat16


def timeit(name, f, q, k, v, n=20):
    @jax.jit
    def step(q, k, v, eps):
        out = f(q + eps.astype(q.dtype), k, v)
        return out, jnp.mean(out.astype(jnp.float32)) * 1e-20

    out, eps = step(q, k, v, jnp.float32(0))
    float(eps)                               # compile + completion
    t0 = time.time()
    for _ in range(n):
        out, eps = step(q, k, v, eps)
    float(eps)                               # remote completion barrier
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def timeit_grad(name, f, q, k, v, n=20):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2) * 1e-6

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step(q, k, v, eps):
        dq, dk, dv = g(q + eps.astype(q.dtype), k, v)
        # consume ALL grads in the fetched scalar: returning only dq lets
        # XLA dead-code-eliminate the dkv backward kernel entirely (its
        # pallas_call vanishes from the HLO), which silently halves what
        # "fwd+bwd" measures
        chk = (jnp.mean(dq.astype(jnp.float32))
               + jnp.mean(dk.astype(jnp.float32))
               + jnp.mean(dv.astype(jnp.float32))) * 1e-20
        return dq, chk

    dq, eps = step(q, k, v, jnp.float32(0))
    float(eps)
    t0 = time.time()
    for _ in range(n):
        dq, eps = step(q, k, v, eps)
    float(eps)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def sweep(B, L, H, d):
    print(f"--- self-attn B={B} L={L} H={H} d={d} ({DT.__name__}) ---")
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, L, H, d), DT)
    k = jax.random.normal(kk, (B, L, H, d), DT)
    v = jax.random.normal(kv, (B, L, H, d), DT)
    timeit("jnp (materialized logits)", mha_jnp, q, k, v)
    timeit_grad("jnp fwd+bwd", mha_jnp, q, k, v)
    for bq in (256, 384, 512, 1024):
        for bk in (256, 512, 768, 1024, 1536, 3072):
            if bq > L or bk > L or L % bq or L % bk:
                continue
            def fl(q, k, v, bq=bq, bk=bk):
                return flash_attention(q, k, v, block_q=bq, block_k=bk)
            timeit(f"flash bq={bq} bk={bk}", fl, q, k, v)
            timeit_grad(f"flash bq={bq} bk={bk} fwd+bwd", fl, q, k, v)


if __name__ == "__main__":
    sweep(B=9, L=3072, H=8, d=40)    # level 0 @ 48x64, 320 ch
    sweep(B=9, L=768, H=8, d=80)     # level 1 @ 24x32, 640 ch
