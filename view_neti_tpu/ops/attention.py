"""Multi-head attention dispatch: Pallas flash kernel on TPU, jnp fallback.

The UNet's self-attention over 64x64 latents (4096 tokens) is the hottest
non-conv op in the model; it routes to the Pallas flash-attention kernel in
ops/flash_attention.py when running on TPU with kernel-friendly shapes, and
to a plain fused-softmax jnp path otherwise (CPU tests, odd shapes).

The XTI split-source contract (K from the regular context, V from the bypass
context — reference models/xti_attention_processor.py:38-42) is resolved
*upstream*: to_k/to_v projections consume different source tensors, so this
op only ever sees standard (q, k, v).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    """True when computation is headed for a TPU. Checks the configured
    default device first — the axon sitecustomize registers the TPU backend
    in every process, so default_backend() alone over-reports."""
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mha_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference path. q: (B, Lq, H, hd); k/v: (B, Lk, H, hd)."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         use_flash: bool = True) -> jnp.ndarray:
    """Dispatching attention. Shapes as in mha_jnp; returns (B, Lq, H, hd)."""
    if use_flash and _on_tpu():
        from view_neti_tpu.ops.flash_attention import flash_attention_compat
        out = flash_attention_compat(q, k, v)
        if out is not None:
            return out
    return mha_jnp(q, k, v)


def single_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          chunk: int = 8192) -> jnp.ndarray:
    """Exact single-head attention for the VAE's spatial AttnBlock,
    q-chunked so logits never materialize at (B, L, L) for large images.

    The VAE bottleneck attention is single-head with C=512 — beyond the
    flash kernel's d<=256 VMEM budget. Up to L=chunk the one-shot einsum
    is fastest (768x576 -> L=6912 logits fit comfortably); beyond that
    (1024x1024+ generation) queries are chunked, keeping the peak at
    (B, chunk, L) while each row still sees its FULL key set (exact
    softmax, no online accumulation needed). q/k/v: (B, L, C)."""
    B, L, C = q.shape
    scale = C ** -0.5
    if L <= chunk:
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1)
        return jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v)
    pad = (-L) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    qs = qp.reshape(B, -1, chunk, C).transpose(1, 0, 2, 3)

    def one(qc):  # (B, chunk, C)
        logits = jnp.einsum("bqc,bkc->bqk", qc, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1)
        return jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v)

    out = jax.lax.map(one, qs)                      # (n, B, chunk, C)
    out = out.transpose(1, 0, 2, 3).reshape(B, -1, C)
    return out[:, :L]
