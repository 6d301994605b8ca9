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
