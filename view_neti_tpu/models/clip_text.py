"""Flax CLIP text transformer with NeTI injection points.

Functional parity with the reference's NeTICLIPTextModel/-Transformer and
NeTICLIPTextEmbeddings (/root/reference/models/neti_clip_text_encoder.py:15-225,
/root/reference/models/net_clip_text_embedding.py:12-137), redesigned for JAX:

  * The mappers are NOT nested inside this module. Callers compute
    MapperOutputs first and pass the word-embedding / bypass vectors in;
    this module does the token-row overwrite and the post-encoder bypass
    merge. That keeps the trainable surface (mapper params) disjoint from
    this module's (frozen) params and lets the 16-UNet-layer sweep run as
    one batched forward.
  * Placeholder-row surgery uses one-hot masks instead of advanced indexing
    (jit-compatible; SURVEY.md §7.3.2). Rows with placeholder id == -1 are
    left untouched (parity with the reference's `all(ids == -1)` skip,
    net_clip_text_embedding.py:103-104).
  * The token embedding table is allocated with `vocab_headroom` spare rows
    so the vocabulary can grow at runtime under static shapes
    (SURVEY.md §7.3.4).

Supports both SD-1.x CLIP (12 layers, 768 wide, quick_gelu) and SD-2.x
OpenCLIP (23 layers, 1024 wide, gelu) via CLIPTextConfig.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    vocab_headroom: int = 128          # spare rows for placeholder tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"     # "quick_gelu" (SD1.x) | "gelu" (SD2.x)
    # rematerialize encoder layers on the backward pass (the reference's
    # text_encoder.gradient_checkpointing_enable(), coach.py:672-677)
    gradient_checkpointing: bool = False

    @property
    def total_vocab(self) -> int:
        return self.vocab_size + self.vocab_headroom


def sd15_text_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def sd21_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                          intermediate_size=4096, hidden_act="gelu")


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        cfg = self.config
        B, L, D = x.shape
        H = cfg.num_heads
        hd = D // H
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, L, H, hd)
        k = dense("k_proj")(x).reshape(B, L, H, hd)
        v = dense("v_proj")(x).reshape(B, L, H, hd)
        # (B, H, Lq, Lk) logits on fp32 accumulators for numerical stability
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5) + causal_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, L, D)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(
            ln("layer_norm1")(x), causal_bias)
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


def _overwrite_placeholder_rows(embeds: jnp.ndarray, input_ids: jnp.ndarray,
                                placeholder_ids: jnp.ndarray,
                                word_embedding: jnp.ndarray) -> jnp.ndarray:
    """Replace the (single) placeholder-token row of each prompt.

    Rows whose placeholder id is -1 are untouched. (reference
    net_clip_text_embedding.py:95-98; exactly-one-placeholder is a data
    invariant asserted there and enforced in our dataset tests.)
    """
    mask = (input_ids == placeholder_ids[:, None])[..., None]
    return jnp.where(mask, word_embedding[:, None, :].astype(embeds.dtype),
                     embeds)


def _merge_bypass(hidden: jnp.ndarray, input_ids: jnp.ndarray,
                  placeholder_ids: jnp.ndarray, bypass: jnp.ndarray,
                  alpha: float, unconstrained: bool) -> jnp.ndarray:
    """Post-encoder bypass merge at the placeholder position.

    constrained: new = existing + alpha * normalize(bypass) * ||existing||
    unconstrained: new = normalize(bypass) * mean_seq_norm(hidden)  [detached]
    (reference neti_clip_text_encoder.py:129-180)
    """
    mask = (input_ids == placeholder_ids[:, None])      # (B, L)
    has = mask.any(axis=1)                              # (B,)
    existing = jnp.einsum("bl,bld->bd", mask.astype(hidden.dtype), hidden)
    bypass = bypass.astype(hidden.dtype)

    def safe_norm(x, axis=-1, keepdims=True):
        # clamp inside the sqrt: zero vectors get zero gradient, not NaN
        sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
        return jnp.sqrt(jnp.maximum(sq, 1e-24))

    b_normed = bypass / safe_norm(bypass)
    if unconstrained:
        norm_term = jax.lax.stop_gradient(
            safe_norm(hidden, keepdims=False).mean(axis=-1))   # (B,)
        new_state = b_normed * norm_term[:, None]
    else:
        ex_norm = safe_norm(existing)
        new_state = existing + alpha * b_normed * ex_norm
    write = mask[..., None] & has[:, None, None]
    return jnp.where(write, new_state[:, None, :], hidden)


class NeTICLIPTextEncoder(nn.Module):
    """CLIP text transformer with embedding injection + bypass outputs.

    __call__ returns (last_hidden, last_hidden_with_bypass, pooled,
    pooled_with_bypass); both hidden states are post final-layer-norm
    (reference neti_clip_text_encoder.py:183-203).
    """
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 input_ids: jnp.ndarray,                    # (B, L) int32
                 word_obj: Optional[jnp.ndarray] = None,    # (B, D)
                 bypass_obj: Optional[jnp.ndarray] = None,  # (B, D)
                 ph_obj_ids: Optional[jnp.ndarray] = None,  # (B,)
                 word_view: Optional[jnp.ndarray] = None,
                 bypass_view: Optional[jnp.ndarray] = None,
                 ph_view_ids: Optional[jnp.ndarray] = None,
                 alpha_obj: float = 0.2,
                 alpha_view: float = 0.2,
                 unconstrained_obj: bool = False,
                 unconstrained_view: bool = False):
        cfg = self.config
        B, L = input_ids.shape
        tok_table = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.total_vocab, cfg.hidden_size), jnp.float32)
        pos_table = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)

        embeds = tok_table[input_ids].astype(self.dtype)
        if word_obj is not None:
            embeds = _overwrite_placeholder_rows(
                embeds, input_ids, ph_obj_ids, word_obj)
        if word_view is not None:
            embeds = _overwrite_placeholder_rows(
                embeds, input_ids, ph_view_ids, word_view)
        x = embeds + pos_table[None, :L].astype(self.dtype)

        causal = jnp.triu(
            jnp.full((L, L), jnp.finfo(jnp.float32).min, jnp.float32), k=1)
        causal = causal[None, None]

        layer_cls = (nn.remat(CLIPEncoderLayer) if cfg.gradient_checkpointing
                     else CLIPEncoderLayer)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype,
                          name=f"layers_{i}")(x, causal)

        hidden = x
        hidden_bypass = hidden
        any_bypass = bypass_obj is not None or bypass_view is not None
        if bypass_obj is not None:
            hidden_bypass = _merge_bypass(
                hidden_bypass, input_ids, ph_obj_ids, bypass_obj,
                alpha_obj, unconstrained_obj)
        if bypass_view is not None:
            hidden_bypass = _merge_bypass(
                hidden_bypass, input_ids, ph_view_ids, bypass_view,
                alpha_view, unconstrained_view)

        final_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                name="final_layer_norm")
        hidden = final_ln(hidden)
        hidden_bypass = final_ln(hidden_bypass) if any_bypass else hidden

        # pooled output: the EOT row (highest token id in CLIP's vocab order;
        # reference neti_clip_text_encoder.py:190-203)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(
            hidden, eot[:, None, None], axis=1)[:, 0]
        pooled_bypass = jnp.take_along_axis(
            hidden_bypass, eot[:, None, None], axis=1)[:, 0]
        return hidden, (hidden_bypass if any_bypass else None), \
            pooled, pooled_bypass
