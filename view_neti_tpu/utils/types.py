"""Core value types, as JAX-friendly pytrees.

Semantic parity with /root/reference/utils/types.py:8-31, redesigned for a
functional JAX pipeline: arrays are jnp arrays, static fields are marked as
pytree metadata so the structures can flow through `jax.jit` boundaries.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class NeTIBatch:
    """One text-conditioning request.

    Shapes (B = batch):
      input_ids: (B, L) int32 token ids, L = tokenizer max length (77).
      input_ids_placeholder_object: (B,) int32, -1 if no object placeholder.
      input_ids_placeholder_view: (B,) int32, -1 if no view placeholder.
      timesteps: (B,) float32 diffusion timesteps in [0, 1000).
      unet_layers: (B,) float32 UNet cross-attention layer indices in [0, 16).
      truncation_idx: static Python int or None; nested-dropout truncation at
        inference (reference models/neti_mapper.py:411-413).
    """
    input_ids: jnp.ndarray
    input_ids_placeholder_object: jnp.ndarray
    input_ids_placeholder_view: jnp.ndarray
    timesteps: jnp.ndarray
    unet_layers: jnp.ndarray
    truncation_idx: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))


@dataclass(frozen=True)
class PESigmas:
    """Fourier-feature frequency scales (reference utils/types.py:17-24,
    with the reference's buggy `float`-type defaults replaced by real
    values — see SURVEY.md §3.5). Frozen/hashable: PESigmas is static
    metadata on jit-traversed module definitions."""
    sigma_t: float = 0.03
    sigma_l: float = 2.0
    sigma_theta: float = 1.0
    sigma_phi: float = 1.0
    sigma_r: float = 1.0
    sigma_dtu12: float = 2.0


@jax.tree_util.register_dataclass
@dataclass
class MapperOutput:
    """Mapper forward result (reference utils/types.py:26-31).

    word_embedding: (B, D) vector written into the placeholder row of the
      CLIP input embeddings.
    bypass_output: (B, D) or None; merged into the post-encoder hidden state.
    """
    word_embedding: jnp.ndarray
    bypass_output: Optional[jnp.ndarray]
    bypass_unconstrained: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    output_bypass_alpha: float = dataclasses.field(
        default=0.2, metadata=dict(static=True))
