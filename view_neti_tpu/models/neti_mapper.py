"""NeTIMapper: the learnable network, as a Flax module.

Semantic parity with /root/reference/models/neti_mapper.py:19-611, restricted
to the paths the reference actually ships (SURVEY.md §2.1):

  * arch_view_net == 15 — Fourier-feature PE over [t, l (+camera)] ->
    2-block MLP -> output head (the paper's final model,
    reference neti_mapper.py:513-518, 601-608),
  * the legacy object paths arch <= 14 with use_positional_encoding in
    {0, 1} (NeTI anchor encoding / basic scaling — the code-default config,
    reference neti_mapper.py:90-109, 155-163),
  * the original-TI escape hatch (one learned vector per token,
    reference neti_mapper.py:585-598).

TPU-first design notes:
  * Fourier/NeTI frequency matrices live in the 'constants' variable
    collection: checkpointed, never optimized (the reference detaches them
    every forward).
  * Nested dropout is an explicit-PRNG masked multiply (no in-place writes);
    the keep/drop decision is drawn per sample rather than per forward call
    (the reference draws once per Python-level call; with the 16-layer sweep
    folded into one batched call, per-sample draws preserve the marginal
    drop rate).
  * View-token camera lookup is a vectorized id->row match against a
    precomputed table (see view_tokens.py) instead of Python dict lookups.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from view_neti_tpu.constants import NUM_UNET_LAYERS
from view_neti_tpu.models import positional_encoding as pe
from view_neti_tpu.utils.types import MapperOutput, PESigmas


def lookup_view_rows(batch_view_ids: jnp.ndarray,
                     table_token_ids: jnp.ndarray) -> jnp.ndarray:
    """Vectorized token-id -> table-row lookup. (B,) ids -> (B,) rows."""
    eq = batch_view_ids[:, None] == table_token_ids[None, :]
    return jnp.argmax(eq, axis=1)


class NeTIMapper(nn.Module):
    """Maps (timestep, unet_layer[, camera]) -> CLIP word embedding (+bypass).

    Call signature:
      mapper.apply(variables, timestep, unet_layer, view_params, view_rows,
                   train=..., truncation_idx=..., rngs={'dropout': key})
      timestep:    (B,) float32, raw in [0, 1000)
      unet_layer:  (B,) float32, raw in [0, 16)
      view_params: (B, C) float32 scaled to (-1, 1), or None (object mapper)
      view_rows:   (B,) int32 table rows, only used by original-TI view path
    Returns MapperOutput with (B, output_dim) word embedding and bypass.
    """
    embedding_type: str                       # 'object' | 'view'
    output_dim: int = 768
    arch_mlp_hidden_dims: int = 128
    use_nested_dropout: bool = True
    nested_dropout_prob: float = 0.5
    norm_scale: Optional[float] = None
    # mode-3 object-mapper banks share one module def but differ in target
    # norms; set normalize_output=True and pass norm_scale per call instead.
    normalize_output: bool = False
    use_positional_encoding: int = 1
    num_pe_time_anchors: int = 10
    pe_sigmas: PESigmas = None
    output_bypass: bool = True
    arch_view_net: int = 0
    arch_view_mix_streams: int = 0
    arch_view_disable_tl: bool = True
    original_ti: bool = False
    bypass_unconstrained: bool = True
    output_bypass_alpha: float = 0.2
    num_unet_layers: int = NUM_UNET_LAYERS
    num_view_cond_dims: int = 0               # C: 0 obj, 1 phi, 2 t-p, 12 dtu
    num_view_tokens: int = 0                  # rows for original-TI view
    pe_seed: int = 0
    # optional concrete init data (original-TI init embedding, torch-exported
    # Fourier freqs for parity runs); arrays, treated as static init data.
    ti_init_embed: Any = None
    fourier_freqs_override: Any = None

    def setup(self):
        if self.original_ti and self.output_bypass:
            raise ValueError(
                "original_ti is incompatible with output_bypass "
                "(reference neti_mapper.py:73-76)")
        sigmas = self._sigmas()
        pe_dim = 64  # arch-15 encode dim (reference neti_mapper.py:506-511)

        if self.original_ti or (self.embedding_type == "view"
                                and self.arch_view_net == 1):
            n_rows = max(self.num_view_tokens, 1) \
                if self.embedding_type == "view" else 1
            if self.ti_init_embed is not None:
                init_embed = jnp.broadcast_to(
                    jnp.asarray(self.ti_init_embed, jnp.float32),
                    (n_rows, self.output_dim))
                init_fn = lambda rng: init_embed
            else:
                init_fn = nn.initializers.normal(0.02)
                init_fn = (lambda f: (lambda rng: f(
                    rng, (n_rows, self.output_dim))))(init_fn)
            self.ti_embeddings = self.param("ti_embeddings", init_fn)
            return

        if self.arch_view_net <= 14:
            if self.embedding_type != "object":
                raise NotImplementedError(
                    "legacy arch<=14 view paths are not rebuilt "
                    "(SURVEY.md §2.1 dead/legacy)")
            if self.use_positional_encoding == 1:
                freqs = pe.make_neti_freqs(self.pe_seed, sigmas[0], sigmas[1])
                self.freqs = self.variable(
                    "constants", "neti_w", lambda: freqs)
                input_dim = self.num_pe_time_anchors * self.num_unet_layers
                anchor_w = pe.neti_init_layer(
                    freqs, self.num_pe_time_anchors, self.num_unet_layers)
                # Dense kernel is (in, out); the anchor matrix is (out, in).
                self.input_layer = nn.Dense(
                    input_dim,
                    kernel_init=lambda *a: anchor_w.T,
                    name="input_layer")
            elif self.use_positional_encoding == 0:
                self.input_layer = None
                input_dim = 2
            else:
                raise ValueError(
                    f"use_positional_encoding="
                    f"{self.use_positional_encoding} unsupported")
            h = self.arch_mlp_hidden_dims
        elif self.arch_view_net == 15:
            if self.embedding_type == "view" and self.arch_view_disable_tl:
                raise NotImplementedError(
                    "arch 15 assumes (t,l) conditioning "
                    "(reference neti_mapper.py:481-483)")
            if self.fourier_freqs_override is not None:
                freqs = jnp.asarray(self.fourier_freqs_override, jnp.float32)
            else:
                freqs = pe.make_fourier_freqs(self.pe_seed, pe_dim, sigmas)
            self.freqs = self.variable("constants", "fourier_w",
                                       lambda: freqs)
            input_dim = pe_dim
            # view arch 15 uses a fixed 64-hidden net; object uses the
            # configured width (reference neti_mapper.py:148,603)
            h = 64 if self.embedding_type == "view" \
                else self.arch_mlp_hidden_dims
        else:
            raise NotImplementedError(
                f"arch_view_net={self.arch_view_net} not rebuilt")

        out_dim = self.output_dim * (2 if self.output_bypass else 1)
        self.net = [
            nn.Dense(h, name="net_dense0"),
            nn.LayerNorm(epsilon=1e-5, name="net_ln0"),
            nn.Dense(h, name="net_dense1"),
            nn.LayerNorm(epsilon=1e-5, name="net_ln1"),
        ]
        self.output_layer = nn.Dense(out_dim, name="output_layer")
        self._hidden_dim = h

    def _sigmas(self):
        s = self.pe_sigmas or PESigmas()
        sigmas = [s.sigma_t, s.sigma_l]
        if self.embedding_type == "view":
            if self.num_view_cond_dims == 1:
                sigmas += [s.sigma_phi]
            elif self.num_view_cond_dims == 2:
                sigmas += [s.sigma_theta, s.sigma_phi]
            elif self.num_view_cond_dims == 12:
                sigmas += [s.sigma_dtu12] * 12
            elif self.num_view_cond_dims != 0:
                raise NotImplementedError(self.num_view_cond_dims)
        return sigmas

    def __call__(self, timestep: jnp.ndarray, unet_layer: jnp.ndarray,
                 view_params: Optional[jnp.ndarray] = None,
                 view_rows: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 truncation_idx: Optional[int] = None,
                 norm_scale: Optional[jnp.ndarray] = None) -> MapperOutput:
        if self.original_ti or (self.embedding_type == "view"
                                and self.arch_view_net == 1):
            if self.embedding_type == "view":
                emb = self.ti_embeddings[view_rows]
            else:
                emb = jnp.broadcast_to(
                    self.ti_embeddings[0][None, :],
                    (timestep.shape[0], self.output_dim))
            return MapperOutput(
                word_embedding=emb, bypass_output=None,
                bypass_unconstrained=False,
                output_bypass_alpha=self.output_bypass_alpha)

        x = self._encode(timestep, unet_layer, view_params)
        h = x
        h = self.net[0](h)
        h = self.net[1](h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = self.net[2](h)
        h = self.net[3](h)
        h = nn.leaky_relu(h, negative_slope=0.01)

        if self.use_nested_dropout:
            h = self._nested_dropout(h, train, truncation_idx)

        out = self.output_layer(h)
        if self.output_bypass:
            word, bypass = jnp.split(out, 2, axis=-1)
        else:
            word, bypass = out, None
        scale = norm_scale if norm_scale is not None else self.norm_scale
        if (self.normalize_output or self.norm_scale is not None) \
                and scale is not None:
            # safe norm: clamp INSIDE the sqrt so the gradient at a zero
            # vector is 0, not NaN (a zero word embedding is reachable
            # under full nested dropout with zero-init output bias)
            sq = jnp.sum(word * word, axis=-1, keepdims=True)
            norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
            word = word / norm * scale
        return MapperOutput(
            word_embedding=word, bypass_output=bypass,
            bypass_unconstrained=self.bypass_unconstrained
            and self.output_bypass,
            output_bypass_alpha=self.output_bypass_alpha)

    def _encode(self, timestep, unet_layer, view_params):
        if self.arch_view_net <= 14:
            if self.use_positional_encoding == 1:
                enc = pe.neti_encode(self.freqs.value, timestep, unet_layer)
                return self.input_layer(enc)
            return pe.basic_encode(timestep, unet_layer,
                                   num_unet_layers=self.num_unet_layers)
        # arch 15: scale (t, l) to [-1, 1] (reference neti_mapper.py:546-547
        # divides by 1000 / num_unet_layers, not by N-1)
        t_s = timestep.astype(jnp.float32) / 1000.0 * 2 - 1
        l_s = unet_layer.astype(jnp.float32) / self.num_unet_layers * 2 - 1
        data = jnp.stack([t_s, l_s], axis=-1)
        if self.embedding_type == "view":
            assert view_params is not None
            data = jnp.concatenate(
                [data, view_params.astype(jnp.float32)], axis=-1)
        return pe.fourier_encode(self.freqs.value, data)

    def _nested_dropout(self, h, train, truncation_idx):
        """Zero the tail h[idx:] of each row (reference
        neti_mapper.py:401-414)."""
        dim = h.shape[-1]
        pos = jax.lax.broadcasted_iota(jnp.int32, h.shape, h.ndim - 1)
        if train:
            rng = self.make_rng("dropout")
            k_apply, k_idx = jax.random.split(rng)
            apply_drop = jax.random.bernoulli(
                k_apply, self.nested_dropout_prob, (h.shape[0],))
            idxs = jax.random.randint(k_idx, (h.shape[0],), 0, dim)
            mask = pos < idxs[:, None]
            return jnp.where(apply_drop[:, None], h * mask, h)
        if truncation_idx is not None:
            return h * (pos < truncation_idx)
        return h
