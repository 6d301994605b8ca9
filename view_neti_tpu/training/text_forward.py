"""NeTI text conditioning: one batched forward over the 16-UNet-layer axis.

The reference runs 16 sequential full text-encoder passes per train step,
one per UNet cross-attention layer (reference training/coach.py:276-311).
Only the scalar layer index l differs between them, so here the 16 passes
fold into ONE forward with the layer axis fused into the batch:
(B, 77) -> (16*B, 77) -> CLIP -> (16, B, 77, D). On the MXU this turns 16
small matmuls into 1 large one per layer — the single biggest structural win
of the TPU rebuild (SURVEY.md §3.1, §7.3.7).

Mapper params are applied OUTSIDE the CLIP module (see models/clip_text.py):
mode-3 object-mapper banks are stacked along a leading axis and the active
scene's slice is gathered with a traced index, so scene switching never
retraces the step.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from view_neti_tpu.constants import NUM_UNET_LAYERS
from view_neti_tpu.models.clip_text import NeTICLIPTextEncoder
from view_neti_tpu.models.neti_mapper import NeTIMapper, lookup_view_rows


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TextModels:
    """Module definitions (static metadata) + frozen CLIP variables +
    lookup tables (pytree data).

    Registered as a jax pytree so it can be passed AS AN ARGUMENT through
    jit boundaries: closing over multi-GB frozen weights would inline them
    as literal constants in the lowered program (jax warns at 4GB+ and the
    remote TPU compiler rejects the resulting module).

    Array fields (frozen, never optimized):
      clip_vars:  CLIP transformer params (incl. token embedding table)
      obj_constants / view_constants: mapper Fourier frequency matrices
      view_table_ids / view_table_params: view-token camera lookup
      obj_norm_scales: (N,) per-object-mapper target norms (or None)
    """
    clip: NeTICLIPTextEncoder = dataclasses.field(
        metadata=dict(static=True))
    clip_vars: Any = None
    obj_mapper: Optional[NeTIMapper] = dataclasses.field(
        default=None, metadata=dict(static=True))
    obj_constants: Any = None
    view_mapper: Optional[NeTIMapper] = dataclasses.field(
        default=None, metadata=dict(static=True))
    view_constants: Any = None
    view_table_ids: Any = None          # (V,) int32
    view_table_params: Any = None       # (V, C) float32, scaled
    obj_norm_scales: Any = None         # (N,) float32 or None
    view_norm_scale: Any = None         # scalar float or None
    original_ti: bool = dataclasses.field(
        default=False, metadata=dict(static=True))


def _tile16(x: jnp.ndarray, K: int) -> jnp.ndarray:
    return jnp.tile(x, (K,) + (1,) * (x.ndim - 1))


def neti_text_conditioning(
        models: TextModels,
        trainable: Any,                  # {'object': stacked tree|None,
                                         #  'view': tree|None}
        input_ids: jnp.ndarray,          # (B, L)
        ph_obj_ids: jnp.ndarray,         # (B,) int32 (-1 = absent)
        ph_view_ids: jnp.ndarray,        # (B,)
        timesteps: jnp.ndarray,          # (B,) float or int
        object_idx: jnp.ndarray,         # scalar int32, or (G,) int32
        rng: Optional[jax.Array] = None,
        train: bool = False,
        truncation_idx: Optional[int] = None,
        num_layers: int = NUM_UNET_LAYERS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (context, context_bypass), each (num_layers, B, L, D).

    original_ti short-circuit: a single layer-0 pass broadcast over layers,
    no bypass (reference coach.py:307-309).

    object_idx selects the mode-3 object-mapper bank slice. Scalar: one
    scene for the whole batch (the reference's microbatch semantics).
    Shape (G,): the batch is G contiguous groups of B/G samples, group g
    conditioned on bank slice object_idx[g] — the fused-accumulation
    layout where one device batch carries a whole k-microbatch window of
    per-group scene resamples (G is static; the object mapper runs G
    small passes, the expensive CLIP pass stays fully fused).
    """
    B, L = input_ids.shape
    K = 1 if models.original_ti else num_layers
    ids_k = _tile16(input_ids, K)
    t_k = _tile16(timesteps.astype(jnp.float32), K)
    l_k = jnp.repeat(jnp.arange(K, dtype=jnp.float32), B)
    ph_obj_k = _tile16(ph_obj_ids, K)
    ph_view_k = _tile16(ph_view_ids, K)

    rng_o = rng_v = None
    if rng is not None:
        rng_o, rng_v = jax.random.split(rng)

    word_obj = bypass_obj = None
    alpha_obj, unconstrained_obj = 0.2, False
    obj_params = trainable.get("object") if trainable else None
    if models.obj_mapper is not None and obj_params is not None:
        def run_obj(idx, t_in, l_in, rng_in):
            p = jax.tree_util.tree_map(lambda a: a[idx], obj_params)
            norm_scale = None
            if models.obj_norm_scales is not None:
                norm_scale = models.obj_norm_scales[idx]
            variables = {"params": p}
            if models.obj_constants is not None:
                variables["constants"] = models.obj_constants
            return models.obj_mapper.apply(
                variables, t_in, l_in, train=train,
                truncation_idx=truncation_idx, norm_scale=norm_scale,
                rngs={"dropout": rng_in}
                if (train and rng_in is not None) else {})

        if jnp.ndim(object_idx) == 0:
            out = run_obj(object_idx, t_k, l_k, rng_o)
            word_obj, bypass_obj = out.word_embedding, out.bypass_output
        else:
            G = object_idx.shape[0]
            bs = B // G
            assert B % G == 0, (B, G)

            def grp(x, g):
                return x.reshape(K, G, bs)[:, g].reshape(-1)

            words, bypasses = [], []
            for g in range(G):
                out = run_obj(
                    object_idx[g], grp(t_k, g), grp(l_k, g),
                    jax.random.fold_in(rng_o, g)
                    if rng_o is not None else None)
                words.append(out.word_embedding.reshape(K, bs, -1))
                bypasses.append(
                    out.bypass_output.reshape(K, bs, -1)
                    if out.bypass_output is not None else None)
            word_obj = jnp.stack(words, axis=1).reshape(K * B, -1)
            bypass_obj = (
                jnp.stack(bypasses, axis=1).reshape(K * B, -1)
                if bypasses[0] is not None else None)
        alpha_obj = out.output_bypass_alpha
        unconstrained_obj = out.bypass_unconstrained

    word_view = bypass_view = None
    alpha_view, unconstrained_view = 0.2, False
    view_params_tree = trainable.get("view") if trainable else None
    if models.view_mapper is not None and view_params_tree is not None:
        rows = lookup_view_rows(ph_view_k, models.view_table_ids)
        cam = models.view_table_params[rows]
        variables = {"params": view_params_tree}
        if models.view_constants is not None:
            variables["constants"] = models.view_constants
        out = models.view_mapper.apply(
            variables, t_k, l_k, view_params=cam, view_rows=rows,
            train=train, truncation_idx=truncation_idx,
            norm_scale=models.view_norm_scale,
            rngs={"dropout": rng_v} if (train and rng_v is not None) else {})
        word_view, bypass_view = out.word_embedding, out.bypass_output
        alpha_view = out.output_bypass_alpha
        unconstrained_view = out.bypass_unconstrained

    hidden, hidden_bypass, _, _ = models.clip.apply(
        models.clip_vars, ids_k,
        word_obj=word_obj, bypass_obj=bypass_obj, ph_obj_ids=ph_obj_k,
        word_view=word_view, bypass_view=bypass_view, ph_view_ids=ph_view_k,
        alpha_obj=alpha_obj, alpha_view=alpha_view,
        unconstrained_obj=unconstrained_obj,
        unconstrained_view=unconstrained_view)

    D = hidden.shape[-1]
    ctx = hidden.reshape(K, B, L, D)
    ctx_b = (hidden_bypass.reshape(K, B, L, D)
             if hidden_bypass is not None else ctx)
    if K == 1:
        ctx = jnp.broadcast_to(ctx, (num_layers, B, L, D))
        ctx_b = jnp.broadcast_to(ctx_b, (num_layers, B, L, D))
    return ctx, ctx_b
