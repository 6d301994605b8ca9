"""Assemble the full model stack + trainable tree from a RunConfig.

This is the functional equivalent of the reference Coach's __init__ wiring
(reference training/coach.py:38-135): load tokenizer, grow the vocabulary
with placeholder tokens, initialize the placeholder embedding rows from the
super-category rows, compute target norms, build mappers per learnable_mode,
and initialize (or load) the frozen SD stack.

Zero-egress note: with no local weight files, the frozen stack is randomly
initialized — the architecture, shapes and train dynamics are exact;
generation quality requires ported weights (weight_port.py).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from view_neti_tpu.config import RunConfig
from view_neti_tpu.constants import NUM_UNET_LAYERS
from view_neti_tpu.models.clip_text import (CLIPTextConfig,
                                            NeTICLIPTextEncoder,
                                            sd15_text_config,
                                            sd21_text_config)
from view_neti_tpu.models.neti_mapper import NeTIMapper
from view_neti_tpu.models.unet import (UNetConfig, UNet2DCondition,
                                       sd15_unet_config, sd21_unet_config)
from view_neti_tpu.models.vae import AutoencoderKL, VAEConfig
from view_neti_tpu.models.view_tokens import (ViewTokenTable,
                                              build_view_token_table,
                                              num_cond_dims)
from view_neti_tpu.schedulers.ddpm import DDPMSchedule
from view_neti_tpu.training.text_forward import TextModels
from view_neti_tpu.training.train_step import FrozenModels


@dataclass(frozen=True)
class SDArch:
    """Architecture bundle for one SD family."""
    text: CLIPTextConfig
    unet: UNetConfig
    vae: VAEConfig
    prediction_type: str = "epsilon"


def resolve_arch(name: str, word_embedding_dim: int) -> SDArch:
    """Map a model name to architecture configs (reference loads these from
    the HF hub, coach.py:600-640; here they are code-defined)."""
    name = name.lower()
    if "stable-diffusion-2" in name:
        pred = "v_prediction" if not name.endswith("base") else "epsilon"
        arch = SDArch(text=sd21_text_config(), unet=sd21_unet_config(),
                      vae=VAEConfig(), prediction_type=pred)
    else:  # SD 1.x family (v1-4, v1-5)
        arch = SDArch(text=sd15_text_config(), unet=sd15_unet_config(),
                      vae=VAEConfig(), prediction_type="epsilon")
    assert arch.text.hidden_size == word_embedding_dim, (
        f"word_embedding_dim {word_embedding_dim} != text encoder width "
        f"{arch.text.hidden_size} for {name}")
    return arch


def with_gradient_checkpointing(arch: SDArch) -> SDArch:
    """Enable remat on the UNet + CLIP encoder layers (the reference's
    optim.gradient_checkpointing applies to both, coach.py:672-677)."""
    return dataclasses.replace(
        arch,
        unet=dataclasses.replace(arch.unet, gradient_checkpointing=True),
        text=dataclasses.replace(arch.text, gradient_checkpointing=True))


def tiny_arch(ctx_dim: int = 32) -> SDArch:
    """Miniature stack for tests and the multi-chip dry run."""
    from view_neti_tpu.models.unet import tiny_unet_config
    from view_neti_tpu.models.vae import tiny_vae_config
    text = CLIPTextConfig(vocab_size=512, vocab_headroom=128,
                          hidden_size=ctx_dim, num_layers=2, num_heads=2,
                          intermediate_size=64, max_position_embeddings=16)
    return SDArch(text=text,
                  unet=tiny_unet_config(cross_attention_dim=ctx_dim),
                  vae=tiny_vae_config())


@dataclass
class BuiltModels:
    """Everything the trainer needs, grouped by mutability."""
    frozen: FrozenModels
    trainable: Dict[str, Any]            # {'object': stacked, 'view': tree}
    arch: SDArch
    tokenizer: Any
    placeholder_token_ids: List[int]
    placeholder_object_token_ids: List[int]
    placeholder_view_token_ids: List[int]
    view_table: Optional[ViewTokenTable]
    target_norm_object: Optional[List[float]]
    target_norm_view: Optional[float]


def add_concept_tokens(cfg: RunConfig, tokenizer,
                       placeholder_view_tokens: List[str],
                       placeholder_object_tokens: List[str],
                       token_table: np.ndarray
                       ) -> Tuple[np.ndarray, List[int], List[int],
                                  List[int], List[float], Optional[float]]:
    """Grow the vocab + initialize placeholder rows from super-categories.

    Parity with Coach._add_concept_token_to_tokenizer_static (reference
    coach.py:320-397). Returns the updated embedding table, the id lists,
    per-object target norms, and the view target norm.
    """
    placeholder_tokens = placeholder_view_tokens + placeholder_object_tokens
    n_added = tokenizer.add_tokens(placeholder_tokens)
    if n_added == 0 and placeholder_tokens:
        raise ValueError("No new tokens were added to the tokenizer")
    view_ids = tokenizer.convert_tokens_to_ids(placeholder_view_tokens)
    object_ids = tokenizer.convert_tokens_to_ids(placeholder_object_tokens)
    all_ids = tokenizer.convert_tokens_to_ids(placeholder_tokens)
    assert set(view_ids) | set(object_ids) == set(all_ids)
    if max(all_ids, default=0) >= token_table.shape[0]:
        raise ValueError(
            f"vocab overflow: token id {max(all_ids)} >= table "
            f"{token_table.shape[0]}; raise CLIPTextConfig.vocab_headroom")

    # one super-category per object for mode 3, else a single one
    if cfg.learnable_mode == 3:
        supers_obj = cfg.data.super_category_object_tokens
    else:
        supers_obj = [cfg.data.super_category_object_token] * len(
            placeholder_object_tokens)

    def super_id(token: str) -> int:
        ids = tokenizer.encode(token, add_special_tokens=False)
        if len(ids) != 1:
            raise ValueError(
                f"super-category {token!r} is not a single token")
        return ids[0]

    table = token_table.copy()
    target_norm_object: List[float] = []
    for tok_id, sup in zip(object_ids, supers_obj):
        sid = super_id(sup)
        table[tok_id] = table[sid]
        target_norm_object.append(float(np.linalg.norm(table[sid])))
    target_norm_view = None
    if placeholder_view_tokens:
        sid = super_id(cfg.data.super_category_view_token)
        for tok_id in view_ids:
            table[tok_id] = table[sid]
        target_norm_view = float(np.linalg.norm(table[sid]))
    return (table, all_ids, view_ids, object_ids,
            target_norm_object, target_norm_view)


def _init_mapper(cfg: RunConfig, embedding_type: str, arch: SDArch,
                 num_view_cond_dims: int, normalize: bool,
                 output_bypass: bool, bypass_unconstrained: bool,
                 alpha: float, num_view_tokens: int = 0,
                 ti_init_embed=None) -> Tuple[NeTIMapper, Any, Any]:
    if ti_init_embed is not None:
        # hashable static metadata (module defs ride jit treedefs)
        ti_init_embed = tuple(float(x) for x in np.asarray(ti_init_embed))
    m = NeTIMapper(
        embedding_type=embedding_type,
        output_dim=cfg.model.word_embedding_dim,
        arch_mlp_hidden_dims=cfg.model.arch_mlp_hidden_dims,
        use_nested_dropout=cfg.model.use_nested_dropout,
        nested_dropout_prob=cfg.model.nested_dropout_prob,
        normalize_output=normalize,
        use_positional_encoding=(
            cfg.model.use_positional_encoding_object
            if embedding_type == "object"
            else cfg.model.use_positional_encoding_view),
        num_pe_time_anchors=cfg.model.num_pe_time_anchors,
        pe_sigmas=cfg.model.pe_sigmas,
        output_bypass=output_bypass,
        arch_view_net=cfg.model.arch_view_net,
        arch_view_mix_streams=cfg.model.arch_view_mix_streams,
        arch_view_disable_tl=(cfg.model.arch_view_disable_tl
                              if embedding_type == "view" else True),
        original_ti=cfg.model.original_ti,
        bypass_unconstrained=bypass_unconstrained,
        output_bypass_alpha=alpha,
        num_unet_layers=NUM_UNET_LAYERS,
        num_view_cond_dims=num_view_cond_dims,
        num_view_tokens=num_view_tokens,
        ti_init_embed=ti_init_embed)
    t = jnp.zeros((1,), jnp.float32)
    l = jnp.zeros((1,), jnp.float32)
    vp = (jnp.zeros((1, num_view_cond_dims), jnp.float32)
          if embedding_type == "view" and num_view_cond_dims else None)
    vr = jnp.zeros((1,), jnp.int32) if embedding_type == "view" else None
    variables = m.init({"params": jax.random.PRNGKey(cfg.seed)}, t, l,
                       view_params=vp, view_rows=vr)
    return m, variables.get("params"), variables.get("constants")


def build_models(cfg: RunConfig, tokenizer,
                 placeholder_view_tokens: List[str],
                 placeholder_object_tokens: List[str],
                 arch: Optional[SDArch] = None,
                 compute_dtype: jnp.dtype = jnp.float32,
                 init_rng: Optional[jax.Array] = None,
                 calibration_dir: Optional[str] = None) -> BuiltModels:
    """Initialize the whole stack for a learnable_mode (0/1/2/3/4/5)."""
    mode = cfg.learnable_mode
    arch = arch or resolve_arch(cfg.model.pretrained_model_name_or_path,
                                cfg.model.word_embedding_dim)
    rng = init_rng if init_rng is not None else jax.random.PRNGKey(cfg.seed)
    r_clip, r_unet, r_vae = jax.random.split(rng, 3)

    # ---- CLIP ---------------------------------------------------------
    clip = NeTICLIPTextEncoder(arch.text, dtype=compute_dtype)
    L = arch.text.max_position_embeddings
    dummy_ids = jnp.zeros((1, L), jnp.int32)
    clip_vars = clip.init(r_clip, dummy_ids)
    clip_params = jax.device_get(clip_vars["params"])

    # grow vocab + init placeholder rows + target norms
    (table, all_ids, view_ids, object_ids, norms_obj,
     norm_view) = add_concept_tokens(
        cfg, tokenizer, placeholder_view_tokens, placeholder_object_tokens,
        np.asarray(clip_params["token_embedding"]))
    clip_params["token_embedding"] = table
    clip_vars = {"params": jax.tree_util.tree_map(jnp.asarray, clip_params)}

    # ---- view table ------------------------------------------------------
    view_table = None
    num_cond = 0
    if placeholder_view_tokens:
        view_table = build_view_token_table(
            placeholder_view_tokens, view_ids,
            calibration_dir=calibration_dir)
        num_cond = view_table.num_cond_dims

    # ---- mappers ---------------------------------------------------------
    trainable: Dict[str, Any] = {}
    obj_mapper = obj_consts = None
    obj_norm_scales = None
    if mode in (0, 2, 3, 4, 5) and placeholder_object_tokens:
        init_embed = None
        if cfg.model.original_ti:
            init_embed = table[object_ids[0]]
        obj_mapper, p0, obj_consts = _init_mapper(
            cfg, "object", arch, 0,
            normalize=cfg.model.normalize_object_mapper_output,
            output_bypass=cfg.model.output_bypass_object,
            bypass_unconstrained=cfg.model.bypass_unconstrained_object,
            alpha=cfg.model.output_bypass_alpha_object,
            ti_init_embed=init_embed)
        # stack N object mappers (mode 3: per-scene; else N=1) with
        # distinct init keys per slice
        n_obj = len(placeholder_object_tokens)
        stacked = [p0]
        for i in range(1, n_obj):
            _, pi, _ = _init_mapper(
                dataclasses.replace(cfg, seed=cfg.seed + 1000 + i),
                "object", arch, 0,
                normalize=cfg.model.normalize_object_mapper_output,
                output_bypass=cfg.model.output_bypass_object,
                bypass_unconstrained=cfg.model.bypass_unconstrained_object,
                alpha=cfg.model.output_bypass_alpha_object,
                ti_init_embed=(table[object_ids[i]]
                               if cfg.model.original_ti else None))
            stacked.append(pi)
        trainable["object"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *stacked)
        if cfg.model.normalize_object_mapper_output:
            obj_norm_scales = jnp.asarray(norms_obj, jnp.float32)

    view_mapper = view_consts = None
    view_norm_scale = None
    if mode in (1, 2, 3, 4, 5) and placeholder_view_tokens:
        view_mapper, vparams, view_consts = _init_mapper(
            cfg, "view", arch, num_cond,
            normalize=cfg.model.normalize_view_mapper_output,
            output_bypass=cfg.model.output_bypass_view,
            bypass_unconstrained=cfg.model.bypass_unconstrained_view,
            alpha=cfg.model.output_bypass_alpha_view,
            num_view_tokens=len(placeholder_view_tokens),
            ti_init_embed=(table[view_ids[0]]
                           if cfg.model.original_ti else None))
        trainable["view"] = vparams
        if cfg.model.normalize_view_mapper_output and norm_view:
            view_norm_scale = jnp.asarray(norm_view, jnp.float32)

    # ---- frozen UNet + VAE -------------------------------------------------
    unet = UNet2DCondition(arch.unet, dtype=compute_dtype)
    H = 8 if arch.unet.block_out_channels[0] < 128 else 64
    dummy_lat = jnp.zeros((1, H, H, arch.unet.in_channels), compute_dtype)
    dummy_ctx = jnp.zeros(
        (NUM_UNET_LAYERS, 1, L, arch.unet.cross_attention_dim),
        compute_dtype)
    unet_vars = jax.jit(unet.init)(r_unet, dummy_lat, jnp.zeros((1,)),
                                   dummy_ctx, dummy_ctx)

    vae = AutoencoderKL(arch.vae, dtype=compute_dtype)
    dummy_img = jnp.zeros((1, 2 ** (len(arch.vae.channel_mults) + 1),
                           2 ** (len(arch.vae.channel_mults) + 1), 3),
                          compute_dtype)
    vae_vars = jax.jit(vae.init)(r_vae, dummy_img, jax.random.PRNGKey(0))

    schedule = DDPMSchedule(prediction_type=arch.prediction_type)

    text_models = TextModels(
        clip=clip, clip_vars=clip_vars,
        obj_mapper=obj_mapper, obj_constants=obj_consts,
        view_mapper=view_mapper, view_constants=view_consts,
        view_table_ids=(jnp.asarray(view_table.token_ids)
                        if view_table else None),
        view_table_params=(jnp.asarray(view_table.params_scaled())
                           if view_table else None),
        obj_norm_scales=obj_norm_scales,
        view_norm_scale=view_norm_scale,
        original_ti=cfg.model.original_ti)

    frozen = FrozenModels(text=text_models, unet=unet, unet_vars=unet_vars,
                          vae=vae, vae_vars=vae_vars, schedule=schedule)
    return BuiltModels(
        frozen=frozen, trainable=trainable, arch=arch, tokenizer=tokenizer,
        placeholder_token_ids=all_ids,
        placeholder_object_token_ids=object_ids,
        placeholder_view_token_ids=view_ids,
        view_table=view_table,
        target_norm_object=norms_obj or None,
        target_norm_view=norm_view)


def resolve_fuse_conv(flag) -> bool:
    """Resolve OptimConfig.fuse_conv: None = auto (fuse when lowering for
    a real TPU; CPU keeps the unfused XLA path — the Pallas interpreter
    would dominate test/dev runtime)."""
    if flag is not None:
        return bool(flag)
    from view_neti_tpu.ops.fused_conv import _default_interpret
    return not _default_interpret()


def fuse_for_inference(frozen, unet: bool = False):
    """A FrozenModels view whose VAE (and optionally UNet) runs the fused
    norm+silu+conv3x3 Pallas kernel (ops/fused_conv.py).

    Param trees are identical between the fused and unfused modules, so
    the SAME unet_vars/vae_vars serve both — only the static module defs
    are swapped. The kernel is forward-only: use this view exclusively on
    inference paths (the denoise loop, VAE decode, the validation sweep).

    unet=False by default: fusing the UNet's conv blocks inside the
    30-step denoise fori_loop REGRESSED whole-program inference on the
    real chip (1.54 -> 1.76 s/img, 65.2 -> 56.9 TFLOP/s, r5) even though
    the standalone per-site profile showed the 640-channel level winning
    +11% (tools/profile_fused_conv.py) — and the fused validation sweep
    failed to complete inside a 50-min budget. Pass unet=True only for
    profiling experiments."""
    import dataclasses as _dc
    vae = AutoencoderKL(
        _dc.replace(frozen.vae.config, fuse_conv=True),
        dtype=frozen.vae.dtype)
    out = _dc.replace(frozen, vae=vae)
    if unet:
        out = _dc.replace(out, unet=UNet2DCondition(
            _dc.replace(frozen.unet.config, fuse_conv=True),
            dtype=frozen.unet.dtype))
    return out


def fuse_vae_for_training(frozen):
    """A FrozenModels view with only the VAE fused — the same view
    fuse_for_inference builds by default. The train step's VAE encode is
    wrapped in stop_gradient (train_step.py:150), so the forward-only
    kernel is safe there while the UNet stays differentiable."""
    return fuse_for_inference(frozen)


def trainable_mask_keys(mode: int) -> Tuple[tuple, tuple]:
    """(stacked_keys, frozen_keys) for the optimizer per learnable mode.

    object trains in modes 0/2/3/4/5; view trains in 1/2/3/4 and is frozen
    in 5 (reference coach.py:656-669, 735-749).
    """
    frozen = ()
    if mode == 5:
        frozen = ("view",)
    if mode == 1:
        frozen = ("object",)
    return ("object",), frozen
