"""Import the reference's torch checkpoints (VERDICT r3 missing #1).

The published ViewNeTI artifacts are torch pickles:

  mapper-steps-N_{view,object}.pt   — {"cfg": pyrallis.encode(RunConfig),
        "mappers": {token_id|'dummy_key': {"state_dict": OrderedDict,
        "encoder": <pickled nn.Module!>, "placeholder_object_token": str}}}
        (reference checkpoint_handler.py:57-97)
  learned_embeds-steps-N.bin        — {token_str: torch.Tensor row}
        (reference checkpoint_handler.py:40-55)

This module converts them to this framework's msgpack checkpoints so the
reference's reusable pretrained view-mappers (modes 4/5,
reference training/pretrained_models.py:1-5, config.py:288-293) work here
WITHOUT re-running the 50k-step pretraining:

  * torch state_dict -> Flax param tree (Linear weight transposed to a
    Dense kernel; LayerNorm weight -> scale),
  * the torch-seeded Fourier/NeTI frequency matrix is recovered from the
    state_dict's ``encoder.w`` into the 'constants' collection (JAX PRNG
    cannot reproduce torch.manual_seed streams — SURVEY.md §7.3.3),
  * the embedded reference config is cleaned + re-encoded through this
    framework's pyrallis-compatible config.

Unpickling the reference's checkpoint needs its module layout
(``models.positional_encoding``) importable; ``_install_unpickle_shims``
registers bare stand-in classes (pickle restores instance state without
calling __init__), so no reference code is imported or executed.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from view_neti_tpu import config as config_lib
from view_neti_tpu.checkpoint import clean_config_dict

# torch Sequential index -> our Flax submodule name
# (reference neti_mapper.py:149-153/604-608: Linear, LayerNorm, LeakyReLU,
#  Linear, LayerNorm, LeakyReLU; activations hold no params)
_NET_RENAME = (("net.0", "net_dense0", "dense"),
               ("net.1", "net_ln0", "ln"),
               ("net.3", "net_dense1", "dense"),
               ("net.4", "net_ln1", "ln"))


def _install_unpickle_shims() -> None:
    """Make the reference's pickled encoder modules loadable.

    torch.save pickles whole nn.Modules for the 'encoder' entries
    (reference checkpoint_handler.py:70-71,85); restoring them needs
    classes at ``models.positional_encoding.<Name>``. Bare nn.Module
    subclasses suffice: pickle protocol 2 restores __dict__ state without
    calling __init__, and we only read tensors out of the result.
    """
    import torch

    mod_name = "models.positional_encoding"
    if mod_name in sys.modules:
        return
    pkg = sys.modules.get("models")
    if pkg is None:
        pkg = types.ModuleType("models")
        pkg.__path__ = []          # mark as package for pickle imports
        sys.modules["models"] = pkg
    mod = types.ModuleType(mod_name)
    for cls_name in ("NeTIPositionalEncoding", "BasicEncoder",
                     "PositionalEncoding", "FourierPositionalEncoding",
                     "FourierPositionalEncodingNDims"):
        cls = type(cls_name, (torch.nn.Module,), {"__module__": mod_name})
        setattr(mod, cls_name, cls)
    sys.modules[mod_name] = mod
    setattr(pkg, "positional_encoding", mod)


def load_torch_checkpoint(path: Path) -> Dict[str, Any]:
    """torch.load with the unpickle shims installed (pickled modules force
    weights_only=False; the file is trusted user input, same as the
    reference's own torch.load at checkpoint_handler.py:140)."""
    import torch

    _install_unpickle_shims()
    try:
        return torch.load(str(path), map_location="cpu",
                          weights_only=False)
    except TypeError:              # older torch without weights_only
        return torch.load(str(path), map_location="cpu")


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _encoder_w(sd: Dict[str, Any], encoder) -> Optional[np.ndarray]:
    """Recover the positional-encoder frequency matrix from a reference
    checkpoint entry.

    In checkpoints saved on CUDA machines (all published ViewNeTI
    artifacts), ``encoder.w`` is NOT in the state_dict: the reference
    assigns ``self.w = nn.Parameter(self.w).cuda()``
    (positional_encoding.py:171) and ``Parameter.cuda()`` returns a plain
    Tensor, demoting ``w`` to an unregistered attribute. The frequencies
    then travel only inside the pickled encoder module's ``__dict__``
    (checkpoint_handler.py:70-71,85) — or are recoverable by replaying the
    reference's deterministic construction (``torch.manual_seed(seed)``
    then ``randn(dim//2, nfeats) * sigmas``, positional_encoding.py:164-171
    with seed pinned to 0 for arch 15, neti_mapper.py:517-518). CPU-saved
    checkpoints keep ``w`` registered, so the state_dict is preferred.
    """
    if "encoder.w" in sd:
        return _np(sd["encoder.w"])
    if encoder is None:
        return None
    w = getattr(encoder, "w", None)
    if w is not None:
        return _np(w)
    sigmas = getattr(encoder, "sigmas", None)
    dim = getattr(encoder, "dim", None)
    if sigmas is None or dim is None:
        return None
    import torch

    torch.manual_seed(0)
    w = torch.randn((int(dim) // 2, len(sigmas)))
    for i, s in enumerate(sigmas):
        w[:, i] *= s
    return _np(w)


def flax_from_torch_state(sd: Dict[str, Any], encoder=None
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, constants) Flax trees from a reference mapper state_dict.

    Handles every mapper family the reference ships: arch-15
    Fourier mappers (view + object), legacy object mappers
    (use_positional_encoding 0/1, arch<=14), and original-TI
    (reference neti_mapper.py:140-163, 580-608). ``encoder`` is the
    checkpoint entry's pickled encoder module, consulted for the frequency
    matrix when the state_dict lacks it (see _encoder_w).
    """
    sd = {k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    constants: Dict[str, Any] = {}

    if "ti_embeddings" in sd:      # original-TI escape hatch
        params["ti_embeddings"] = _np(sd["ti_embeddings"])
        return params, constants

    if "input_layer.weight" in sd:
        # legacy PE-1 object mapper: NeTI anchor encoder + input layer
        params["input_layer"] = {
            "kernel": _np(sd["input_layer.weight"]).T,
            "bias": _np(sd["input_layer.bias"])}
        w = _encoder_w(sd, encoder)
        if w is not None:
            constants["neti_w"] = w
    else:
        # arch-15: FourierPositionalEncodingNDims, (dim//2, nfeats) —
        # identical orientation to make_fourier_freqs
        w = _encoder_w(sd, encoder)
        if w is not None:
            constants["fourier_w"] = w
    # (BasicEncoder's normalized_timesteps/unet_layers parameters are
    #  recomputed closed-form here; drop them)

    for tname, fname, kind in _NET_RENAME:
        w, b = sd[f"{tname}.weight"], sd[f"{tname}.bias"]
        if kind == "dense":
            params[fname] = {"kernel": _np(w).T, "bias": _np(b)}
        else:
            params[fname] = {"scale": _np(w), "bias": _np(b)}
    params["output_layer"] = {
        "kernel": _np(sd["output_layer.0.weight"]).T,
        "bias": _np(sd["output_layer.0.bias"])}
    return params, constants


def _convert_cfg(raw_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Reference pyrallis-encoded cfg -> this framework's canonical
    encoding (round-trips through our decoder so downstream load_mapper
    semantics are identical to a native checkpoint)."""
    cleaned = clean_config_dict(dict(raw_cfg))
    cfg = config_lib.decode(config_lib.RunConfig, cleaned)
    return config_lib.encode(cfg)


def convert_mapper_checkpoint(path: Path, embedding_type: str
                              ) -> Dict[str, Any]:
    """Reference mapper-steps-N_{view,object}.pt -> our msgpack payload.

    View checkpoints collapse the reference's {'dummy_key': ...} level
    into our single 'view' entry; object checkpoints re-key the
    token_id-keyed dict by token STRING (ids are tokenizer-dependent;
    reference load_mapper rebuilds the id mapping the same way,
    checkpoint_handler.py:183-186).
    """
    assert embedding_type in ("view", "object"), embedding_type
    ckpt = load_torch_checkpoint(path)
    payload: Dict[str, Any] = {"cfg": _convert_cfg(ckpt["cfg"]),
                               "mappers": {},
                               "source": f"torch-import:{Path(path).name}"}
    arch = int(ckpt["cfg"].get("model", {}).get("arch_view_net", 15))
    for key, entry in ckpt["mappers"].items():
        params, constants = flax_from_torch_state(
            entry["state_dict"], encoder=entry.get("encoder"))
        if (arch >= 15 and "ti_embeddings" not in params
                and "fourier_w" not in constants):
            raise ValueError(
                f"cannot recover the Fourier frequency matrix for mapper "
                f"{key!r} in {path}: encoder.w is absent from the "
                f"state_dict AND the pickled encoder (expected for "
                f"arch_view_net={arch} — reference neti_mapper.py:517-518)")
        tok = entry.get("placeholder_object_token", "")
        out_key = "view" if embedding_type == "view" else str(tok)
        payload["mappers"][out_key] = {
            "params": params,
            "constants": constants,
            "placeholder_object_token": "" if embedding_type == "view"
            else str(tok),
        }
    if embedding_type == "view":
        payload["view_tokens"] = []      # regenerated from calibration at
        payload["view_token_ids"] = []   # load time (builder/inference_dtu)
    return payload


def convert_learned_embeds(path: Path) -> Dict[str, np.ndarray]:
    """learned_embeds-steps-N.bin ({token: tensor}) -> {token: float32 row}
    (reference checkpoint_handler.py:40-55)."""
    ckpt = load_torch_checkpoint(path)
    return {str(tok): _np(row) for tok, row in ckpt.items()}


def import_torch_artifacts(out_dir: Path,
                           view_path: Optional[Path] = None,
                           object_path: Optional[Path] = None,
                           embeds_path: Optional[Path] = None,
                           iteration: Optional[int] = None) -> List[Path]:
    """Write this framework's msgpack checkpoints next to each other in
    out_dir, named so training (model.pretrained_view_mapper) and offline
    inference (mapper-steps-N_*.msgpack) both find them."""
    from flax import serialization

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: List[Path] = []

    def _iter_of(p: Path) -> str:
        if iteration is not None:
            return str(iteration)
        stem = Path(p).stem            # mapper-steps-N_view
        for part in stem.replace("_", "-").split("-"):
            if part.isdigit():
                return part
        return "0"

    if view_path is not None:
        payload = convert_mapper_checkpoint(Path(view_path), "view")
        out = out_dir / f"mapper-steps-{_iter_of(view_path)}_view.msgpack"
        out.write_bytes(serialization.msgpack_serialize(payload))
        written.append(out)
    if object_path is not None:
        payload = convert_mapper_checkpoint(Path(object_path), "object")
        out = out_dir / (f"mapper-steps-{_iter_of(object_path)}"
                         "_object.msgpack")
        out.write_bytes(serialization.msgpack_serialize(payload))
        written.append(out)
    if embeds_path is not None:
        embeds = convert_learned_embeds(Path(embeds_path))
        out = out_dir / (f"learned_embeds-steps-{_iter_of(embeds_path)}"
                         ".msgpack")
        out.write_bytes(serialization.msgpack_serialize(embeds))
        written.append(out)
    return written


# ---------------------------------------------------------------------------
# Export: this framework's msgpack checkpoints -> the reference's torch
# formats, so mappers trained HERE run in the published ViewNeTI tooling
# (the reverse of import_torch_artifacts; completes CheckpointHandler
# interchange in both directions).
# ---------------------------------------------------------------------------

# Reference RunConfig field inventory (parity DATA — reference
# training/config.py:11-293, extracted field-by-field). The reference loads
# exported configs with a strict pyrallis.decode (checkpoint_handler.py:142),
# so this framework's extension fields (the parallel section,
# log.{checkpoint_backend,resume_from}, data.{tokenizer_path,device_augment,
# placeholder_view_tokens}, eval.{validation_view_tokens,
# do_t2i_generalization,max_validation_failures},
# optim.{fuse_accumulation,steps_per_dispatch}) must be stripped on export.
_REF_CFG_FIELDS: Dict[str, frozenset] = {
    "log": frozenset({
        "exp_name", "overwrite_ok", "exp_dir", "save_steps", "logging_dir",
        "report_to", "checkpoints_total_limit", "save_dataset_images"}),
    "data": frozenset({
        "train_data_dir", "train_data_subsets", "placeholder_object_token",
        "super_category_object_token", "super_category_view_token",
        "placeholder_object_tokens", "super_category_object_tokens",
        "fixed_object_token_or_path", "dataloader_num_workers", "repeats",
        "resolution", "dtu_preprocess_key", "center_crop", "flip_p",
        "caption_strategy", "camera_representation", "dtu_lighting",
        "dtu_subset", "augmentation_key"}),
    "model": frozenset({
        "pretrained_model_name_or_path", "pretrained_view_mapper",
        "pretrained_view_mapper_key", "word_embedding_dim",
        "arch_mlp_hidden_dims", "use_nested_dropout", "nested_dropout_prob",
        "normalize_object_mapper_output", "normalize_view_mapper_output",
        "target_norm_object", "target_norm_view",
        "use_positional_encoding_object", "use_positional_encoding_view",
        "pe_sigmas", "pe_sigma_exp_key", "pe_t_exp_key", "pe_l_exp_key",
        "pe_sigmas_view", "num_pe_time_anchors", "output_bypass_object",
        "output_bypass_view", "revision", "mapper_checkpoint_path",
        "arch_view_net", "arch_view_mix_streams", "arch_view_disable_tl",
        "original_ti", "bypass_unconstrained_object",
        "bypass_unconstrained_view", "output_bypass_alpha_view",
        "output_bypass_alpha_object"}),
    "eval": frozenset({
        "validation_prompts", "num_validation_images", "validation_seeds",
        "validation_steps", "num_denoising_steps", "dtu_upsample_key",
        "eval_placeholder_object_tokens"}),
    "optim": frozenset({
        "max_train_steps", "learning_rate", "scale_lr", "train_batch_size",
        "gradient_checkpointing", "gradient_accumulation_steps", "seed",
        "lr_scheduler", "lr_warmup_steps", "adam_beta1", "adam_beta2",
        "adam_weight_decay", "adam_epsilon", "mixed_precision",
        "allow_tf32"}),
}
_REF_CFG_TOP = frozenset({"learnable_mode", "debug", "seed",
                          "log", "data", "model", "eval", "optim"})


def reference_cfg_dict(cfg_enc: Dict[str, Any]) -> Dict[str, Any]:
    """Filter this framework's encoded RunConfig down to the reference's
    exact field surface (reference training/config.py:11-293)."""
    out: Dict[str, Any] = {}
    for k, v in cfg_enc.items():
        if k not in _REF_CFG_TOP:
            continue
        if isinstance(v, dict) and k in _REF_CFG_FIELDS:
            out[k] = {fk: fv for fk, fv in v.items()
                      if fk in _REF_CFG_FIELDS[k]}
        else:
            out[k] = v
    return out


def torch_state_from_flax(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of flax_from_torch_state: Flax param tree -> the exact
    state_dict key set a reference NeTIMapper registers.

    ``encoder.w`` is deliberately NOT emitted: in the reference module the
    frequency matrix is demoted to an unregistered attribute by the
    ``nn.Parameter(...).cuda()`` idiom (positional_encoding.py:171), so a
    strict ``load_state_dict`` (checkpoint_handler.py:210) would reject the
    key. The frequencies ride in the pickled encoder instead (and, for
    arch 15, are reproduced by the reference's own seed-0 construction,
    neti_mapper.py:517-518).
    """
    import torch

    def _t(a) -> "torch.Tensor":
        # copy=True: msgpack-loaded arrays are read-only views, which
        # torch.from_numpy rejects (non-writable tensor warning)
        return torch.from_numpy(np.array(a, copy=True))

    sd: Dict[str, Any] = {}
    if "ti_embeddings" in params:      # original-TI (neti_mapper.py:140-145)
        sd["ti_embeddings"] = _t(params["ti_embeddings"])
        return sd
    if "input_layer" in params:        # legacy arch<=14 (neti_mapper.py:108)
        sd["input_layer.weight"] = _t(params["input_layer"]["kernel"]).T
        sd["input_layer.bias"] = _t(params["input_layer"]["bias"])
    for tname, fname, kind in _NET_RENAME:
        leaf = params[fname]
        if kind == "dense":
            sd[f"{tname}.weight"] = _t(leaf["kernel"]).T.contiguous()
            sd[f"{tname}.bias"] = _t(leaf["bias"])
        else:
            sd[f"{tname}.weight"] = _t(leaf["scale"])
            sd[f"{tname}.bias"] = _t(leaf["bias"])
    sd["output_layer.0.weight"] = _t(
        params["output_layer"]["kernel"]).T.contiguous()
    sd["output_layer.0.bias"] = _t(params["output_layer"]["bias"])
    return sd


def _sigmas_for(cfg, n_feats: int) -> List[float]:
    """The reference's sigma list in construction order
    (neti_mapper.py:486-503): [sigma_t, sigma_l] + pose sigmas by
    deg_freedom, inferred here from the frequency-matrix width."""
    ps = cfg.model.pe_sigmas
    base = [float(ps.sigma_t), float(ps.sigma_l)]
    if n_feats == 2:                 # object mapper: (t, l) only
        return base
    if n_feats == 3:                 # view, deg_freedom == "phi"
        return base + [float(ps.sigma_phi)]
    if n_feats == 4:                 # view, "theta-phi"
        return base + [float(ps.sigma_theta), float(ps.sigma_phi)]
    return base + [float(ps.sigma_dtu12)] * (n_feats - 2)   # "dtu-12d"


def make_torch_encoder(constants: Dict[str, Any], cfg) -> Any:
    """A pickled-encoder stand-in matching what the reference's
    ``save_mapper`` embeds (checkpoint_handler.py:70-71,85).

    The instance is of the shim ``models.positional_encoding`` class, so
    the pickle stream names the class path the reference resolves to its
    REAL module; instance attributes mirror the reference constructor's
    (positional_encoding.py:153-171 / 10-41) with ``w`` as a plain tensor
    — the same demoted state a CUDA-saved reference checkpoint carries.
    """
    import torch

    _install_unpickle_shims()
    import models.positional_encoding as pe_mod

    if "fourier_w" in constants:
        w = np.asarray(constants["fourier_w"], np.float32)
        enc = pe_mod.FourierPositionalEncodingNDims()
        enc.sigmas = _sigmas_for(cfg, w.shape[1])
        enc.dim = int(w.shape[0]) * 2
        enc.normalize = False
        enc.w = torch.from_numpy(w)
        return enc
    if "neti_w" in constants:
        w = np.asarray(constants["neti_w"], np.float32)
        enc = pe_mod.NeTIPositionalEncoding()
        enc.sigma_t = float(cfg.model.pe_sigmas.sigma_t)
        enc.sigma_l = float(cfg.model.pe_sigmas.sigma_l)
        enc.num_w = int(w.shape[0])
        enc.w = torch.from_numpy(w)
        return enc
    # PE-0 anchors are closed-form (reference positional_encoding.py:57-68)
    enc = pe_mod.BasicEncoder()
    enc.normalized_timesteps = (torch.arange(1000) / 999.0) * 2 - 1
    enc.normalized_unet_layers = (torch.arange(16) / 15.0) * 2 - 1
    return enc


def export_mapper_checkpoint(path: Path, embedding_type: str
                             ) -> Dict[str, Any]:
    """This framework's mapper-steps-N_{view,object}.msgpack -> the
    reference save_mapper payload shape (checkpoint_handler.py:57-97).

    Object entries are keyed by synthetic token ids (the reference's
    ``load_mapper`` iterates keys but maps token->id from its OWN
    tokenizer, checkpoint_handler.py:183-186, so the numeric keys are
    never dereferenced); the view entry keeps the reference's
    ``dummy_key``.
    """
    from view_neti_tpu.checkpoint import CheckpointHandler

    assert embedding_type in ("view", "object"), embedding_type
    cfg, payload = CheckpointHandler.load_mapper(Path(path))
    out: Dict[str, Any] = {"cfg": reference_cfg_dict(payload["cfg"]),
                           "mappers": {}}
    first_added_id = 49408           # CLIP vocab size; added tokens follow
    for i, (key, entry) in enumerate(sorted(payload["mappers"].items())):
        sd = torch_state_from_flax(entry["params"])
        enc = make_torch_encoder(entry.get("constants") or {}, cfg)
        if embedding_type == "view":
            out_key: Any = "dummy_key"
            tok = "dummy"
        else:
            out_key = first_added_id + i
            tok = str(entry.get("placeholder_object_token") or key)
        out["mappers"][out_key] = {"state_dict": sd, "encoder": enc,
                                   "placeholder_object_token": tok}
    return out


def export_learned_embeds(path: Path) -> Dict[str, Any]:
    """learned_embeds msgpack -> the reference .bin payload
    ({token: torch row}, checkpoint_handler.py:40-55)."""
    import torch

    from view_neti_tpu.checkpoint import CheckpointHandler

    embeds = CheckpointHandler.load_learned_embeds(Path(path))
    return {str(t): torch.from_numpy(np.asarray(r, np.float32))
            for t, r in embeds.items()}


def export_torch_artifacts(out_dir: Path,
                           view_path: Optional[Path] = None,
                           object_path: Optional[Path] = None,
                           embeds_path: Optional[Path] = None,
                           iteration: Optional[int] = None) -> List[Path]:
    """Write reference-format torch artifacts from this framework's
    msgpack checkpoints (mirror of import_torch_artifacts)."""
    import torch

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: List[Path] = []

    def _iter_of(p: Path) -> str:
        if iteration is not None:
            return str(iteration)
        for part in Path(p).stem.replace("_", "-").split("-"):
            if part.isdigit():
                return part
        return "0"

    if view_path is not None:
        payload = export_mapper_checkpoint(Path(view_path), "view")
        out = out_dir / f"mapper-steps-{_iter_of(view_path)}_view.pt"
        torch.save(payload, str(out))
        written.append(out)
    if object_path is not None:
        payload = export_mapper_checkpoint(Path(object_path), "object")
        out = out_dir / f"mapper-steps-{_iter_of(object_path)}_object.pt"
        torch.save(payload, str(out))
        written.append(out)
    if embeds_path is not None:
        embeds = export_learned_embeds(Path(embeds_path))
        out = out_dir / f"learned_embeds-steps-{_iter_of(embeds_path)}.bin"
        torch.save(embeds, str(out))
        written.append(out)
    return written


def maybe_import_view_mapper(path: Path) -> Path:
    """Transparent .pt ingestion for model.pretrained_view_mapper: a torch
    view-mapper path is converted (once, cached next to the source) and
    the msgpack path returned; msgpack paths pass through."""
    path = Path(path)
    if path.suffix not in (".pt", ".bin", ".pth"):
        return path
    cache = path.with_suffix(".msgpack")
    if not cache.exists() or (cache.stat().st_mtime
                              < path.stat().st_mtime):
        from flax import serialization
        payload = convert_mapper_checkpoint(path, "view")
        cache.write_bytes(serialization.msgpack_serialize(payload))
    return cache
