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


def flax_from_torch_state(sd: Dict[str, Any]
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, constants) Flax trees from a reference mapper state_dict.

    Handles every mapper family the reference ships: arch-15
    Fourier mappers (view + object), legacy object mappers
    (use_positional_encoding 0/1, arch<=14), and original-TI
    (reference neti_mapper.py:140-163, 580-608).
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
        if "encoder.w" in sd:
            constants["neti_w"] = _np(sd["encoder.w"])
    elif "encoder.w" in sd:
        # arch-15: FourierPositionalEncodingNDims, (dim//2, nfeats) —
        # identical orientation to make_fourier_freqs
        constants["fourier_w"] = _np(sd["encoder.w"])
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
    for key, entry in ckpt["mappers"].items():
        params, constants = flax_from_torch_state(entry["state_dict"])
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
