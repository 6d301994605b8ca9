"""Checkpoint save/load: learned embeds + mapper states + config.

Semantic parity with /root/reference/checkpoint_handler.py:18-267, with the
formats redesigned for a functional JAX stack (msgpack via
flax.serialization instead of torch pickles — the reference pickles whole
nn.Modules, checkpoint_handler.py:63-97, which we deliberately avoid):

  learned_embeds-steps-N.msgpack : {token_str: (D,) float32 row}
  mapper-steps-N_object.msgpack  : {"cfg": <encoded RunConfig>,
                                    "mappers": {token_str_or_'view': {
                                       "params": <pytree>,
                                       "constants": <pytree>,     # PE freqs
                                       "placeholder_object_token": str}},
                                    "view_tokens": [...],         # view ckpt
                                    "view_token_ids": [...],
                                    "view_table": {...}}          # bounds

Checkpoints double as the interchange format: validation/inference reload
from these files (reference training/inference_dtu.py:118-199), and the view
checkpoint is the reusable pretrained artifact for modes 4/5.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from view_neti_tpu import config as config_lib
from view_neti_tpu.models.view_tokens import ViewTokenTable


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointHandler:
    def __init__(self, cfg, placeholder_view_tokens: List[str],
                 placeholder_view_token_ids: List[int],
                 placeholder_object_tokens: List[str],
                 placeholder_object_token_ids: List[int],
                 save_root: Path):
        self.cfg = cfg
        self.placeholder_view_tokens = placeholder_view_tokens
        self.placeholder_view_token_ids = placeholder_view_token_ids
        self.placeholder_object_tokens = placeholder_object_tokens
        self.placeholder_object_token_ids = placeholder_object_token_ids
        self.save_root = Path(save_root)
        self.save_root.mkdir(parents=True, exist_ok=True)

    # -- learned embeds (reference checkpoint_handler.py:40-55) -----------
    def save_learned_embeds(self, token_table: np.ndarray,
                            save_name: str) -> Path:
        tokens = (self.placeholder_view_tokens
                  + self.placeholder_object_tokens)
        ids = (self.placeholder_view_token_ids
               + self.placeholder_object_token_ids)
        payload = {t: np.asarray(token_table[i], np.float32)
                   for t, i in zip(tokens, ids)}
        path = self.save_root / save_name
        path.write_bytes(serialization.msgpack_serialize(payload))
        return path

    # -- mappers (reference checkpoint_handler.py:57-97) -------------------
    def save_mapper(self, trainable: Dict[str, Any],
                    obj_constants: Any, view_constants: Any,
                    view_table: Optional[ViewTokenTable],
                    save_name: str) -> List[Path]:
        """Writes mapper-...-object.msgpack and/or _view.msgpack."""
        cfg_enc = config_lib.encode(self.cfg)
        paths = []
        if trainable.get("object") is not None:
            stacked = _to_host(trainable["object"])
            mappers = {}
            for i, tok in enumerate(self.placeholder_object_tokens):
                mappers[tok] = {
                    "params": jax.tree_util.tree_map(lambda a, i=i: a[i],
                                                     stacked),
                    "constants": _to_host(obj_constants),
                    "placeholder_object_token": tok,
                }
            payload = {"cfg": cfg_enc, "mappers": mappers}
            p = self.save_root / save_name.replace(".msgpack",
                                                   "_object.msgpack")
            p.write_bytes(serialization.msgpack_serialize(payload))
            paths.append(p)
        if trainable.get("view") is not None:
            payload = {
                "cfg": cfg_enc,
                "mappers": {"view": {
                    "params": _to_host(trainable["view"]),
                    "constants": _to_host(view_constants),
                    "placeholder_object_token": "",
                }},
                "view_tokens": list(self.placeholder_view_tokens),
                "view_token_ids": [int(i) for i in
                                   self.placeholder_view_token_ids],
            }
            if view_table is not None:
                payload["view_table"] = {
                    "mins": np.asarray(view_table.mins),
                    "maxs": np.asarray(view_table.maxs),
                    "deg_freedom": view_table.deg_freedom,
                    "params_raw": np.asarray(view_table.params_raw),
                }
            p = self.save_root / save_name.replace(".msgpack",
                                                   "_view.msgpack")
            p.write_bytes(serialization.msgpack_serialize(payload))
            paths.append(p)
        return paths

    def save_model(self, trainable, obj_constants, view_constants,
                   view_table, token_table, embeds_save_name: str,
                   mapper_save_name: str) -> None:
        """Both artifacts, as the reference's save_model (coach.py:237-243)."""
        self.save_learned_embeds(np.asarray(token_table), embeds_save_name)
        self.save_mapper(trainable, obj_constants, view_constants,
                         view_table, mapper_save_name)

    # -- loading ----------------------------------------------------------
    @staticmethod
    def load_raw(path: Path) -> Dict[str, Any]:
        return serialization.msgpack_restore(Path(path).read_bytes())

    @staticmethod
    def load_mapper(path: Path) -> Tuple[Any, Dict[str, Any]]:
        """Returns (decoded RunConfig, payload dict).

        The saved cfg round-trips through clean_config_dict semantics
        (reference checkpoint_handler.py:99-127): runtime-poisoned keys are
        stripped before decoding.
        """
        payload = CheckpointHandler.load_raw(path)
        cfg_dict = clean_config_dict(payload["cfg"])
        cfg = config_lib.decode(config_lib.RunConfig, cfg_dict)
        return cfg, payload

    @staticmethod
    def load_learned_embeds(path: Path) -> Dict[str, np.ndarray]:
        return CheckpointHandler.load_raw(path)

    @staticmethod
    def restore_view_table(payload: Dict[str, Any]) -> ViewTokenTable:
        vt = payload["view_table"]
        return ViewTokenTable(
            tokens=tuple(payload["view_tokens"]),
            token_ids=np.asarray(payload["view_token_ids"], np.int32),
            params_raw=np.asarray(vt["params_raw"], np.float32),
            mins=np.asarray(vt["mins"], np.float32),
            maxs=np.asarray(vt["maxs"], np.float32),
            deg_freedom=str(vt["deg_freedom"]))


def clean_config_dict(cfg_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip runtime-computed keys so a saved config decodes cleanly
    (reference checkpoint_handler.py:99-127)."""
    out = {}
    runtime_keys = {"placeholder_view_tokens", "target_norm_object",
                    "target_norm_view"}
    for k, v in cfg_dict.items():
        if k in runtime_keys:
            continue
        if isinstance(v, dict):
            out[k] = clean_config_dict(v)
        elif v is None:
            continue
        else:
            out[k] = v
    return out


def apply_learned_embeds_to_table(token_table: np.ndarray,
                                  embeds: Dict[str, np.ndarray],
                                  tokenizer) -> Tuple[np.ndarray, List[int]]:
    """Re-add tokens + write embedding rows (reference
    checkpoint_handler.py:232-267: load_learned_embed_in_clip)."""
    table = np.array(token_table)
    ids = []
    for token, row in embeds.items():
        tokenizer.add_tokens([token])
        tid = tokenizer.convert_tokens_to_ids(token)
        if tid >= table.shape[0]:
            raise ValueError(
                f"vocab overflow loading {token}: id {tid} >= "
                f"{table.shape[0]}")
        table[tid] = np.asarray(row, np.float32)
        ids.append(tid)
    return table, ids
