"""Orbax sharded checkpointing: the opt-in multi-host backend.

The msgpack files (checkpoint.py) are the *interchange format* — small,
single-host, semantically matching the reference's mapper/embeds artifacts
(reference checkpoint_handler.py:34-97). This module adds what msgpack
cannot do: sharded, multi-host-safe persistence of the FULL train state
(trainable params + optimizer state + PE constants), saved/restored with
the arrays' mesh shardings intact. It is strictly additive — the reference
never saves optimizer state at all (SURVEY.md §3.4 "not a true resume").

Select with log.checkpoint_backend: "orbax" (default "msgpack" keeps the
reference-shaped artifacts only; "orbax" writes both).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_train_state(path: Path, state: Any) -> Path:
    """Save a pytree of (possibly sharded) arrays. Overwrites `path`."""
    import shutil
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: Path, template: Any,
                        shardings: Optional[Any] = None) -> Any:
    """Restore into the template's structure.

    template: a pytree of arrays (or ShapeDtypeStructs) matching the saved
    structure. shardings: optional matching pytree of NamedShardings — when
    given, arrays come back sharded onto the mesh (each host reads only its
    shards; the multi-host story).
    """
    path = Path(path).absolute()

    def leaf_sharding(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, jax.sharding.Sharding):
            return s
        d = jax.config.jax_default_device
        return jax.sharding.SingleDeviceSharding(
            d if d is not None else jax.devices()[0])

    if shardings is None:
        shardings = jax.tree_util.tree_map(leaf_sharding, template)
    abstract = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        template, shardings)
    return _checkpointer().restore(path, abstract)
