"""Device mesh + sharding rules.

The learnables are tiny MLPs; the frozen SD stack fits on a single v5e core,
so the scaling strategy is (SURVEY.md §2.3):

  * dp — data parallel over the batch (the only axis the workload needs);
    gradient reduction rides ICI via XLA-inserted psum.
  * tp — optional tensor parallel over the frozen UNet/CLIP matmul kernels
    (attention heads + MLP hidden). Pointless on one host but exercised by
    the multi-chip dry run and available for large-batch inference serving.

All sharding is expressed with NamedSharding / PartitionSpec and applied via
jit in/out shardings — no hand-written collectives.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Guarded multi-host bring-up (SURVEY §2.3 / docs/MULTIHOST.md).

    Single-process (the supported deployment) is a no-op returning False.
    On a multi-host slice, call this BEFORE any jax op (or export
    VIEW_NETI_COORDINATOR / VIEW_NETI_NUM_PROCESSES /
    VIEW_NETI_PROCESS_ID and pass nothing); afterwards jax.devices()
    spans all hosts and make_mesh() builds a global mesh. See
    docs/MULTIHOST.md for why the shipped recipes never need this —
    effective batch 9 saturates at 8 chips (one host).
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "VIEW_NETI_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("VIEW_NETI_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("VIEW_NETI_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def default_devices():
    """Devices of the *configured* platform. The axon sitecustomize
    force-registers the TPU backend in every process, so jax.devices()
    reports the TPU even when tests/dryruns pin jax_default_device to the
    virtual-CPU farm — honor that pin here."""
    d = jax.config.jax_default_device
    if d is not None:
        return jax.devices(d.platform)
    return jax.devices()


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else default_devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    assert n_dp * n_tp <= len(devices), \
        f"mesh {n_dp}x{n_tp} > {len(devices)} devices"
    arr = np.asarray(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def _is_object_idx(prototype: Any, leaf: Any) -> bool:
    """object_idx never shards over dp: it is scalar, or (G,) group scene
    indices in the mode-3 fused-accumulation layout — per-GROUP, not
    per-sample, so its leading axis is not the batch axis."""
    from view_neti_tpu.training.train_step import TrainBatch
    return isinstance(prototype, TrainBatch) and leaf is prototype.object_idx


def batch_shardings_for(prototype: Any, mesh: Mesh) -> Any:
    """Per-leaf batch shardings: arrays shard their leading axis over dp;
    TrainBatch.object_idx (scalar or (G,) group indices) replicates."""
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: rep if (_is_object_idx(prototype, x)
                          or getattr(x, "ndim", 0) < 1) else dp,
        prototype)


def window_batch_shardings_for(prototype: Any, mesh: Mesh) -> Any:
    """Shardings for a W-step dispatch window of stacked batches
    (train_step.make_multi_step): leaf shape (W, B, ...) shards the BATCH
    axis over dp; per-step scalars (W,) and (W, G) group indices
    replicate."""
    dp = NamedSharding(mesh, P(None, "dp"))
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: rep if (_is_object_idx(prototype, x)
                          or getattr(x, "ndim", 0) < 2) else dp,
        prototype)


# --- optional tensor-parallel placement of frozen weights ------------------

_TP_PATTERNS = [
    # UNet attention projections: shard the head (output) dim of q/k/v and
    # the input dim of the out-projection.
    (re.compile(r"(to_q|to_k|to_v)$"), ("kernel",), P(None, "tp")),
    (re.compile(r"to_out$"), ("kernel",), P("tp", None)),
    # Transformer MLPs: hidden dim sharded.
    (re.compile(r"ff_geglu/proj$|fc1$"), ("kernel",), P(None, "tp")),
    (re.compile(r"ff_out$|fc2$"), ("kernel",), P("tp", None)),
]


def frozen_param_shardings(params: Any, mesh: Mesh,
                           tensor_parallel: bool = False) -> Any:
    """A sharding pytree for frozen model params.

    tensor_parallel=False -> fully replicated. True -> attention/MLP matmul
    kernels sharded over 'tp' where divisible; everything else replicated.
    """
    rep = replicated(mesh)
    if not tensor_parallel or mesh.shape.get("tp", 1) == 1:
        return jax.tree_util.tree_map(lambda _: rep, params)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    tp = mesh.shape["tp"]
    out = []
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(k) for k in keys)
        spec = P()
        for pat, leafnames, cand in _TP_PATTERNS:
            mod_path = "/".join(str(k) for k in keys[:-1])
            if pat.search(mod_path) and str(keys[-1]) in leafnames:
                # only shard if the dimension divides evenly
                dims_ok = all(
                    ax is None or leaf.shape[i] % tp == 0
                    for i, ax in enumerate(cand))
                if dims_ok:
                    spec = cand
                break
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_pytree(tree: Any, shardings: Any) -> Any:
    """Place a host pytree onto the mesh with the given shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)
