"""Device mesh + sharding rules.

Replaces the reference's DeepSpeed-ZeRO-2-over-NCCL stack (scripts/zero2.json,
vendored deepspeed/launcher/) with jax.sharding: a ('data', 'model') mesh,
batch sharded over 'data', optimizer state sharded over 'data' (the ZeRO
analog), and optional tensor parallelism of the Phi layers over 'model'.
Multi-host rendezvous is jax.distributed.initialize (replacing
PDSH/MPI/Slurm runners at deepspeed/launcher/multinode_runner.py).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, (data, model, n)
    return Mesh(devices.reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter partitioning rules (tensor parallel over 'model').
#
# Phi layers: q/k/v and fc1 kernels column-sharded (head/ffn dim), dense and
# fc2 row-sharded; embeddings sharded on vocab. Everything else replicated.
# These are regex rules over the flattened param path.

_TP_RULES = [
    (r"phi/.*/(q_proj|k_proj|v_proj|fc1)/kernel$", P(None, "model")),
    (r"phi/.*/(q_proj|k_proj|v_proj|fc1)/bias$", P("model")),
    (r"phi/.*/(dense|fc2)/kernel$", P("model", None)),
    (r"phi/model/embed_tokens/embedding$", P(None, None)),
    (r"phi/lm_head/kernel$", P(None, "model")),
]


def param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding pytree for a params pytree (TP rules over 'model')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    specs = {path_str(kp): param_spec(path_str(kp)) for kp, _ in flat}

    def to_sharding(kp, _):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def host_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading — feed to
    UnifiedTaskSampler so each host reads a disjoint sample stream
    (replaces the reference's DistributedSampler-under-DeepSpeed split)."""
    return jax.process_index(), jax.process_count()


def make_global_batch(mesh: Mesh, local_batch: dict,
                      batch_axis: str = "data") -> dict:
    """Assemble per-host arrays into globally-sharded jax.Arrays.

    Each host passes its LOCAL batch (leading dim = per-host batch size);
    the result is a tree of jax.Arrays with global shape
    [per_host * num_hosts, ...] sharded over ``batch_axis``. Non-array
    metadata (dataset_type strings) passes through unchanged. Single-process
    meshes take the plain device_put path.
    """
    sharding = NamedSharding(mesh, P(batch_axis))

    def place(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) == 0:
            return x
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: (v if isinstance(v, str) else place(v))
            for k, v in local_batch.items()}


# ZeRO-style optimizer-state sharding lives in train/train_step.py
# (opt_state_sharding); this module owns the parameter/TP rules only.
