"""LoRA utilities: trainable-mask, base-weight grafting, and merge-export.

The reference exposes LoRA args without an active recipe (train.py:135-139,
split save :467-477); here LoRA is functional: set ``PhiConfig.lora_rank>0``,
init the model, graft converted base weights in, train with the optax mask,
and merge for export.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import optax


def _is_lora_path(path) -> bool:
    names = [getattr(k, "key", str(k)) for k in path]
    return any(n in ("lora_A", "lora_B") for n in names)


def lora_mask(params) -> Any:
    """True for trainable (LoRA) leaves, False for frozen base weights."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: _is_lora_path(kp), params)


def _masked_only(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Apply tx to masked-in leaves and ZERO the rest. optax.masked alone
    passes masked-out gradients through unchanged, and allocates optimizer
    state only for masked-in leaves — frozen Adam moments for a 1.5B base
    would otherwise cost ~12 GB."""
    inv = jax.tree.map(lambda t: not t, mask)
    return optax.chain(optax.masked(tx, mask),
                       optax.masked(optax.set_to_zero(), inv))


def lora_optimizer(tx: optax.GradientTransformation, params
                   ) -> optax.GradientTransformation:
    """Wrap an optimizer so only LoRA params update."""
    return _masked_only(tx, lora_mask(params))


def psalm_finetune_mask(params) -> Any:
    """Single-chip PSALM finetune policy: train LoRA adapters (phi) + every
    module except the frozen vision tower and the phi base weights."""
    def decide(kp, _):
        names = [getattr(k, "key", str(k)) for k in kp]
        if _is_lora_path(kp):
            return True
        if "vision_tower" in names or "phi" in names:
            return False
        return True
    return jax.tree_util.tree_map_with_path(decide, params)


def psalm_finetune_optimizer(tx: optax.GradientTransformation, params
                             ) -> optax.GradientTransformation:
    return _masked_only(tx, psalm_finetune_mask(params))


def graft_base_params(lora_params: Any, base_params: Any) -> Any:
    """Copy converted (non-LoRA) weights into a LoRA-initialized tree.

    Wherever the LoRA tree has ``<name>/base/<leaf>`` and the base tree has
    ``<name>/<leaf>``, the base value is grafted; every other matching path
    copies directly; lora_A/lora_B keep their fresh init.
    """
    def walk(lora_node, base_node):
        if not isinstance(lora_node, dict):
            return base_node if base_node is not None else lora_node
        out = {}
        for k, v in lora_node.items():
            if k in ("lora_A", "lora_B"):
                out[k] = v
            elif k == "base" and isinstance(base_node, dict) \
                    and "base" not in base_node:
                # base tree is flat here: its leaves belong under our 'base'
                out[k] = walk(v, base_node)
            elif isinstance(base_node, dict) and k in base_node:
                out[k] = walk(v, base_node[k])
            else:
                out[k] = v
        return out

    return walk(lora_params, base_params)


def partition_params(params: Any, mask: Any):
    """Split a param tree into (trainable, frozen) by a boolean mask tree so
    jax.grad differentiates ONLY the trainable subset — full-tree
    value_and_grad would allocate gradient buffers for the frozen 1.4B base
    (~6 GB) just to zero them."""
    import flax
    flat_p = flax.traverse_util.flatten_dict(params)
    flat_m = flax.traverse_util.flatten_dict(mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return (flax.traverse_util.unflatten_dict(train),
            flax.traverse_util.unflatten_dict(frozen))


def combine_params(trainable: Any, frozen: Any) -> Any:
    import flax
    flat = dict(flax.traverse_util.flatten_dict(frozen))
    flat.update(flax.traverse_util.flatten_dict(trainable))
    return flax.traverse_util.unflatten_dict(flat)


def merge_lora(params: Any, alpha: float = 16.0) -> Any:
    """Fold adapters into base kernels for export: W' = W + (alpha/r) A@B."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if "lora_A" in node and "base" in node:
            a = np.asarray(node["lora_A"])
            b = np.asarray(node["lora_B"])
            rank = a.shape[-1]
            base = dict(node["base"])
            base["kernel"] = np.asarray(base["kernel"]) + (alpha / rank) * (a @ b)
            return base
        return {k: walk(v) for k, v in node.items()}

    return walk(params)
