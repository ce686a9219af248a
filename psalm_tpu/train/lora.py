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


def lora_optimizer(tx: optax.GradientTransformation, params
                   ) -> optax.GradientTransformation:
    """Wrap an optimizer so only LoRA params update."""
    mask = lora_mask(params)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask))


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
