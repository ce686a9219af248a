"""Weight-only int8 quantization for the Phi stack (bnb load_in_8bit analog).

The reference builder exposes load_8bit/load_4bit through bitsandbytes
(psalm/model/builder.py:35-44). TPU-native equivalent: per-output-channel
symmetric int8 for every linear kernel in Phi; the matmul runs with the int8
kernel converted to the compute dtype (XLA fuses the convert into the
operand load — HBM weight traffic halves vs bf16) and the per-channel scale
is applied to the OUTPUT row, which is mathematically identical for
per-out-channel scales.

Composes with LoRA into the QLoRA-style single-chip finetune: quantized base
kernels are plain frozen params (train/lora.py's psalm_finetune_mask already
freezes non-LoRA phi weights), adapters stay f32.

Quantized modules keep nn.Dense-compatible naming at one extra leaf
('kernel' -> 'kernel_q' + 'scale'); quantize_phi_int8 converts a loaded
f32/bf16 tree in place.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# linear layers inside the Phi stack that get quantized (embeddings and the
# PSALM lm_head / vision stack stay full precision, matching bnb defaults
# of skipping embeddings and heads)
QUANT_LAYER_NAMES = ("q_proj", "k_proj", "v_proj", "dense", "fc1", "fc2")


class QuantDense(nn.Module):
    """Drop-in nn.Dense with an int8 weight + per-out-channel f32 scale."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        y = (x @ kq.astype(self.dtype)) * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def quantize_kernel(kernel: np.ndarray):
    """[in, out] float -> (int8 [in, out], f32 scale [out])."""
    k = np.asarray(kernel, np.float32)
    amax = np.abs(k).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def quantize_phi_int8(variables: Dict, layer_names: Sequence[str]
                      = QUANT_LAYER_NAMES) -> Dict:
    """Convert the loaded tree's phi linear kernels to int8+scale leaves.

    Handles both plain Dense ({kernel, bias}) and LoRADense
    ({base: {kernel, bias}, lora_A, lora_B}) nodes — the quantized kernel
    always replaces the node's 'kernel'.
    """

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = path + (k,)
            if (isinstance(v, dict) and "kernel" in v
                    and any(n in p for n in layer_names)
                    and getattr(v["kernel"], "ndim", 0) == 2):
                q, scale = quantize_kernel(np.asarray(v["kernel"]))
                new_v = {kk: vv for kk, vv in v.items() if kk != "kernel"}
                new_v["kernel_q"] = jnp.asarray(q)
                new_v["scale"] = jnp.asarray(scale)
                out[k] = {kk: walk(vv, p + (kk,)) if isinstance(vv, dict)
                          else vv for kk, vv in new_v.items()}
            else:
                out[k] = walk(v, p)
        return out

    params = dict(variables["params"])
    if "phi" in params:
        params["phi"] = walk(params["phi"], ("phi",))
    return {**variables, "params": params}
