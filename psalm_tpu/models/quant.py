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

import math
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


class Quant4Dense(nn.Module):
    """nn.Dense with a nibble-packed int4 weight (bnb load_in_4bit analog,
    reference builder.py:31-40 — which is config-only passthrough; this is a
    real group-quantized implementation).

    Storage: kernel_q4 int8 [in/2, out] — LOW nibble = input row i (first
    half of the input axis), HIGH nibble = input row in/2 + i (second half)
    — plus per-(group, out) f32 scales (group along the input axis).

    Decode-path fusion note (measured on v5e): the original even/odd
    interleaved packing needed a stack+reshape to rebuild [in, out], which
    forced XLA to materialize a dequantized bf16 kernel every decode step —
    int4 decode measured SLOWER than bf16 (34 tok/s). This half-split
    layout needs only an arithmetic shift per half (the (x<<4)>>4 trick
    sign-extends the low nibble) and applies group scales to the OUTPUT of
    per-group partial dots, never to a materialized weight. That fixed the
    catastrophic regression (5.77 ms/tok, on par with bf16's 5.70) but the
    nibble shifts still do NOT fuse into the dot's operand load the way
    int8's plain convert does, so int4 buys HBM *capacity* (fits the 1.4B
    Phi in ~0.7 GB), not decode bandwidth — use int8 (4.26 ms/tok) for
    serving speed. A Pallas int4-matvec kernel is the known path to real
    int4 bandwidth wins if capacity+speed are ever needed together."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    group: int = 64
    # "packed": int8 bytes holding two nibbles (default, portable);
    # "native": a jnp.int4 [in, out] array — XLA owns the 2-per-byte HBM
    # packing AND the unpack-in-convert, which fuses into the dot's operand
    # load (the manual shifts don't). Same quantized values either way.
    # "pallas": packed storage + the ops/int4_matvec.py VMEM-unpack kernel
    # for decode-shaped calls (rows <= 16) — true int4 HBM traffic; falls
    # back to the packed einsum math for prefill-shaped calls.
    storage: str = "packed"

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        half = in_f // 2
        # groups may not straddle the half boundary; shrink to gcd when the
        # configured group doesn't divide the half (tiny test configs)
        group = math.gcd(half, self.group)
        G = in_f // group
        assert in_f % 2 == 0, in_f
        if self.storage == "native":
            kq = self.param("kernel_q4n", nn.initializers.zeros,
                            (in_f, self.features), jnp.int4)
            scale = self.param("scale", nn.initializers.ones,
                               (G, self.features), jnp.float32)
            lead = x.shape[:-1]
            xg = x.reshape(*lead, G, group)
            kg = kq.reshape(G, group, self.features).astype(self.dtype)
            part = jnp.einsum("...gd,gdo->...go", xg, kg)
            y = jnp.einsum("...go,go->...o", part, scale.astype(part.dtype))
            y = y.astype(self.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + bias.astype(self.dtype)
            return y
        kq = self.param("kernel_q4", nn.initializers.zeros,
                        (half, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (G, self.features), jnp.float32)
        if self.storage == "pallas":
            from psalm_tpu.ops.int4_matvec import (int4_matvec,
                                                   int4_matvec_supported)
            lead = x.shape[:-1]
            rows = int(np.prod(lead)) if lead else 1
            if int4_matvec_supported(rows, in_f, self.features, group):
                y = int4_matvec(x.reshape(rows, in_f), kq, scale, group,
                                interpret=jax.default_backend() == "cpu")
                y = y.reshape(*lead, self.features).astype(self.dtype)
                if self.use_bias:
                    bias = self.param("bias", nn.initializers.zeros,
                                      (self.features,), jnp.float32)
                    y = y + bias.astype(self.dtype)
                return y
            # prefill-shaped call: fall through to the packed einsum math
        low = jnp.right_shift(jnp.left_shift(kq, 4), 4)
        high = jnp.right_shift(kq, 4)
        lead = x.shape[:-1]
        xg = x.reshape(*lead, 2, G // 2, group)
        # per-group partial sums: int4→dtype shift+convert fuses into the
        # batched dot's operand load; scale applies to the [.., G, out]
        # partials (output fusion), never to a materialized weight
        kg_lo = low.reshape(G // 2, group, self.features).astype(self.dtype)
        kg_hi = high.reshape(G // 2, group, self.features).astype(self.dtype)
        p_lo = jnp.einsum("...gd,gdo->...go", xg[..., 0, :, :], kg_lo)
        p_hi = jnp.einsum("...gd,gdo->...go", xg[..., 1, :, :], kg_hi)
        part = jnp.concatenate([p_lo, p_hi], axis=-2)  # [..., G, out]
        y = jnp.einsum("...go,go->...o", part, scale.astype(part.dtype))
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def quantize_kernel_int4(kernel: np.ndarray, group: int = 64):
    """[in, out] float -> (packed int8 [in/2, out], f32 scale [in/group, out]).

    Half-split packing (see Quant4Dense): byte i holds input row i in the
    low nibble and input row in/2 + i in the high nibble."""
    k = np.asarray(kernel, np.float32)
    in_f, out_f = k.shape
    half = in_f // 2
    assert in_f % 2 == 0, k.shape
    group = math.gcd(half, group)  # match Quant4Dense's half-boundary rule
    kg = k.reshape(in_f // group, group, out_f)
    amax = np.abs(kg).max(axis=1)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(kg / scale[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(in_f, out_f)
    packed = ((q[half:].astype(np.uint8) << 4)
              | (q[:half].astype(np.uint8) & 0xF)).astype(np.int8)
    return packed, scale


def quantize_kernel_int4_native(kernel: np.ndarray, group: int = 64):
    """[in, out] float -> (jnp.int4 [in, out], f32 scale [in/group, out]).
    Same group quantization as quantize_kernel_int4, XLA-native storage."""
    k = np.asarray(kernel, np.float32)
    in_f, out_f = k.shape
    group = math.gcd(in_f // 2, group)
    kg = k.reshape(in_f // group, group, out_f)
    amax = np.abs(kg).max(axis=1)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(kg / scale[:, None, :]), -7, 7).astype(np.int8)
    return jnp.asarray(q.reshape(in_f, out_f), jnp.int4), scale


def quantize_phi_int4(variables: Dict, layer_names: Sequence[str]
                      = QUANT_LAYER_NAMES, group: int = 64,
                      storage: str = "packed") -> Dict:
    """Convert the loaded tree's phi linear kernels to int4 leaves
    ("packed" int8 nibble pairs or "native" jnp.int4 arrays)."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = path + (k,)
            if (isinstance(v, dict) and "kernel" in v
                    and any(n in p for n in layer_names)
                    and getattr(v["kernel"], "ndim", 0) == 2):
                new_v = {kk: vv for kk, vv in v.items() if kk != "kernel"}
                if storage == "native":
                    q4, scale = quantize_kernel_int4_native(
                        np.asarray(v["kernel"]), group)
                    new_v["kernel_q4n"] = q4
                else:
                    packed, scale = quantize_kernel_int4(
                        np.asarray(v["kernel"]), group)
                    new_v["kernel_q4"] = jnp.asarray(packed)
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
