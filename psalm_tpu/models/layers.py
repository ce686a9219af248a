"""Shared neural blocks: sine position embedding, torch-compatible multi-head
attention, and the DETR-style MLP head."""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def position_embedding_sine(H: int, W: int, num_pos_feats: int,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Sine 2-D positional embedding, normalized — matches the reference
    PositionEmbeddingSine (position_encoding.py:12-52) with an all-valid mask.

    Returns [H, W, 2*num_pos_feats] with channel order (pos_y, pos_x),
    each interleaved sin/cos.
    """
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(H, dtype=np.float32) + 1.0) / (H + eps) * scale
    x = (np.arange(W, dtype=np.float32) + 1.0) / (W + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)
    pos_x = x[:, None] / dim_t  # [W, F]
    pos_y = y[:, None] / dim_t  # [H, F]

    def interleave(p):
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], axis=2).reshape(
            p.shape[0], -1)

    pos_x = interleave(pos_x)  # [W, F]
    pos_y = interleave(pos_y)  # [H, F]
    out = np.concatenate([
        np.broadcast_to(pos_y[:, None, :], (H, W, num_pos_feats)),
        np.broadcast_to(pos_x[None, :, :], (H, W, num_pos_feats)),
    ], axis=-1)
    return jnp.asarray(out, dtype=dtype)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible MHA (separate q/k/v/out dense;
    the converter splits torch's packed in_proj). Softmax in f32."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value,
                 attn_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """query [B, Q, D]; key/value [B, S, D];
        attn_bias additive [B, h, Q, S] or None."""
        B, Q, D = query.shape
        h = self.num_heads
        hd = D // h
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(B, Q, h, hd) * (hd ** -0.5)
        k = k.reshape(B, -1, h, hd)
        v = v.reshape(B, -1, h, hd)
        logits = jnp.einsum("bqhd,bshd->bhqs", q, k).astype(jnp.float32)
        if attn_bias is not None:
            logits = logits + attn_bias
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqs,bshd->bqhd", attn, v).reshape(B, Q, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class LoRADense(nn.Module):
    """Dense with an additive low-rank adapter: y = Wx + (alpha/r) * B(Ax).

    A is gaussian-init, B zero-init, so the adapter starts as identity-zero
    and the converted base checkpoint is untouched. Freeze the base with
    psalm_tpu.train.lora.lora_mask.
    """

    features: int
    rank: int
    alpha: float = 16.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant_bits: int = 0  # 8 = int8 base kernel (QLoRA-style)

    @nn.compact
    def __call__(self, x):
        if self.quant_bits == 8:
            from psalm_tpu.models.quant import QuantDense
            base = QuantDense(self.features, use_bias=self.use_bias,
                              dtype=self.dtype, name="base")(x)
        else:
            base = nn.Dense(self.features, use_bias=self.use_bias,
                            dtype=self.dtype, name="base")(x)
        a = self.param("lora_A", nn.initializers.normal(0.02),
                       (x.shape[-1], self.rank))
        b = self.param("lora_B", nn.initializers.zeros,
                       (self.rank, self.features))
        delta = (x @ a.astype(x.dtype)) @ b.astype(x.dtype)
        return base + delta * (self.alpha / self.rank)


class MLP(nn.Module):
    """DETR-style MLP with relu between layers
    (mask2former_transformer_decoder.py:187-199)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feats = self.output_dim if last else self.hidden_dim
            x = nn.Dense(feats, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x
