"""Phi-1.5 decoder in flax.linen.

Behavioral spec: HF transformers 4.36.2 PhiModel/PhiForCausalLM with the
susnato/phi-1_5_dev checkpoint config (hidden 2048, 24 layers, 32 heads,
partial rotary factor 0.5, gelu_new MLP) — the LLM PSALM builds on
(llava_phi.py:33, SURVEY.md §2.10). Architecture facts reproduced:

  * parallel residual: one input LayerNorm feeds both attention and MLP, and
    the layer output is attn_out + mlp_out + residual;
  * rotary embedding over the first rotary_dim=32 channels of each 64-d head
    (interleaved-half convention, rope_theta 10000);
  * q/k/v/dense projections all carry biases; final LayerNorm before lm_head.

PSALM replaces the HF lm_head with a bias-free Linear (llava_phi.py:156).

Supports full-sequence forward (all eval_seg needs — the reference runs a
single non-autoregressive pass, llava_phi.py:1354) and KV-cache incremental
decoding for the chat/serve path.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import PhiConfig
from psalm_tpu.models.layers import LoRADense


def _dense(cfg: PhiConfig, features, dtype, name):
    qb = getattr(cfg, "quant_bits", 0)
    if cfg.lora_rank > 0:
        return LoRADense(features, cfg.lora_rank, cfg.lora_alpha,
                         dtype=dtype, quant_bits=qb, name=name)
    if qb == 8:
        from psalm_tpu.models.quant import QuantDense
        return QuantDense(features, dtype=dtype, name=name)
    if qb == 4:
        from psalm_tpu.models.quant import Quant4Dense
        return Quant4Dense(features, dtype=dtype, name=name,
                           storage=getattr(cfg, "quant_storage", "packed"))
    import flax.linen as _nn
    return _nn.Dense(features, dtype=dtype, name=name)


def _rotary_tables(positions: jnp.ndarray, rotary_dim: int, theta: float):
    """cos/sin tables [*, rotary_dim] for given positions [*,]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [*, rd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_partial_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                         rotary_dim: int) -> jnp.ndarray:
    """x: [B, L, h, hd]; cos/sin: [B or 1, L, rotary_dim]."""
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class PhiAttention(nn.Module):
    cfg: PhiConfig
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, positions, cache=None):
        """x: [B, L, D]; attn_bias: [B, 1, L, S] additive f32; positions [B, L].

        cache: optional dict(k=[B, h, hd, S], v=..., index=int) for decode.
        Returns (out, new_cache).

        KV-cache layout note (TPU): the cache stores K/V as [B, h, hd, S] so
        the (hd=64, S) minor dims tile cleanly onto the (sublane, 128-lane)
        vregs — a [.., S, h, 64] layout pads the 64-wide minor dim to 128
        lanes and doubles the HBM bytes every decode step re-reads. Dots use
        preferred_element_type=f32 (bf16 operands, f32 accumulation — bf16
        products are exact in f32) instead of materializing f32 casts of the
        whole cache.
        """
        c = self.cfg
        B, L, D = x.shape
        h, hd = c.num_heads, c.head_dim
        q = _dense(c, D, self.dtype, "q_proj")(x).reshape(B, L, h, hd)
        k = _dense(c, D, self.dtype, "k_proj")(x).reshape(B, L, h, hd)
        v = _dense(c, D, self.dtype, "v_proj")(x).reshape(B, L, h, hd)

        cos, sin = _rotary_tables(positions, c.rotary_dim, c.rope_theta)
        q = apply_partial_rotary(q, cos, sin, c.rotary_dim)
        k = apply_partial_rotary(k, cos, sin, c.rotary_dim)

        if cache is not None:
            idx = cache["index"]
            k_t = jnp.transpose(k, (0, 2, 3, 1)).astype(cache["k"].dtype)
            v_t = jnp.transpose(v, (0, 2, 3, 1)).astype(cache["v"].dtype)
            ck = jax.lax.dynamic_update_slice(cache["k"], k_t, (0, 0, 0, idx))
            cv = jax.lax.dynamic_update_slice(cache["v"], v_t, (0, 0, 0, idx))
            new_cache = dict(k=ck, v=cv, index=idx + L)
            qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, h, L, hd]
            attn = jnp.einsum("bhld,bhds->bhls", qh, ck,
                              preferred_element_type=jnp.float32)
            attn = attn / jnp.sqrt(hd).astype(jnp.float32) + attn_bias
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhls,bhds->bhld", attn,
                             cv.astype(self.dtype),
                             preferred_element_type=self.dtype)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, L, D)
            return _dense(c, D, self.dtype, "dense")(out), new_cache

        if self.use_flash and cache is None and L > 1:
            # fused TPU flash attention; sequences are right-padded so plain
            # causal masking is exact at every valid position. The kernel
            # needs seq % 128 == 0; zero-pad at the end (padded keys sit
            # after every real query, so causal masking excludes them —
            # exact, not approximate) and slice the rows back off.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            pad = (-L) % 128
            qh = jnp.transpose(q, (0, 2, 1, 3))
            kh = jnp.transpose(k, (0, 2, 1, 3))
            vh = jnp.transpose(v, (0, 2, 1, 3))
            if pad:
                pads = ((0, 0), (0, 0), (0, pad), (0, 0))
                qh = jnp.pad(qh, pads)
                kh = jnp.pad(kh, pads)
                vh = jnp.pad(vh, pads)
            out = flash_attention(qh, kh, vh, causal=True,
                                  sm_scale=float(1.0 / np.sqrt(hd)))
            if pad:
                out = out[:, :, :L]
            out = jnp.transpose(out, (0, 2, 1, 3)).astype(self.dtype)
        else:
            # f32 attention logits (Phi trains attention in fp32 autocast):
            # bf16 operands with f32 accumulation — identical products (bf16
            # pairs are exact in f32), one MXU pass instead of the 3-6 an
            # f32xf32 dot costs, and no materialized f32 copy of K.
            attn = jnp.einsum("blhd,bshd->bhls", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn / jnp.sqrt(hd).astype(jnp.float32)
            attn = attn + attn_bias
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhls,bshd->blhd", attn, v.astype(self.dtype))
        out = out.reshape(B, L, D)
        return _dense(c, D, self.dtype, "dense")(out), None


class PhiDecoderLayer(nn.Module):
    cfg: PhiConfig
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, positions, cache=None):
        c = self.cfg
        residual = x
        hs = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                          name="input_layernorm")(x)
        attn_out, new_cache = PhiAttention(c, dtype=self.dtype,
                                           use_flash=self.use_flash,
                                           name="self_attn")(hs, attn_bias,
                                                             positions, cache)
        mlp = _dense(c, c.intermediate_size, self.dtype, "fc1")(hs)
        mlp = jax.nn.gelu(mlp, approximate=True)  # gelu_new
        mlp = _dense(c, c.hidden_size, self.dtype, "fc2")(mlp)
        return residual + attn_out + mlp, new_cache


class PhiModel(nn.Module):
    """Embedding + decoder stack + final LayerNorm. Accepts input embeddings
    directly (the multimodal path always splices embeddings)."""

    cfg: PhiConfig
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False

    def setup(self):
        self.embed_tokens = nn.Embed(self.cfg.vocab_size, self.cfg.hidden_size,
                                     dtype=self.dtype)
        layer_cls = PhiDecoderLayer
        if self.remat:
            layer_cls = nn.remat(PhiDecoderLayer, static_argnums=())
        self.layers = [layer_cls(self.cfg, dtype=self.dtype,
                                 use_flash=self.use_flash, name=f"layers_{i}")
                       for i in range(self.cfg.num_layers)]
        self.final_layernorm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                            dtype=jnp.float32)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 positions: Optional[jnp.ndarray] = None,
                 caches=None):
        """inputs_embeds: [B, L, D]; attention_mask: [B, L] 1=valid.

        Returns (last_hidden_state, new_caches).
        """
        B, L, D = inputs_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L), (B, L))
        if caches is None:
            S = L
            kv_positions = positions
            causal = positions[:, :, None] >= jnp.arange(L)[None, None, :]
            bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[:, None]
            if attention_mask is not None:
                pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)
                bias = bias + pad.astype(jnp.float32)
        else:
            # decode: keys live in the cache of static length S.
            S = caches[0]["k"].shape[-1]
            kpos = jnp.arange(S)[None, None, :]
            causal = positions[:, :, None] >= kpos
            written = kpos < (caches[0]["index"] + L)
            bias = jnp.where(causal & written, 0.0, -1e9).astype(jnp.float32)[:, None]

        x = inputs_embeds
        new_caches = []
        for i, layer in enumerate(self.layers):
            cache_i = caches[i] if caches is not None else None
            x, nc = layer(x, bias, positions, cache_i)
            new_caches.append(nc)
        x = self.final_layernorm(x)
        return x, (new_caches if caches is not None else None)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16):
        # [B, h, hd, S] — lane dim S, sublane dim hd: no vreg padding (see
        # PhiAttention docstring).
        c = self.cfg
        return [dict(k=jnp.zeros((batch, c.num_heads, c.head_dim, max_len), dtype),
                     v=jnp.zeros((batch, c.num_heads, c.head_dim, max_len), dtype),
                     index=jnp.asarray(0, jnp.int32))
                for _ in range(c.num_layers)]


class PhiForCausalLM(nn.Module):
    cfg: PhiConfig
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False

    def setup(self):
        self.model = PhiModel(self.cfg, dtype=self.dtype, remat=self.remat,
                              use_flash=self.use_flash)
        self.lm_head = nn.Dense(self.cfg.vocab_size, use_bias=self.cfg.lm_head_bias,
                                dtype=self.dtype)

    def __call__(self, inputs_embeds=None, attention_mask=None, positions=None,
                 caches=None, input_ids=None):
        if inputs_embeds is None:
            inputs_embeds = self.model.embed(input_ids)
        hidden, new_caches = self.model(inputs_embeds, attention_mask, positions,
                                        caches)
        return self.lm_head(hidden), hidden, new_caches

    def embed(self, input_ids):
        return self.model.embed(input_ids)
