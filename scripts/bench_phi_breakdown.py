"""Phi-1.5 full-seq forward breakdown on TPU — where do the 44.5 ms go?

The eval pipeline's Phi pass measures ~44.5 ms at seq ~1.35k (BASELINE.md),
~45% MFU on its ~3.9 TFLOPs. The layer matmuls alone (141 GFLOP/layer * 24)
bound ~24.6 ms at the chip's measured 70%-of-peak matmul efficiency, so
~20 ms is attention + layernorm + rotary + layout overhead. This script
isolates the stages, all inputs as jit ARGUMENTS (closure constants fold):

  stack_flash / stack_dense   full 24-layer PhiModel, use_flash on/off
  layer_flash / layer_dense   one decoder layer (x24 extrapolation column)
  matmuls_only                the layer's 6 Dense ops at identical shapes
  attn_flash / attn_dense     the attention core alone (qkv->ctx->dense)

Env: PSALM_PHI_SEQ (default 1350), PSALM_PHI_PAD128=1 rounds seq up to a
multiple of 128 to test sublane-padding sensitivity.
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import PhiConfig
from psalm_tpu.models.phi import PhiModel, PhiDecoderLayer

SEQ = int(os.environ.get("PSALM_PHI_SEQ", "1350"))
if os.environ.get("PSALM_PHI_PAD128", "0") == "1":
    SEQ = (SEQ + 127) // 128 * 128
B = 1
cfg = PhiConfig()
D, I, H, HD = cfg.hidden_size, cfg.intermediate_size, cfg.num_heads, cfg.head_dim

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, SEQ, D), jnp.bfloat16)
mask = jnp.ones((B, SEQ), jnp.int32)


def timeit(f, *a, n=20, warmup=3):
    # optimization-barrier scan-difference timing: pure device ms, robust
    # to any tunnel state (per-iter block_until_ready both added the RPC
    # floor per call AND can return early on the tunneled runtime)
    from scan_timer import scan_rate_ms
    return scan_rate_ms(f, *a, k=min(8, max(2, n // 2)), reps=3)


def bench_stack(use_flash):
    m = PhiModel(cfg, dtype=jnp.bfloat16, use_flash=use_flash)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x, mask)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)
    f = jax.jit(lambda p_, x_, m_: m.apply(p_, x_, m_)[0])
    return timeit(f, p, x, mask, n=10)


def bench_layer(use_flash):
    m = PhiDecoderLayer(cfg, dtype=jnp.bfloat16, use_flash=use_flash)
    pos = jnp.broadcast_to(jnp.arange(SEQ), (B, SEQ))
    causal = pos[:, :, None] >= jnp.arange(SEQ)[None, None, :]
    bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[:, None]
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x, bias, pos)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)
    f = jax.jit(lambda p_, x_, b_, po_: m.apply(p_, x_, b_, po_)[0])
    return timeit(f, p, x, bias, pos)


class MatmulsOnly(nn.Module):
    @nn.compact
    def __call__(self, h):
        q = nn.Dense(D, dtype=jnp.bfloat16)(h)
        k = nn.Dense(D, dtype=jnp.bfloat16)(h)
        v = nn.Dense(D, dtype=jnp.bfloat16)(h)
        o = nn.Dense(D, dtype=jnp.bfloat16)(q + k + v)
        m1 = nn.Dense(I, dtype=jnp.bfloat16)(h)
        m2 = nn.Dense(D, dtype=jnp.bfloat16)(jax.nn.gelu(m1, approximate=True))
        return o + m2


def bench_matmuls():
    m = MatmulsOnly()
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)
    f = jax.jit(lambda p_, x_: m.apply(p_, x_))
    return timeit(f, p, x)


def bench_attn_core(use_flash):
    """QK^T -> softmax -> AV at Phi shapes, pre-projected q/k/v as args."""
    q = jnp.asarray(rng.randn(B, SEQ, H, HD), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, SEQ, H, HD), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, SEQ, H, HD), jnp.bfloat16)
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        pad = (-SEQ) % 128

        def f(q_, k_, v_):
            qh = jnp.transpose(q_, (0, 2, 1, 3))
            kh = jnp.transpose(k_, (0, 2, 1, 3))
            vh = jnp.transpose(v_, (0, 2, 1, 3))
            if pad:
                pads = ((0, 0), (0, 0), (0, pad), (0, 0))
                qh, kh, vh = (jnp.pad(a, pads) for a in (qh, kh, vh))
            o = flash_attention(qh, kh, vh, causal=True,
                                sm_scale=float(1.0 / np.sqrt(HD)))
            if pad:
                o = o[:, :, :SEQ]
            return jnp.transpose(o, (0, 2, 1, 3))
    else:
        causal = jnp.arange(SEQ)[:, None] >= jnp.arange(SEQ)[None, :]
        bias0 = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)

        def f(q_, k_, v_):
            a = jnp.einsum("blhd,bshd->bhls", q_, k_,
                           preferred_element_type=jnp.float32)
            a = a / jnp.sqrt(HD).astype(jnp.float32) + bias0
            a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
            return jnp.einsum("bhls,bshd->blhd", a, v_)
    return timeit(jax.jit(f), q, k, v)


if __name__ == "__main__":
    print(f"seq={SEQ} B={B} hidden={D} layers={cfg.num_layers}")
    mm = bench_matmuls()
    print(f"matmuls_only/layer {mm:7.3f} ms   x24 = {mm * 24:6.1f} ms")
    af = bench_attn_core(True)
    ad = bench_attn_core(False)
    print(f"attn_core flash    {af:7.3f} ms   x24 = {af * 24:6.1f} ms")
    print(f"attn_core dense    {ad:7.3f} ms   x24 = {ad * 24:6.1f} ms")
    lf = bench_layer(True)
    ld = bench_layer(False)
    print(f"layer flash        {lf:7.3f} ms   x24 = {lf * 24:6.1f} ms")
    print(f"layer dense        {ld:7.3f} ms   x24 = {ld * 24:6.1f} ms")
    sf = bench_stack(True)
    sd = bench_stack(False)
    print(f"stack flash (24L)  {sf:7.1f} ms")
    print(f"stack dense (24L)  {sd:7.1f} ms")
    tf_ = 2 * 1.42e9 * SEQ / 1e12  # ~3.83 TFLOP at seq 1350
    print(f"approx stack MFU (flash): {tf_ / (sf / 1e3) / 197:5.1%}")
