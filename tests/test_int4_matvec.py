"""Pallas int4 matvec (ops/int4_matvec.py) parity, interpret mode on CPU.

Two layers of evidence:
  * layout exactness — power-of-two group scales and one-hot inputs make
    every product exactly representable in bf16 and every output a single
    dequantized weight row, so ANY indexing/unpack/scale-mapping error
    shows up as an exact mismatch (no rounding to hide behind);
  * value closeness — random case vs the f32 dequantized product, with a
    tolerance covering the kernel's bf16 weight-scale rounding (interpret
    mode runs dots at default bf16 precision, so exact f32 comparison is
    not available off-TPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from psalm_tpu.models.quant import quantize_kernel_int4
from psalm_tpu.ops.int4_matvec import (int4_matvec, int4_matvec_supported,
                                       int4_matvec_xla)


def _dequant(packed, scale, K, group):
    p = np.asarray(packed)
    low = (p.astype(np.int8) << 4) >> 4
    high = p.astype(np.int8) >> 4
    q = np.concatenate([low, high], 0).astype(np.float32)  # [K, N]
    G = K // group
    return (q.reshape(G, group, -1)
            * np.asarray(scale)[:, None, :]).reshape(K, -1)


@pytest.mark.parametrize("K,N,group", [
    (256, 384, 64),
    (8192, 256, 64),   # multi K-chunk accumulation path
    (256, 256, 32),    # non-default group
])
def test_layout_exact(K, N, group):
    rng = np.random.RandomState(1)
    G = K // group
    half = K // 2
    q = rng.randint(-7, 8, (K, N)).astype(np.int8)
    packed = ((q[half:].astype(np.uint8) << 4)
              | (q[:half].astype(np.uint8) & 0xF)).astype(np.int8)
    scale = np.exp2(rng.randint(-4, 3, (G, N))).astype(np.float32)
    rows = rng.permutation(K)[:8]
    x = np.zeros((8, K), np.float32)
    x[np.arange(8), rows] = 1.0

    got = np.asarray(int4_matvec(jnp.asarray(x, jnp.bfloat16),
                                 jnp.asarray(packed), jnp.asarray(scale),
                                 group, interpret=True))
    want = _dequant(packed, scale, K, group)[rows]
    np.testing.assert_array_equal(got, want)

    xla = np.asarray(int4_matvec_xla(jnp.asarray(x, jnp.bfloat16),
                                     jnp.asarray(packed), jnp.asarray(scale),
                                     group))
    np.testing.assert_array_equal(xla, want)


@pytest.mark.parametrize("B,K,N,group", [
    (1, 256, 384, 64),
    (4, 512, 128, 64),
    (1, 8192, 256, 64),
])
def test_value_close(B, K, N, group):
    rng = np.random.RandomState(0)
    w = rng.randn(K, N).astype(np.float32) * 0.02
    packed, scale = quantize_kernel_int4(w, group)
    x = jnp.asarray(rng.randn(B, K), jnp.bfloat16)

    assert int4_matvec_supported(B, K, N, group)
    got = np.asarray(int4_matvec(x, jnp.asarray(packed), jnp.asarray(scale),
                                 group, interpret=True))
    want = np.asarray(x, np.float32) @ _dequant(packed, scale, K, group)
    tol = 5e-3 * np.abs(want).max() + 2e-2 * np.abs(want)
    assert np.max(np.abs(got - want) - tol) < 0


def test_supported_gates():
    assert not int4_matvec_supported(1, 255, 128, 64)   # odd K
    assert not int4_matvec_supported(1, 256, 100, 64)   # N % 128
    assert not int4_matvec_supported(32, 256, 128, 64)  # too many rows
    assert not int4_matvec_supported(1, 256, 128, 0)    # bad group
    assert int4_matvec_supported(8, 2048, 8192, 64)     # phi fc1 decode
