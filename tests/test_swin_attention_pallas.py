"""Fused Swin window-attention kernel (ops/swin_attention_pallas):
interpret-mode parity vs the XLA formulation, with and without the shift
mask, plus gradient flow through the custom VJP's recompute path."""

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.ops.swin_attention_pallas import (_xla_reference,
                                                 fused_window_attention)


def _inputs(seed=0, Bn=6, N=16, C=32, h=4, nW=3):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(Bn, N, 3 * C), jnp.float32)
    bias = jnp.asarray(rng.randn(h, N, N), jnp.float32)
    mask = jnp.asarray(rng.randn(nW, N, N) * 2, jnp.float32)
    return qkv, bias, mask


def test_parity_masked_and_unmasked():
    qkv, bias, mask = _inputs()
    Bn, N, _ = qkv.shape
    nW = mask.shape[0]
    mf = jnp.broadcast_to(mask[None], (Bn // nW, nW, N, N)).reshape(Bn, N, N)
    want = _xla_reference(qkv, bias, mf, 4, 0.25)
    got = fused_window_attention(qkv, bias, mask, 4, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    want2 = _xla_reference(qkv, bias, None, 4, 0.25)
    got2 = fused_window_attention(qkv, bias, None, 4, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)


def test_vjp_matches_xla():
    qkv, bias, mask = _inputs(seed=1)
    Bn, N, _ = qkv.shape
    nW = mask.shape[0]
    mf = jnp.broadcast_to(mask[None], (Bn // nW, nW, N, N)).reshape(Bn, N, N)

    # on CPU the op routes to the XLA formulation; grads must flow and match
    def f(a):
        return jnp.sum(fused_window_attention(a, bias, mask, 4, 0.25) ** 2)

    def f_ref(a):
        return jnp.sum(_xla_reference(a, bias, mf, 4, 0.25) ** 2)

    g = jax.grad(f)(qkv)
    g_ref = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
