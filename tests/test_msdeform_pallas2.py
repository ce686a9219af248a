"""Lane-packed Pallas window sampler (ops/msdeform_window_pallas2):
interpret-mode parity vs the XLA window oracle, forward + custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
from psalm_tpu.ops.msdeform_window_pallas2 import ms_deform_attn_window_pallas2

SHAPES = ((4, 4), (8, 8), (16, 16))
B, M, D, L, P = 2, 8, 16, 3, 4
S = sum(h * w for h, w in SHAPES)
R = 2.0


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    refs = []
    for (H, W) in SHAPES:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
    # 1.5x the radius: exercises the clamp path on both sides identically
    off = rng.uniform(-R * 1.5, R * 1.5,
                      size=(B, S, M, L, P, 2)).astype(np.float32)
    loc = (ref[None, :, None, None, None, :]
           + off / norm[None, None, None, :, None, :]).astype(np.float32)
    val = rng.randn(B, S, M, D).astype(np.float32)
    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return jnp.asarray(val), jnp.asarray(loc), jnp.asarray(attn)


def test_forward_parity(inputs):
    val, loc, attn = inputs
    want = ms_deform_attn_window(val, SHAPES, loc, attn, tile=8, radius=R)
    got = ms_deform_attn_window_pallas2(val, SHAPES, loc, attn, tile=8,
                                        radius=R, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vjp_parity(inputs):
    val, loc, attn = inputs

    def f1(v, l, a):
        return jnp.sum(ms_deform_attn_window(
            v, SHAPES, l, a, tile=8, radius=R) ** 2)

    def f2(v, l, a):
        return jnp.sum(ms_deform_attn_window_pallas2(
            v, SHAPES, l, a, tile=8, radius=R, interpret=True) ** 2)

    g1 = jax.grad(f1, argnums=(0, 1, 2))(val, loc, attn)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(val, loc, attn)
    for a, b, name in zip(g1, g2, ("value", "loc", "attn")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_cpu_fallback_without_interpret(inputs):
    """Off-TPU without interpret the op must route to the XLA window path."""
    val, loc, attn = inputs
    want = ms_deform_attn_window(val, SHAPES, loc, attn, tile=8, radius=R)
    got = ms_deform_attn_window_pallas2(val, SHAPES, loc, attn, tile=8,
                                        radius=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
