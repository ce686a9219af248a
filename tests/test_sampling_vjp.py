"""point_sample_mmgrad: identical forward and feature-gradient to the
gather-based point_sample's autodiff, with a matmul backward (no scatter).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.ops.sampling import point_sample, point_sample_mmgrad


def _coords(rng, B, P, spread=1.3, offset=-0.15):
    """Coords covering in-range, out-of-range and exact-grid points."""
    c = rng.rand(B, P, 2) * spread + offset
    c[:, :3] = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    return jnp.asarray(c, jnp.float32)


@pytest.mark.parametrize("shape", [(2, 16, 16, 4), (1, 31, 17, 20),
                                   (2, 8, 8, 1)])
def test_forward_matches_point_sample(shape):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(*shape), jnp.float32)
    coords = _coords(rng, shape[0], 57)
    a = point_sample(feat, coords, align_corners=False)
    b = point_sample_mmgrad(feat, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,P", [((2, 16, 16, 4), 57),
                                     ((1, 32, 24, 20), 300),
                                     ((2, 8, 8, 1), 9)])
def test_feature_grad_matches_gather_vjp(shape, P):
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(*shape), jnp.float32)
    coords = _coords(rng, shape[0], P)
    w = jnp.asarray(rng.randn(shape[0], P, shape[-1]), jnp.float32)

    def loss_ref(f):
        return jnp.sum(point_sample(f, coords, align_corners=False) * w)

    def loss_mm(f):
        return jnp.sum(point_sample_mmgrad(f, coords) * w)

    g_ref = jax.grad(loss_ref)(feat)
    g_mm = jax.grad(loss_mm)(feat)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mm),
                               rtol=1e-4, atol=1e-4)


def test_coords_grad_is_zero_by_contract():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    coords = _coords(rng, 1, 11)
    g = jax.grad(lambda c: jnp.sum(point_sample_mmgrad(feat, c)))(coords)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_grad_under_jit_and_chunking():
    # P large enough to exercise the chunked scan path
    rng = np.random.RandomState(3)
    B, H, W, C = 1, 64, 64, 20
    P = 2048
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    coords = _coords(rng, B, P)
    w = jnp.asarray(rng.randn(B, P, C), jnp.float32)
    g_ref = jax.jit(jax.grad(lambda f: jnp.sum(
        point_sample(f, coords, align_corners=False) * w)))(feat)
    g_mm = jax.jit(jax.grad(lambda f: jnp.sum(
        point_sample_mmgrad(f, coords) * w)))(feat)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mm),
                               rtol=1e-4, atol=1e-4)


def test_feature_grad_align_corners_true():
    """align_corners=True (the region sampler's convention) grads match the
    gather VJP too."""
    rng = np.random.RandomState(5)
    B, H, W, C = 2, 16, 16, 8
    P = 40
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    coords = _coords(rng, B, P)
    w = jnp.asarray(rng.randn(B, P, C), jnp.float32)
    g_ref = jax.grad(lambda f: jnp.sum(
        point_sample(f, coords, align_corners=True) * w))(feat)
    g_mm = jax.grad(lambda f: jnp.sum(
        point_sample_mmgrad(f, coords, align_corners=True) * w))(feat)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mm),
                               rtol=1e-4, atol=1e-5)
