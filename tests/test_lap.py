"""Exact on-device LAP (train/lap.py) vs scipy.optimize.linear_sum_assignment.

The solver must reach the Hungarian OPTIMUM (identical total cost) on every
instance; where the optimum is unique the assignment itself must match."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from psalm_tpu.train.lap import lap_assign


def _scipy_total(cost, n):
    rows, cols = linear_sum_assignment(cost[:, :n])
    return cost[rows, cols].sum()


@pytest.mark.parametrize("seed", range(4))
def test_lap_matches_scipy_optimum(seed):
    rng = np.random.default_rng(seed)
    B, Q, N = 3, 24, 13
    cost = rng.standard_normal((B, Q, N)).astype(np.float32) * 5.0
    n_valid = np.array([13, 7, 1], np.int32)
    # invalid columns carry the criterion's sentinel
    for b in range(B):
        cost[b, :, n_valid[b]:] = 1e8

    src, valid = jax.jit(lap_assign)(jnp.asarray(cost), jnp.asarray(n_valid))
    src, valid = np.asarray(src), np.asarray(valid)

    for b in range(B):
        n = int(n_valid[b])
        assert valid[b, :n].all() and not valid[b, n:].any()
        picked = src[b, :n]
        assert len(set(picked.tolist())) == n, "assignment must be injective"
        ours = cost[b, picked, np.arange(n)].sum()
        ref = _scipy_total(cost[b], n)
        np.testing.assert_allclose(ours, ref, rtol=1e-6,
                                   err_msg=f"not optimal (b={b})")


def test_lap_full_square_and_unique_optimum():
    # diagonal-dominant instance with a unique optimum: exact index match
    rng = np.random.default_rng(99)
    Q = N = 16
    base = rng.uniform(1.0, 2.0, (Q, N)).astype(np.float32)
    perm = rng.permutation(N)
    base[perm, np.arange(N)] = 0.0  # unique zero-cost perfect matching
    src, valid = jax.jit(lap_assign)(
        jnp.asarray(base[None]), jnp.asarray([N], np.int32))
    np.testing.assert_array_equal(np.asarray(src)[0], perm)
    assert np.asarray(valid).all()


def test_lap_zero_valid():
    cost = np.full((1, 5, 4), 1e8, np.float32)
    src, valid = jax.jit(lap_assign)(jnp.asarray(cost),
                                     jnp.asarray([0], np.int32))
    assert not np.asarray(valid).any()


def test_lap_100x100_scale():
    """The production shape (Q=100 queries, padded targets)."""
    rng = np.random.default_rng(7)
    Q, N = 100, 32
    cost = rng.standard_normal((1, Q, N)).astype(np.float32)
    n = 25
    cost[0, :, n:] = 1e8
    src, valid = jax.jit(lap_assign)(jnp.asarray(cost),
                                     jnp.asarray([n], np.int32))
    picked = np.asarray(src)[0, :n]
    assert len(set(picked.tolist())) == n
    np.testing.assert_allclose(cost[0, picked, np.arange(n)].sum(),
                               _scipy_total(cost[0], n), rtol=1e-6)


@pytest.mark.parametrize("seed", range(3))
def test_lap_full_square_boundary(seed):
    """N = Q = 100, every row valid: the tightest case for the counted
    Dijkstra bound (at row i the search may pop all i assigned columns
    before the single free one)."""
    rng = np.random.default_rng(100 + seed)
    B, Q = 2, 100
    N = Q
    cost = rng.standard_normal((B, Q, N)).astype(np.float32) * 3.0
    n_valid = np.array([N, N], np.int32)
    src, valid = jax.jit(lap_assign)(jnp.asarray(cost), jnp.asarray(n_valid))
    src = np.asarray(src)
    assert np.asarray(valid).all()
    for b in range(B):
        # a permutation (each target gets a distinct query)
        assert len(set(src[b].tolist())) == N
        total = cost[b][src[b], np.arange(N)].sum()
        np.testing.assert_allclose(total, _scipy_total(cost[b].T, N),
                                   rtol=1e-5)
