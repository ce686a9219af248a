"""Criterion tests: cost kernels vs independent torch math, assignment
optimality, and end-to-end loss finiteness + gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from psalm_tpu.config import LossConfig
from psalm_tpu.train.criterion import (PSALMCriterion, batch_dice_cost,
                                       batch_sigmoid_ce_cost, hungarian_assign)


def test_batch_cost_kernels_match_torch():
    rng = np.random.default_rng(0)
    Q, N, P = 5, 3, 16
    inputs = rng.standard_normal((Q, P)).astype(np.float32)
    targets = (rng.uniform(size=(N, P)) > 0.5).astype(np.float32)

    ti, tt = torch.from_numpy(inputs), torch.from_numpy(targets)
    pos = F.binary_cross_entropy_with_logits(ti, torch.ones_like(ti),
                                             reduction="none")
    neg = F.binary_cross_entropy_with_logits(ti, torch.zeros_like(ti),
                                             reduction="none")
    want_ce = (torch.einsum("nc,mc->nm", pos, tt)
               + torch.einsum("nc,mc->nm", neg, 1 - tt)).numpy() / P

    got_ce = np.asarray(batch_sigmoid_ce_cost(jnp.asarray(inputs),
                                              jnp.asarray(targets)))
    np.testing.assert_allclose(got_ce, want_ce, rtol=1e-5, atol=1e-5)

    si = ti.sigmoid()
    num = 2 * torch.einsum("nc,mc->nm", si, tt)
    den = si.sum(-1)[:, None] + tt.sum(-1)[None, :]
    want_dice = (1 - (num + 1) / (den + 1)).numpy()
    got_dice = np.asarray(batch_dice_cost(jnp.asarray(inputs),
                                          jnp.asarray(targets)))
    np.testing.assert_allclose(got_dice, want_dice, rtol=1e-5, atol=1e-5)


def test_hungarian_assign_optimal():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(1)
    B, Q, N = 2, 6, 4
    cost = rng.standard_normal((B, Q, N)).astype(np.float32)
    n_valid = np.array([4, 2], np.int32)
    src, valid = jax.jit(hungarian_assign)(jnp.asarray(cost),
                                           jnp.asarray(n_valid))
    src, valid = np.asarray(src), np.asarray(valid)
    for b, n in enumerate(n_valid):
        rows, cols = linear_sum_assignment(cost[b, :, :n].astype(np.float64))
        want = rows[np.argsort(cols)]
        np.testing.assert_array_equal(src[b, :n], want)
        assert valid[b, :n].all() and not valid[b, n:].any()


def _outputs_targets(key, B=2, Q=6, K=4, N=3, h=16, w=16):
    ks = jax.random.split(key, 6)
    outputs = {
        "pred_masks": jax.random.normal(ks[0], (B, Q, h, w)),
        "pred_class_name_logits": jax.random.normal(ks[1], (B, Q, K)),
        "pred_SEG_logits": jax.random.normal(ks[2], (B, Q, 1)),
        "pred_region_logits": jax.random.normal(ks[3], (B, N, Q)),
        "aux_outputs": [],
    }
    targets = {
        "masks": (jax.random.uniform(ks[4], (B, N, h, w)) > 0.6).astype(jnp.float32),
        "labels": jax.random.randint(ks[5], (B, N), 0, K - 1),
        "valid": jnp.array([[True, True, True], [True, False, False]]),
    }
    return outputs, targets


def test_criterion_losses_finite_and_grads():
    cfg = LossConfig(train_num_points=32)
    crit = PSALMCriterion(cfg, num_queries=6)
    outputs, targets = _outputs_targets(jax.random.PRNGKey(0))

    losses = crit(jax.random.PRNGKey(1), outputs, targets, compute_seg=True,
                  compute_class=True, compute_region=True)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_mask"]) > 0
    assert float(losses["loss_total"]) > 0

    def loss_of_masks(masks):
        o = dict(outputs, pred_masks=masks)
        return crit(jax.random.PRNGKey(1), o, targets)["loss_total"]

    g = jax.grad(loss_of_masks)(outputs["pred_masks"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_auction_assign_near_optimal():
    from psalm_tpu.train.auction import auction_assign
    rng = np.random.default_rng(7)
    B, Q, N = 2, 50, 16
    n_valid = np.array([16, 5], np.int32)
    cost = rng.standard_normal((B, Q, N)).astype(np.float32) * 3
    for b in range(B):
        cost[b, :, n_valid[b]:] = 1e8
    src, valid = jax.jit(auction_assign)(jnp.asarray(cost),
                                         jnp.asarray(n_valid))
    src, valid = np.asarray(src), np.asarray(valid)
    from scipy.optimize import linear_sum_assignment
    for b in range(B):
        n = n_valid[b]
        assert valid[b, :n].all() and not valid[b, n:].any()
        assert len(set(src[b, :n].tolist())) == n  # distinct queries
        rows, cols = linear_sum_assignment(cost[b, :, :n].astype(np.float64))
        opt = cost[b, rows, cols].sum()
        got = cost[b, src[b, :n], np.arange(n)].sum()
        assert got <= opt + 0.02 * abs(opt) + 1e-3


def test_criterion_with_auction_matcher():
    from psalm_tpu.train.criterion import set_assign_impl
    set_assign_impl("auction")
    try:
        cfg = LossConfig(train_num_points=32)
        crit = PSALMCriterion(cfg, num_queries=6)
        outputs, targets = _outputs_targets(jax.random.PRNGKey(0))
        losses = crit(jax.random.PRNGKey(1), outputs, targets,
                      compute_class=True)
        assert np.isfinite(float(losses["loss_total"]))
        g = jax.grad(lambda m: crit(jax.random.PRNGKey(1),
                                    dict(outputs, pred_masks=m),
                                    targets)["loss_total"])(
            outputs["pred_masks"])
        assert np.isfinite(np.asarray(g)).all()
    finally:
        set_assign_impl("scipy")
