"""A/B the assignment implementations over a short train run (VERDICT r2 #5).

Runs the same tiny-config panoptic training trajectory three times — scipy
host-callback Hungarian, exact on-device LAP, approximate on-device auction —
from identical inits/batches/rng, and reports per-step loss components and
grad-norm divergence vs the scipy reference.

CPU-friendly:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/ab_matcher.py [steps]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.train import criterion as crit_mod
from psalm_tpu.train.criterion import PSALMCriterion
from psalm_tpu.train.train_step import make_optimizer
import __graft_entry__ as ge

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def run(impl: str):
    crit_mod.set_assign_impl(impl)
    cfg = tiny_test_config()
    K = 4
    model = PSALM(cfg)
    batch0 = ge._panoptic_batch(cfg, B=2, num_classes=K)
    s = cfg.image_size
    variables = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch0)
    criterion = PSALMCriterion(cfg.loss, cfg.mask_decoder.num_queries)
    tx = make_optimizer(1e-4, STEPS * 2)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params, **extra}, batch,
                          use_class_names=True, num_class_names=K)
        targets = {"masks": batch["gt_masks"], "labels": batch["gt_labels"],
                   "valid": batch["gt_valid"]}
        losses = criterion(rng, out, targets, compute_class=True)
        return losses["loss_total"], losses

    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {**aux, "grad_norm": gnorm}

    history = []
    drng = np.random.default_rng(123)
    for i in range(STEPS):
        # fresh synthetic batch per step, same across impls (seeded)
        N_max = 6
        gt = (drng.uniform(size=(2, N_max, s, s)) > 0.7).astype(np.float32)
        batch = dict(batch0)
        batch["gt_masks"] = jnp.asarray(gt)
        batch["gt_labels"] = jnp.asarray(
            drng.integers(0, K - 1, (2, N_max)))
        batch["gt_valid"] = jnp.asarray(
            np.arange(N_max)[None] < drng.integers(2, N_max + 1, (2, 1)))
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(1000 + i))
        history.append({k: float(v) for k, v in m.items()})
    return history


def main():
    t0 = time.time()
    runs = {impl: run(impl) for impl in ("scipy", "lap", "auction")}
    ref = runs["scipy"]
    report = {"steps": STEPS, "wall_s": round(time.time() - t0, 1)}
    for impl in ("lap", "auction"):
        h = runs[impl]
        keys = [k for k in ref[0] if k.startswith("loss") or k == "grad_norm"]
        div = {}
        for k in keys:
            r = np.array([st[k] for st in ref])
            o = np.array([st[k] for st in h])
            denom = np.maximum(np.abs(r), 1e-8)
            div[k] = {"max_rel": float(np.max(np.abs(o - r) / denom)),
                      "final_rel": float(abs(o[-1] - r[-1]) / denom[-1])}
        report[impl + "_vs_scipy"] = div
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
