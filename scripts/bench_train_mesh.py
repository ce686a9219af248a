"""8-device-mesh train-step artifact: the full dp+tp sharded step executed
and timed over several steps on a mesh.

Real multi-chip hardware is not available in this sandbox, so by default
this runs on the virtual 8-device CPU mesh (the same path the driver's
dryrun_multichip validates) — the artifact demonstrates the SPMD training
plumbing (ZeRO-sharded opt state composed with TP specs, batch sharded
over 'data') executes end-to-end over multiple optimizer steps with a
finite, decreasing loss; CPU step times are NOT hardware-representative.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python scripts/bench_train_mesh.py [n_devices]
"""
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    assert len(jax.devices()) >= n, (
        f"need {n} devices, have {len(jax.devices())}; set "
        "XLA_FLAGS=--xla_force_host_platform_device_count and "
        "JAX_PLATFORMS=cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.psalm import PSALM
    from psalm_tpu.parallel.mesh import make_mesh, param_shardings
    from psalm_tpu.train.criterion import PSALMCriterion
    from psalm_tpu.train.train_step import (init_state, make_optimizer,
                                            make_train_step)
    import __graft_entry__ as ge

    model_par = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(data=n // model_par, model=model_par,
                     devices=jax.devices()[:n])
    cfg = tiny_test_config()
    cfg = cfg.replace(pixel_decoder=dataclasses.replace(
        cfg.pixel_decoder, attention_mode="window"))
    K = 4
    model = PSALM(cfg)
    B = mesh.shape["data"]
    batch = ge._panoptic_batch(cfg, B=B, num_classes=K)
    N_max = 4
    s = cfg.image_size
    rng = np.random.default_rng(1)
    batch["gt_masks"] = jnp.asarray(
        (rng.uniform(size=(B, N_max, s, s)) > 0.7).astype(np.float32))
    batch["gt_labels"] = jnp.asarray(
        rng.integers(0, K - 1, size=(B, N_max)), jnp.int32)
    batch["gt_valid"] = jnp.asarray(
        np.tile(np.arange(N_max) < 2, (B, 1)))

    variables = model.init(jax.random.PRNGKey(0), batch,
                           use_class_names=True, num_class_names=K)
    criterion = PSALMCriterion(cfg.loss, cfg.mask_decoder.num_queries)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch, train=True, use_class_names=True,
                          num_class_names=K)
        targets = {"masks": batch["gt_masks"], "labels": batch["gt_labels"],
                   "valid": batch["gt_valid"]}
        losses = criterion(rng, out, targets, compute_class=True)
        return losses["loss_total"], losses

    tx = make_optimizer(6e-5, 100)
    shard = param_shardings(mesh, variables)
    state = init_state(variables, tx, mesh=mesh, param_sh=shard)
    step = make_train_step(loss_fn, tx, mesh=mesh)
    bsh = NamedSharding(mesh, P("data"))
    sharded_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    losses, times = [], []
    key = jax.random.PRNGKey(1)
    for i in range(6):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = step(state, sharded_batch, k)
        loss = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
        losses.append(round(loss, 4))
        print(f"step {i}: loss {loss:.4f}  "
              f"{times[-1] * 1e3:.0f} ms", file=sys.stderr)
    assert np.isfinite(losses).all()
    p50 = sorted(times[1:])[len(times[1:]) // 2]
    print(json.dumps({
        "n_devices": n, "mesh": dict(mesh.shape), "steps": len(times),
        "losses": losses, "step_p50_ms": round(p50 * 1e3, 1),
        "platform": jax.devices()[0].platform,
        "note": "virtual CPU mesh: plumbing validation, not hardware perf",
    }))


if __name__ == "__main__":
    main()
