"""Single-chip train-step bench: LoRA(r8)+heads finetune at 1024^2, batch 1.

Mirrors the shipped single-chip recipe (LoRA adapters on Phi + all heads
trainable, vision tower + Phi base frozen, remat, deep supervision, on-device
auction matcher) and times one jitted panoptic train step per pixel-decoder
attention mode.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py \
      [deformable|window|dense ...]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.train.criterion import PSALMCriterion
from psalm_tpu.train.lora import (combine_params, partition_params,
                                  psalm_finetune_mask)
from psalm_tpu.train.train_step import make_optimizer
import __graft_entry__ as ge

import optax

MODES = sys.argv[1:] or ["window"]


def bench_mode(mode: str) -> float:
    cfg = PSALMConfig(compute_dtype="bfloat16")
    pd_kw = dict(attention_mode=mode)
    if mode == "window":
        # mirror train/train.py's training settings: radius headroom 8 and
        # the einsum-pair formulation (better-parallelizing backward)
        pd_kw.update(window_radius=8.0, window_scan_tiles=False)
    if mode == "dense":
        pd_kw["transformer_nheads"] = 2
    cfg = cfg.replace(
        pixel_decoder=dataclasses.replace(cfg.pixel_decoder, **pd_kw),
        phi=dataclasses.replace(cfg.phi, lora_rank=8))
    K = cfg.num_classes + 1
    model = PSALM(cfg, dtype=jnp.bfloat16, remat=True)
    batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
    N = 20
    rng = np.random.RandomState(0)
    batch["gt_masks"] = jnp.asarray(
        rng.rand(1, N, 1024 // 4, 1024 // 4) > 0.7, jnp.float32)
    batch["gt_labels"] = jnp.asarray(rng.randint(0, K - 1, (1, N)), jnp.int32)
    batch["gt_valid"] = jnp.asarray(np.arange(N)[None] < 12, jnp.bool_)

    variables = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    criterion = PSALMCriterion(cfg.loss, cfg.mask_decoder.num_queries)
    mask = psalm_finetune_mask(variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    n_tr = sum(x.size for x in jax.tree.leaves(trainable))
    n_fr = sum(x.size for x in jax.tree.leaves(frozen))
    print(f"[{mode}] trainable {n_tr/1e6:.1f}M / frozen {n_fr/1e6:.1f}M",
          file=sys.stderr)
    tx = make_optimizer(6e-5, 1000)
    opt_state = jax.jit(tx.init)(trainable)

    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(tr, fz, batch, rng):
        params = {"params": combine_params(tr, fz), **extra}
        out = model.apply(params, batch, train=True, use_class_names=True,
                          num_class_names=K)
        targets = {"masks": batch["gt_masks"], "labels": batch["gt_labels"],
                   "valid": batch["gt_valid"]}
        losses = criterion(rng, out, targets, compute_class=True)
        return losses["loss_total"], losses

    @jax.jit
    def step(tr, fz, opt_state, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tr, fz, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, tr)
        tr = optax.apply_updates(tr, updates)
        return tr, opt_state, loss

    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    trainable, opt_state, loss = step(trainable, frozen, opt_state, batch, key)
    print(f"[{mode}] first step (compile) {time.perf_counter()-t_c0:.1f}s "
          f"loss={float(loss):.3f}", file=sys.stderr)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        trainable, opt_state, loss = step(trainable, frozen, opt_state,
                                          batch, key)
        float(loss)  # host sync
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(f"[{mode}] step p50 {p50:.2f}s (loss {float(loss):.3f})")
    return p50


for m in MODES:
    bench_mode(m)
