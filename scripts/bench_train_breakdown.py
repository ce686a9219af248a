"""Per-stage train-step breakdown: where do the 1.94 s go?

Decomposes the single-chip panoptic train step (LoRA r8 + heads, bf16,
remat) into separately-jitted pieces, each timed with REAL jit arguments
(closure constants fold — the round-1 lesson):

  model_fwd        forward only (inference apply, train=True)
  model_fwd_bwd    forward + backward through a constant-weighted sum of
                   every output head (isolates the model's grad cost)
  crit_fwd         criterion forward (matching + all losses, outputs as args)
  crit_fwd_bwd     criterion forward + grad wrt the model outputs
  crit_final_only  criterion without deep supervision (1 layer vs 10)
  full_step        the shipped train step (value_and_grad + AdamW)

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_breakdown.py [B]
"""
import dataclasses
import json
import os
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
# knobs so one TPU session can bisect the step cost:
#   PSALM_TB_REMAT=0   drop jax.remat (recompute) — costs ~1 extra fwd
#   PSALM_TB_RADIUS=4  window radius for the msdeform backward
#   PSALM_TB_FLASH=1   flash attention in Phi (train-side)
REMAT = os.environ.get("PSALM_TB_REMAT", "1") == "1"
RADIUS = float(os.environ.get("PSALM_TB_RADIUS", "8"))
# PSALM_TB_POINT_RADII=2,4,6,8 -> per-point clamp radii (overrides RADIUS)
POINT_RADII = tuple(
    float(r) for r in os.environ.get("PSALM_TB_POINT_RADII", "").split(",")
    if r)
FLASH = os.environ.get("PSALM_TB_FLASH", "0") == "1"
# PSALM_TB_STAGES=crit_fwd_bwd,full_step  -> run only those stages
STAGES = [s for s in os.environ.get("PSALM_TB_STAGES", "").split(",") if s]
# PSALM_TB_ASSIGN=scipy|lap|auction -> force the matcher implementation
ASSIGN = os.environ.get("PSALM_TB_ASSIGN", "")


def want(stage):
    return not STAGES or stage in STAGES


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timer import scan_rate_ms


def timed(fn, *args, iters=4, warmup=1, label=""):
    """Device ms via the in-program scan difference method (scan_timer.py) —
    pure device time regardless of tunnel state (round-3's async-dispatch
    methodology inherited the backend's overlapped-dispatch penalty). A
    failing stage reports -1 instead of killing the run (the tunneled axon
    runtime can reject individual programs)."""
    try:
        ms = scan_rate_ms(fn, *args, k=4, reps=2)
    except Exception as e:  # noqa: BLE001 — keep the remaining stages
        print(f"  {label:<18} failed ({type(e).__name__}: {e}); "
              "retrying in 120 s", file=sys.stderr)
        time.sleep(120)  # transient axon wedges usually clear
        try:
            ms = scan_rate_ms(fn, *args, k=4, reps=2)
        except Exception as e2:  # noqa: BLE001
            print(f"  {label:<18} FAILED: {type(e2).__name__}: {e2}",
                  file=sys.stderr)
            return -1.0
    print(f"  {label:<18} {ms:8.1f} ms", file=sys.stderr)
    return ms / 1e3


def main():
    cfg = PSALMConfig(compute_dtype="bfloat16")
    cfg = cfg.replace(
        pixel_decoder=dataclasses.replace(
            cfg.pixel_decoder, attention_mode="window", window_radius=RADIUS,
            window_point_radii=POINT_RADII,
            window_head_chunk=1,  # train setting: h>1 regresses the bwd
            window_scan_tiles=os.environ.get("PSALM_TB_SCAN", "0") == "1",
            # PSALM_TB_CVJP=1: manual-VJP tile-scan core (VERDICT r4 #2)
            window_custom_vjp=os.environ.get("PSALM_TB_CVJP", "0") == "1"),
        phi=dataclasses.replace(cfg.phi, lora_rank=8))
    K = cfg.num_classes + 1
    # PSALM_TB_REMAT_PIX=0: skip pixel-decoder remat (with the custom VJP
    # only op inputs are saved, so the encoder recompute buys little)
    rp = os.environ.get("PSALM_TB_REMAT_PIX")
    model = PSALM(cfg, dtype=jnp.bfloat16, remat=REMAT, use_flash=FLASH,
                  remat_pixel=None if rp is None else rp == "1")
    batch = ge._panoptic_batch(cfg, B=B, num_classes=K)
    N = 20
    rng = np.random.RandomState(0)
    batch["gt_masks"] = jnp.asarray(
        rng.rand(B, N, 1024 // 4, 1024 // 4) > 0.7, jnp.float32)
    batch["gt_labels"] = jnp.asarray(rng.randint(0, K - 1, (B, N)), jnp.int32)
    batch["gt_valid"] = jnp.asarray(
        np.tile(np.arange(N) < 12, (B, 1)), jnp.bool_)

    variables = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    if ASSIGN:
        from psalm_tpu.train.criterion import set_assign_impl
        set_assign_impl(ASSIGN)
    criterion = PSALMCriterion(cfg.loss, cfg.mask_decoder.num_queries)
    mask = psalm_finetune_mask(variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    if os.environ.get("PSALM_TB_BF16", "0") == "1":
        frozen = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, frozen)
    extra = {k: v for k, v in variables.items() if k != "params"}
    targets = {"masks": batch["gt_masks"], "labels": batch["gt_labels"],
               "valid": batch["gt_valid"]}
    key = jax.random.PRNGKey(1)
    results = {}
    print(f"batch={B}", file=sys.stderr)

    # -- model forward ------------------------------------------------------
    def apply_model(tr, fz, batch):
        params = {"params": combine_params(tr, fz), **extra}
        return model.apply(params, batch, train=True, use_class_names=True,
                           num_class_names=K)

    if want("model_fwd"):
        fwd = jax.jit(lambda tr, fz, b: apply_model(tr, fz, b)["pred_masks"])
        results["model_fwd"] = timed(fwd, trainable, frozen, batch,
                                     label="model_fwd")

    # train-vs-eval fwd delta: same params, eval-mode apply (no aux heads,
    # no gt attention masks) — quantifies what train=True costs the forward
    if want("model_fwd_eval"):
        ebatch = {k: v for k, v in batch.items()
                  if k not in ("gt_masks", "gt_labels", "gt_valid")}
        efwd = jax.jit(lambda tr, fz, b: model.apply(
            {"params": combine_params(tr, fz), **extra}, b, train=False,
            use_class_names=True, num_class_names=K)["pred_masks"])
        results["model_fwd_eval"] = timed(efwd, trainable, frozen, ebatch,
                                          label="model_fwd_eval")

    # -- model forward+backward (criterion replaced by a constant-weight sum
    # over every supervised head so ALL the model's grad paths are exercised)
    def dummy_loss(tr, fz, batch):
        out = apply_model(tr, fz, batch)
        layers = [out] + list(out.get("aux_outputs", []))
        total = 0.0
        for lo in layers:
            total += jnp.sum(lo["pred_masks"].astype(jnp.float32) * 1e-6)
            if lo.get("pred_class_name_logits") is not None:
                total += jnp.sum(
                    lo["pred_class_name_logits"].astype(jnp.float32) * 1e-6)
        return total

    if want("model_fwd_bwd"):
        mg = jax.jit(lambda tr, fz, b: jax.grad(dummy_loss)(tr, fz, b))
        results["model_fwd_bwd"] = timed(mg, trainable, frozen, batch,
                                         label="model_fwd_bwd")

    # same, with a fixed random weighting: the constant-weight dummy loss
    # gives every head a CONSTANT cotangent that XLA folds into cheap
    # reduced backward einsums; random weights keep the backward honest
    if want("model_fwd_bwd_rand"):
        wrng = np.random.RandomState(7)

        def rand_loss(tr, fz, batch, ws):
            out = apply_model(tr, fz, batch)
            layers = [out] + list(out.get("aux_outputs", []))
            total = 0.0
            for li, lo in enumerate(layers):
                total += jnp.sum(lo["pred_masks"].astype(jnp.float32)
                                 * ws[li])
                if lo.get("pred_class_name_logits") is not None:
                    total += jnp.mean(
                        lo["pred_class_name_logits"].astype(jnp.float32))
            return total * 1e-6

        shapes = jax.eval_shape(apply_model, trainable, frozen, batch)
        n_layers = 1 + len(shapes.get("aux_outputs", ()))
        ws = [jnp.asarray(wrng.randn(B, 1, 256, 256), jnp.float32)
              for _ in range(n_layers)]
        mgr = jax.jit(lambda tr, fz, b, ws: jax.grad(rand_loss)(
            tr, fz, b, ws))
        results["model_fwd_bwd_rand"] = timed(mgr, trainable, frozen, batch,
                                              ws, label="model_fwd_bwd_rand")

    # -- criterion on materialized outputs (outputs as jit ARGS) ------------
    out_ex = jax.jit(apply_model)(trainable, frozen, batch)
    # round-trip through host: device-produced outputs can carry layouts
    # the criterion grad program rejects on the axon runtime
    # (INVALID_ARGUMENT at dispatch); host re-upload normalizes them.
    # Cast float leaves to f32 (the criterion's internal compute dtype) —
    # grad-wrt-bf16-leaf programs are another axon dispatch-failure shape.
    out_ex = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x).astype(np.float32))
        if hasattr(x, "dtype") and x.dtype in (jnp.bfloat16, jnp.float16)
        else (jnp.asarray(np.asarray(x)) if hasattr(x, "dtype") else x),
        out_ex)
    # grad only wrt the loss-relevant heads: the full apply() output also
    # carries the lm 'logits' [B, S, 51200] and 'hidden' — zero-cotangent
    # leaves that balloon the grad program (and INVALID_ARGUMENT the axon
    # dispatch) without being part of the seg criterion's gradient
    CRIT_KEYS = ("pred_masks", "pred_class_name_logits", "pred_SEG_logits",
                 "pred_region_logits")
    out_ex = {
        **{k: out_ex.get(k) for k in CRIT_KEYS},
        "aux_outputs": [{k: lo.get(k) for k in CRIT_KEYS}
                        for lo in out_ex.get("aux_outputs", [])],
    }

    if want("crit_fwd"):
        cf = jax.jit(lambda o, t, k: criterion(k, o, t, compute_class=True)
                     ["loss_total"])
        results["crit_fwd"] = timed(cf, out_ex, targets, key,
                                    label="crit_fwd")

    def crit_loss(o, t, k):
        return criterion(k, o, t, compute_class=True)["loss_total"]

    if want("crit_fwd_bwd"):
        cg = jax.jit(lambda o, t, k: jax.grad(crit_loss)(o, t, k))
        results["crit_fwd_bwd"] = timed(cg, out_ex, targets, key,
                                        label="crit_fwd_bwd")

    # -- criterion without deep supervision ----------------------------------
    if want("crit_final_only"):
        out_final = {k: v for k, v in out_ex.items() if k != "aux_outputs"}
        cg1 = jax.jit(lambda o, t, k: jax.grad(crit_loss)(o, t, k))
        results["crit_final_only"] = timed(cg1, out_final, targets, key,
                                           label="crit_final_only")

    # -- full step ------------------------------------------------------------
    tx = make_optimizer(6e-5, 1000)
    try:
        opt_state = jax.jit(tx.init)(trainable)
    except Exception as e:  # noqa: BLE001 — transient axon dispatch failures
        print(f"  jit tx.init FAILED ({type(e).__name__}: {e}); "
              "retrying eager", file=sys.stderr)
        opt_state = tx.init(trainable)

    def loss_fn(tr, fz, batch, rng):
        out = apply_model(tr, fz, batch)
        losses = criterion(rng, out, targets, compute_class=True)
        return losses["loss_total"], losses

    @jax.jit
    def step(tr, fz, opt_state, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tr, fz, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, tr)
        tr = optax.apply_updates(tr, updates)
        # return the updated state: returning only the loss lets XLA DCE
        # the whole backward+optimizer (measured 0.25 s "steps")
        return tr, opt_state, loss

    if want("full_step"):
        results["full_step"] = timed(step, trainable, frozen, opt_state,
                                     batch, key, label="full_step")

    # -- chained multi-step training rate (the images/sec/chip number) -------
    # k steps inside ONE dispatch with (params, opt_state, rng) carried
    # through — a realistic consecutive-steps run, device time by the same
    # difference method
    if want("train_rate"):
        def run_k(length, tr, fz, opt_state, batch, rng):
            # fz must be an ARGUMENT: closed over, the 1.5B frozen params
            # lower as 5.6 GB of captured constants and OOM the chip
            def body(carry, _):
                tr_, opt_, rng_ = carry
                rng_, sub = jax.random.split(rng_)
                tr_, opt_, loss = step_impl(tr_, fz, opt_, batch, sub)
                return (tr_, opt_, rng_), loss
            (tr, opt_state, _), losses = jax.lax.scan(
                body, (tr, opt_state, rng), None, length=length)
            return losses[-1]

        def step_impl(tr, fz, opt_state, batch, rng):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                tr, fz, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return tr, opt_state, loss

        try:
            jr = jax.jit(run_k, static_argnums=0)
            for length in (1, 4):
                float(jr(length, trainable, frozen, opt_state, batch, key))
            per = []
            for _ in range(2):
                t0 = time.perf_counter()
                float(jr(1, trainable, frozen, opt_state, batch, key))
                t1 = time.perf_counter()
                float(jr(4, trainable, frozen, opt_state, batch, key))
                t2 = time.perf_counter()
                per.append(((t2 - t1) - (t1 - t0)) / 3)
            sec = sorted(per)[len(per) // 2]
            results["train_rate_step"] = sec
            print(f"  {'train_rate':<18} {sec * 1e3:8.1f} ms/step "
                  f"({B / sec:.2f} img/s/chip)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"  train_rate FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    results = {k: round(v * 1e3, 1) for k, v in results.items()}
    print(json.dumps({"batch": B, "remat": REMAT,
                      "radius": (list(POINT_RADII) or RADIUS),
                      "flash": FLASH, "ms": results,
                      "train_img_per_s_per_chip": round(
                          B / results["train_rate_step"] * 1e3, 3)
                      if results.get("train_rate_step", -1) > 0 else None}))


if __name__ == "__main__":
    main()
