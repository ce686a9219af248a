"""Training entrypoint.

Reference spec: psalm/train/train.py + llava_trainer.py + scripts/train.sh —
joint multi-task training (panoptic/instance/interactive/referring/mm_conv
batches interleaved, each batch task-homogeneous), lr 6e-5 cosine warmup
0.03, bf16 compute, gradient checkpointing, checkpoints every save_steps
keep-1 with auto-resume, per-component loss logging with the last-nonzero
history fallback of LLaVATrainer.compute_loss (llava_trainer.py:258-318).

TPU-native runtime: pjit over a ('data','model') mesh replaces DeepSpeed
ZeRO-2/NCCL; optimizer moments are sharded over 'data'; orbax replaces HF
Trainer checkpoints; jax.profiler trace hooks are first-class
(--profile_steps).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from psalm_tpu.config import PSALMConfig, SegTask
from psalm_tpu.data.constants import IGNORE_INDEX
from psalm_tpu.data.datasets import (DataConfig, InstanceDataset,
                                     InteractiveDataset, MMConvDataset,
                                     PanopticDataset, ReferringDataset,
                                     SemanticDataset, UnifiedTaskSampler,
                                     collate)
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.train.criterion import PSALMCriterion
from psalm_tpu.train.train_step import (TrainState, init_state, make_optimizer,
                                        make_train_step)

LOSS_KEYS = ["loss_mask", "loss_dice", "loss_SEG_class",
             "loss_class_name_class", "loss_region_class", "loss_llm"]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", default=None,
                   help="HF Phi dir or PSALM checkpoint to initialize from")
    p.add_argument("--mask2former_ckpt", default=None,
                   help="Mask2Former Swin-B .pkl for vision init")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--panoptic_json_path", default=None)
    p.add_argument("--instance_json_path", default=None)
    p.add_argument("--semantic_json_path", default=None)
    p.add_argument("--semantic_label_folder", default=None)
    p.add_argument("--region_json_path", default=None)
    p.add_argument("--ref_coco_path", default=None)
    p.add_argument("--mmconv_path", default=None)
    p.add_argument("--image_folder", default=None)
    p.add_argument("--seg_task", default="panoptic")
    p.add_argument("--data_ratio", default="1||1||1||1")
    p.add_argument("--learning_rate", type=float, default=6e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--num_train_steps", type=int, default=100000)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--dataloader_num_workers", type=int, default=4,
                   help="async input-pipeline mapper threads "
                        "(data/prefetch.py); 0 = synchronous")
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--save_steps", type=int, default=15000)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--gradient_checkpointing", type=bool, default=True)
    p.add_argument("--bf16", type=bool, default=True)
    p.add_argument("--profile_steps", default=None,
                   help="e.g. '10,15' to trace steps 10-15 to output_dir")
    p.add_argument("--report_to", default="none",
                   help="'tensorboard' writes scalars to output_dir/tb")
    p.add_argument("--tune_mm_mlp_adapter", type=bool, default=False,
                   help="stage-1 style: checkpoint only the mm_projector "
                        "(llava_trainer.py:231-256)")
    p.add_argument("--pixel_decoder_mode", default="deformable",
                   choices=["deformable", "window", "dense"],
                   help="'window' = deformable math as per-tile MXU matmuls "
                        "(checkpoint-compatible; exact while offsets stay "
                        "within ±8 px, clamped beyond). 'dense' (flash "
                        "attention, 2 heads) is a from-scratch alternative. "
                        "Both avoid the loop-bound gather/scatter that makes "
                        "plain 'deformable' 51 s/step at 1024^2 on v5e")
    p.add_argument("--window_point_radii", default="",
                   help="comma-separated per-point clamp radii for window "
                        "mode, e.g. '2,4,6,8' (= the same 2x-init margin "
                        "per point that flat r=8 gives the largest point, "
                        "~25%% less sampler matmul work). Default '' keeps "
                        "the flat --window_radius: training has no runtime "
                        "clamp guard, so the flat radius maximizes "
                        "offset-growth headroom for every point")
    p.add_argument("--remat_pixel_decoder", type=int, default=-1,
                   help="1/0 = force pixel-decoder gradient checkpointing "
                        "on/off; -1 follows --gradient_checkpointing. With "
                        "--window_custom_vjp the encoder layers save only "
                        "op inputs, so 0 trades ~600 MB (B=1) for skipping "
                        "the encoder forward recompute in the backward")
    p.add_argument("--window_custom_vjp", type=int, default=-1,
                   help="1 = manual-VJP tile-scan window core (keeps the "
                        "t1/d_t1 intermediates per-tile in the backward, "
                        "ops/msdeform_window.py); 0 = AD einsum pair; "
                        "-1 (default) = the measured-best setting")
    p.add_argument("--swin_type", default="base")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


class LossHistory:
    """Last-nonzero fallback logging (llava_trainer.py:258-318): alternating
    task batches zero out absent loss components; log the last seen value."""

    def __init__(self):
        self.hist: Dict[str, float] = {k: 0.0 for k in LOSS_KEYS}

    def update(self, metrics: Dict[str, Any]) -> Dict[str, float]:
        out = {}
        for k in LOSS_KEYS:
            v = float(metrics.get(k, 0.0))
            if v != 0.0:
                self.hist[k] = v
            out[k] = self.hist[k]
        out["loss"] = float(metrics.get("loss", 0.0))
        if "grad_norm" in metrics:
            out["grad_norm"] = float(metrics["grad_norm"])
        return out


def llm_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted CE ignoring IGNORE_INDEX (llava_phi.py:1063-1073)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    logp = jax.nn.log_softmax(shift_logits, -1)
    nll = -jnp.take_along_axis(logp, jnp.clip(shift_labels, 0)[..., None],
                               -1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(valid.sum(), 1)


def build_train_config(args) -> PSALMConfig:
    """PSALMConfig from CLI args (the reference's training_args -> cfg path,
    train.py:23-35). Extracted from Trainer.__init__ so the arg->config
    policy (incl. measured-best defaults) is unit-testable without building
    the model."""
    cfg = PSALMConfig(
        seg_task=SegTask(args.seg_task),
        compute_dtype="bfloat16" if args.bf16 else "float32")
    mode = getattr(args, "pixel_decoder_mode", "deformable")
    if mode != "deformable":
        import dataclasses as _dc
        kw = dict(attention_mode=mode)
        if mode == "window":
            # training headroom: offsets grow past the init magnitude
            # and no runtime radius guard exists inside a train step
            # (EvalRunner's auto-raise is eval-only)
            kw["window_radius"] = float(getattr(
                args, "window_radius", 8.0))
            ppr = getattr(args, "window_point_radii", "")
            if ppr:
                kw["window_point_radii"] = tuple(
                    float(r) for r in str(ppr).split(","))
            # einsum-pair formulation as the AD fallback: its backward
            # parallelizes better than the tile-scan's sequential VJP
            kw["window_scan_tiles"] = False
            cv = int(getattr(args, "window_custom_vjp", -1))
            # -1 = measured-best: the manual VJP (round-5 chip A/B:
            # per-op fwd+bwd 43.6 vs 51.4 ms AD einsum at r8;
            # full_step 453.9 vs 504.1 ms, BASELINE.md round-5)
            kw["window_custom_vjp"] = cv != 0
            # head chunking regresses the einsum backward (r4 sweep:
            # fbwd 50.2 ms at h1 vs 66.7/68.4 at h4/h8); the eval
            # default h2 is a forward-only win
            kw["window_head_chunk"] = 1
        if mode == "dense":
            kw["transformer_nheads"] = 2
        cfg = cfg.replace(pixel_decoder=_dc.replace(
            cfg.pixel_decoder, **kw))
    return cfg


class Trainer:
    def __init__(self, args, cfg: Optional[PSALMConfig] = None, model=None,
                 variables=None, mesh=None):
        self.args = args
        if cfg is None:
            cfg = build_train_config(args)
        self.cfg = cfg
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        rp = int(getattr(args, "remat_pixel_decoder", -1))
        if rp < 0:
            # measured-best default (r5-resume f1: full step 382.7 vs
            # 453.9 ms): with the manual window VJP only op inputs are
            # saved, so skip the pixel-decoder remat at per-chip batch 1
            # (~600 MB of residuals); keep it at larger batches until the
            # B>=2 fit is confirmed
            rp_flag = (False if (self.cfg.pixel_decoder.window_custom_vjp
                                 and getattr(args,
                                             "per_device_train_batch_size",
                                             1) <= 1)
                       else None)
        else:
            rp_flag = rp == 1
        self.model = model or PSALM(self.cfg, dtype=dtype,
                                    remat=args.gradient_checkpointing,
                                    remat_pixel=rp_flag)
        self.variables = variables
        self.mesh = mesh
        self.criterion = PSALMCriterion(self.cfg.loss,
                                        self.cfg.mask_decoder.num_queries)
        self.tx = make_optimizer(args.learning_rate, args.num_train_steps,
                                 args.warmup_ratio, args.weight_decay)
        self.history = LossHistory()
        self._steps: Dict[str, Any] = {}

    # -- loss functions per task kind ---------------------------------------

    def _seg_loss_fn(self, task_kwargs):
        def loss_fn(variables, batch, rng):
            out = self.model.apply(variables, batch, train=True, **task_kwargs)
            targets = {"masks": batch["gt_masks"], "labels": batch["gt_labels"],
                       "valid": batch["gt_valid"]}
            losses = self.criterion(
                rng, out, targets,
                compute_seg=task_kwargs.get("use_seg_embedding", False),
                compute_class=task_kwargs.get("use_class_names", False),
                compute_region=task_kwargs.get("use_regions", False))
            # reference uses mask losses only for seg batches
            # (llava_phi.py:1133-1136)
            return losses["loss_total"], losses
        return loss_fn

    def _mm_conv_loss_fn(self):
        def loss_fn(variables, batch, rng):
            out = self.model.apply(variables, batch, use_class_names=False)
            loss = llm_ce_loss(out["logits"], batch["labels"])
            return loss, {"loss_llm": loss}
        return loss_fn

    def _step_for(self, dataset_type: str, num_class_names: int):
        key = (dataset_type, num_class_names)
        if key in self._steps:
            return self._steps[key]
        if dataset_type == "mm_conv":
            loss_fn = self._mm_conv_loss_fn()
        elif dataset_type == "referring_coco":
            loss_fn = self._seg_loss_fn(dict(use_seg_embedding=True,
                                             use_class_names=False))
        elif dataset_type == "region_coco":
            loss_fn = self._seg_loss_fn(dict(use_regions=True,
                                             use_class_names=False))
        else:  # panoptic / instance
            loss_fn = self._seg_loss_fn(dict(use_class_names=True,
                                             num_class_names=num_class_names))
        step = make_train_step(loss_fn, self.tx)
        self._steps[key] = step
        return step

    # -- checkpointing -------------------------------------------------------

    def save(self, state: TrainState, step: int):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.args.output_dir,
                                            f"checkpoint-{step}"))
        ckptr = ocp.StandardCheckpointer()
        if getattr(self.args, "tune_mm_mlp_adapter", False):
            # adapter-only checkpoint (llava_trainer.py:231-256): save just
            # the projector subtree
            adapter = {"mm_projector": state.params["params"]["mm_projector"]}
            ckptr.save(path, {"params": adapter, "step": np.asarray(step)},
                       force=True)
        else:
            ckptr.save(path, {"params": state.params,
                              "opt_state": state.opt_state,
                              "step": np.asarray(step)}, force=True)
        ckptr.wait_until_finished()
        # keep-N pruning (save_total_limit, train.sh:29)
        ckpts = sorted([d for d in os.listdir(self.args.output_dir)
                        if d.startswith("checkpoint-")],
                       key=lambda d: int(d.split("-")[1]))
        for d in ckpts[:-self.args.save_total_limit]:
            import shutil
            shutil.rmtree(os.path.join(self.args.output_dir, d))

    def latest_checkpoint(self) -> Optional[str]:
        if not os.path.isdir(self.args.output_dir):
            return None
        ckpts = sorted([d for d in os.listdir(self.args.output_dir)
                        if d.startswith("checkpoint-")],
                       key=lambda d: int(d.split("-")[1]))
        return os.path.join(self.args.output_dir, ckpts[-1]) if ckpts else None

    def try_resume(self, state: TrainState) -> TrainState:
        """Auto-resume (train.py:459-462)."""
        path = self.latest_checkpoint()
        if path is None:
            return state
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        # restore against the live state's structure so optax NamedTuples
        # survive the roundtrip
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": np.asarray(0)}
        restored = ckptr.restore(os.path.abspath(path), target)
        print(f"resumed from {path} at step {restored['step']}")
        return TrainState(jnp.asarray(restored["step"]), restored["params"],
                          restored["opt_state"])

    # -- main loop -----------------------------------------------------------

    def train(self, sampler: UnifiedTaskSampler, init_batch: Dict[str, Any]):
        args = self.args
        if self.variables is None:
            raise ValueError("initialize variables before train()")
        state = init_state(self.variables, self.tx, self.mesh)
        state = self.try_resume(state)
        rng = jax.random.PRNGKey(args.seed)
        os.makedirs(args.output_dir, exist_ok=True)
        log_path = os.path.join(args.output_dir, "train_log.jsonl")

        tb_writer = None
        if getattr(args, "report_to", "none") == "tensorboard":
            # rank-0-style TensorBoard scalars (summary.py:26-62 analog)
            import tensorflow as tf
            tb_writer = tf.summary.create_file_writer(
                os.path.join(args.output_dir, "tb"))

        profile_range = None
        if args.profile_steps:
            a, b = map(int, str(args.profile_steps).split(","))
            profile_range = (a, b)

        t0 = time.time()
        start_step = int(state.step)
        # async input pipeline (data/prefetch.py): mapper + collate work
        # overlaps the device step, like the reference's torch DataLoader
        # num_workers=4 (train.sh). Batch order is bit-identical to the
        # synchronous draw. 0 workers = synchronous (debug).
        n_workers = getattr(args, "dataloader_num_workers", 4)
        loader = None
        if n_workers > 0:
            from psalm_tpu.data.prefetch import PrefetchLoader
            loader = PrefetchLoader(
                sampler, collate, num_workers=n_workers,
                num_batches=args.num_train_steps - start_step)
        try:
            return self._train_loop(loader, sampler, state, rng, log_path,
                                    tb_writer, profile_range, t0, start_step)
        finally:
            if loader is not None:
                loader.close()

    def _train_loop(self, loader, sampler, state, rng, log_path, tb_writer,
                    profile_range, t0, start_step):
        args = self.args
        for step in range(start_step, args.num_train_steps):
            if loader is not None:
                batch_np = next(loader)
            else:
                batch_np = collate(sampler.next_batch())
            dataset_type = batch_np.pop("dataset_type")
            num_k = int(batch_np.pop("num_class_names", [0])[0]) \
                if "num_class_names" in batch_np else 0
            batch_np.pop("image_id", None)
            batch_np.pop("file_name", None)
            batch_np.pop("resized_hw", None)
            batch_np.pop("original_hw", None)
            if self.mesh is not None:
                # per-host local batch -> globally sharded arrays (each host
                # feeds its own disjoint sampler shard; see host_shard_info)
                from psalm_tpu.parallel.mesh import make_global_batch
                batch = make_global_batch(self.mesh, batch_np)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

            if profile_range and step == profile_range[0]:
                jax.profiler.start_trace(args.output_dir)
            rng, step_rng = jax.random.split(rng)
            step_fn = self._step_for(dataset_type, num_k)
            state, metrics = step_fn(state, batch, step_rng)
            if profile_range and step == profile_range[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()

            if step % args.logging_steps == 0:
                logged = self.history.update(
                    {k: float(v) for k, v in metrics.items()})
                logged.update(step=step, dataset_type=dataset_type,
                              steps_per_sec=(step - start_step + 1)
                              / (time.time() - t0))
                print(json.dumps(logged))
                with open(log_path, "a") as f:
                    f.write(json.dumps(logged) + "\n")
                if tb_writer is not None:
                    import tensorflow as tf
                    with tb_writer.as_default():
                        for k, v in logged.items():
                            if isinstance(v, (int, float)):
                                tf.summary.scalar(k, v, step=step)

            if step > 0 and step % args.save_steps == 0:
                self.save(state, step)

        self.save(state, args.num_train_steps)
        return state


def main(argv=None):
    args = parse_args(argv)
    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)
    tokenizer.add_tokens("[SEG]")

    cfg = PSALMConfig(seg_task=SegTask(args.seg_task))
    dcfg = DataConfig(image_size=cfg.image_size,
                      num_image_tokens=(cfg.image_size // 64) ** 2,
                      num_seg_queries=cfg.mask_decoder.num_queries,
                      pad_len=args.model_max_length)

    datasets, ratios = [], []
    ratio_vals = [int(r) for r in args.data_ratio.split("||")]
    if args.panoptic_json_path:
        datasets.append(PanopticDataset(args.panoptic_json_path, tokenizer,
                                        dcfg, shuffle_classes=True))
        ratios.append(ratio_vals[0] if ratio_vals else 1)
    if args.instance_json_path:
        datasets.append(InstanceDataset(args.instance_json_path,
                                        args.image_folder, tokenizer, dcfg))
        ratios.append(ratio_vals[0] if ratio_vals else 1)
    if args.semantic_json_path:
        datasets.append(SemanticDataset(args.semantic_json_path,
                                        args.image_folder,
                                        args.semantic_label_folder,
                                        tokenizer, dcfg))
        ratios.append(ratio_vals[0] if ratio_vals else 1)
    if args.region_json_path:
        datasets.append(InteractiveDataset(args.region_json_path,
                                           args.image_folder, tokenizer, dcfg))
        ratios.append(ratio_vals[min(1, len(ratio_vals) - 1)])
    if args.ref_coco_path:
        datasets.append(ReferringDataset(args.ref_coco_path, args.image_folder,
                                         tokenizer, dcfg))
        ratios.append(ratio_vals[min(2, len(ratio_vals) - 1)])
    if args.mmconv_path:
        datasets.append(MMConvDataset(args.mmconv_path, args.image_folder,
                                      tokenizer, dcfg))
        ratios.append(ratio_vals[min(3, len(ratio_vals) - 1)])
    shard_index, num_shards = 0, 1
    if jax.process_count() > 1:  # multi-host: disjoint per-host streams
        from psalm_tpu.parallel.mesh import host_shard_info
        shard_index, num_shards = host_shard_info()
    sampler = UnifiedTaskSampler(datasets, args.per_device_train_batch_size,
                                 ratios, seed=args.seed,
                                 shard_index=shard_index,
                                 num_shards=num_shards)

    trainer = Trainer(args, cfg)
    # initialization: converted torch checkpoint or fresh init
    from psalm_tpu.models.builder import load_pretrained_model
    _, _, variables, _ = load_pretrained_model(args.model_name_or_path,
                                               cfg=cfg)
    trainer.variables = variables
    trainer.train(sampler, None)


if __name__ == "__main__":
    main()
