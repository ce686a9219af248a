"""Eval runner: jitted per-image inference + host-side geometric restore.

Pipeline per image (the reference's eval_seg spine, llava_phi.py:1317-1472,
reorganized TPU-first):
  1. TPU (one jitted program, static shapes): full model forward ->
     mask logits upsampled x4 to the padded 1024 frame -> task head with a
     validity mask over the un-padded region.
  2. Host: crop the resized region [0:nh, 0:nw] and resize to the original
     (H, W) — cv2, C++ speed.

Note on parity: the reference crops/resizes *before* its inference heads
(fp32, per-image dynamic shapes); we run heads at padded resolution with a
validity mask and restore geometry afterwards. Areas scale uniformly under
the resize so the 0.8 overlap ratios are preserved; boundary-level drift is
validated against checkpoint goldens (BASELINE.md parity bar).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.config import PSALMConfig, SegTask
from psalm_tpu.eval import postprocess
from psalm_tpu.ops.sampling import resize_bilinear


class EvalRunner:
    def __init__(self, model, variables, cfg: PSALMConfig, num_class_names=None,
                 is_thing=None, window_clamp_threshold: float = 1e-3):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.task = cfg.seg_task
        self.num_class_names = num_class_names or cfg.num_classes + 1
        self.is_thing = (np.asarray(is_thing, bool) if is_thing is not None
                         else np.ones(self.num_class_names - 1, bool))
        self._infer = jax.jit(functools.partial(self._infer_impl))
        # window-mode exactness guard (VERDICT r1 #4): validated on the first
        # real batch; falls back to the unclamped patch-gather parity path
        # when the checkpoint's offsets exceed the radius. None = disabled.
        self.window_clamp_threshold = window_clamp_threshold
        self.window_stats = None
        self._window_checked = (
            cfg.pixel_decoder.attention_mode != "window"
            or window_clamp_threshold is None)

    def _infer_impl(self, variables, batch, is_thing):
        task = self.task
        out = self.model.apply(
            variables, batch,
            use_class_names=task in (SegTask.PANOPTIC, SegTask.INSTANCE,
                                     SegTask.SEMANTIC),
            use_seg_embedding=task is SegTask.REFERRING,
            use_regions=task is SegTask.REGION,
            max_regions=batch.get("region_points").shape[1]
            if "region_points" in batch else 0,
            num_class_names=self.num_class_names,
            compute_logits=False,
        )
        masks = out["pred_masks"].astype(jnp.float32)  # [B, Q, S/4, S/4]
        B, Q = masks.shape[:2]
        S = self.cfg.image_size
        masks_up = resize_bilinear(
            masks.reshape(B * Q, *masks.shape[2:])[..., None], (S, S)
        ).reshape(B, Q, S, S)
        valid = ~batch["padding_mask"]  # [B, S, S]

        results: Dict[str, Any] = {}
        if task is SegTask.PANOPTIC:
            pan, info = jax.vmap(
                lambda cl, m, v: postprocess.panoptic_inference(
                    cl, m, jnp.asarray(is_thing), v))(
                out["pred_class_name_logits"], masks_up, valid)
            results["panoptic_seg"] = pan
            results["segments"] = info
            # the PQ/mIoU evaluators consume only the argmax semantic map;
            # shipping the full [K, S, S] probability volume to host would
            # dominate transfer time (the reference's my_SemSegEvaluator also
            # argmaxes first)
            sem = jax.vmap(postprocess.semantic_inference)(
                out["pred_class_name_logits"], masks_up)
            results["sem_seg"] = jnp.argmax(sem, axis=1).astype(jnp.int32)
        elif task is SegTask.INSTANCE:
            inst = jax.vmap(lambda cl, m: postprocess.instance_inference(
                cl, m, topk=Q))(
                out["pred_class_name_logits"],
                masks_up * valid[:, None].astype(masks_up.dtype))
            results["instances"] = inst
        elif task is SegTask.SEMANTIC:
            results["sem_seg"] = jax.vmap(postprocess.semantic_inference)(
                out["pred_class_name_logits"], masks_up)
        elif task is SegTask.REFERRING:
            ref = jax.vmap(lambda sl, m: postprocess.seg_instance_inference(
                sl, m, topk=Q))(
                out["pred_SEG_logits"],
                masks_up * valid[:, None].astype(masks_up.dtype))
            results["referring"] = ref
        elif task is SegTask.REGION:
            reg = jax.vmap(postprocess.region_inference)(
                out["pred_region_logits"],
                masks_up * valid[:, None].astype(masks_up.dtype))
            results["region"] = reg
        return results

    def _check_window_mode(self, jbatch) -> None:
        """Measure clamp rate on the first batch; switch to the patch-gather
        parity mode if the checkpoint's offsets exceed the window radius."""
        import dataclasses
        import sys
        from psalm_tpu.eval.instrument import offset_clamp_report, summarize
        task = self.task
        report = offset_clamp_report(
            self.model, self.variables, jbatch,
            use_class_names=task in (SegTask.PANOPTIC, SegTask.INSTANCE,
                                     SegTask.SEMANTIC),
            use_seg_embedding=task is SegTask.REFERRING,
            use_regions=task is SegTask.REGION,
            max_regions=jbatch.get("region_points").shape[1]
            if "region_points" in jbatch else 0,
            num_class_names=self.num_class_names, compute_logits=False)
        self.window_stats = summarize(report)
        radius = self.cfg.pixel_decoder.window_radius
        frac = self.window_stats["max_clamp_frac"]
        max_off = self.window_stats["max_offset_px"]
        print(f"window-mode check: max |offset| = {max_off:.2f} px "
              f"(radius {radius}), clamp rate = {frac:.2e}", file=sys.stderr)
        if frac <= self.window_clamp_threshold:
            return
        # first remedy: RAISE the radius to fit the checkpoint's offsets
        # (window mode stays exact and fast); give up to the unclamped
        # patch-gather parity path only for extreme offset distributions
        import math
        new_radius = float(math.ceil(max_off) + 1)
        if new_radius <= 16.0:
            print(f"raising window radius {radius} -> {new_radius} to cover "
                  f"the measured offsets (clamp rate was {frac:.2e})",
                  file=sys.stderr)
            self.cfg = self.cfg.replace(pixel_decoder=dataclasses.replace(
                self.cfg.pixel_decoder, window_radius=new_radius))
        else:
            print(f"offsets reach {max_off:.1f} px; falling back to the "
                  "unclamped deformable parity path", file=sys.stderr)
            self.cfg = self.cfg.replace(pixel_decoder=dataclasses.replace(
                self.cfg.pixel_decoder, attention_mode="deformable"))
        # flax modules are dataclasses; swapping cfg preserves dtype/flags
        self.model = dataclasses.replace(self.model, cfg=self.cfg)
        self._infer = jax.jit(functools.partial(self._infer_impl))

    def infer(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # gt arrays stay on host (they are only for the metric accumulators;
        # shipping 100x1024^2 masks to device would dominate transfer time)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("dataset_type", "image_id", "num_class_names",
                               "resized_hw", "original_hw", "gt_masks",
                               "gt_labels", "gt_valid", "file_name")}
        if not self._window_checked:
            self._window_checked = True
            self._check_window_mode(jbatch)
        out = self._infer(self.variables, jbatch, jnp.asarray(self.is_thing))
        return jax.tree.map(np.asarray, out)

    # -- host-side geometric restore ----------------------------------------

    @staticmethod
    def restore_map(seg: np.ndarray, resized_hw, original_hw,
                    nearest: bool = True) -> np.ndarray:
        """Crop the content region and resize back to the original size."""
        import cv2
        nh, nw = resized_hw
        crop = seg[:nh, :nw]
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(np.asarray(crop), (original_hw[1], original_hw[0]),
                          interpolation=interp)

    @staticmethod
    def restore_masks(masks: np.ndarray, resized_hw, original_hw) -> np.ndarray:
        """[Q, S, S] -> [Q, H, W] via per-mask crop + nearest resize
        (threaded — cv2 releases the GIL, and 100 masks/image of host work
        would otherwise rival the TPU time)."""
        from concurrent.futures import ThreadPoolExecutor
        if len(masks) < 8:
            return np.stack([EvalRunner.restore_map(
                m.astype(np.uint8), resized_hw, original_hw) for m in masks])
        with ThreadPoolExecutor(max_workers=8) as ex:
            out = list(ex.map(lambda m: EvalRunner.restore_map(
                m.astype(np.uint8), resized_hw, original_hw), masks))
        return np.stack(out)


class Prefetcher:
    """Overlap dataset IO/preprocessing with device execution: a background
    thread keeps ``depth`` ready batches ahead of the consumer."""

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading
        self.q = queue.Queue(maxsize=depth)
        self._END = object()

        def worker():
            try:
                for item in iterator:
                    self.q.put(item)
            finally:
                self.q.put(self._END)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._END:
            raise StopIteration
        return item
