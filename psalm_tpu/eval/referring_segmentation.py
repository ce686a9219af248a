"""RefCOCO/+/g referring-segmentation evaluation CLI (reference:
psalm/eval/referring_segmentation.py — cIoU + gIoU, top-1 mask)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from psalm_tpu.config import PSALMConfig, SegTask
from psalm_tpu.data.datasets import DataConfig, ReferringDataset, collate
from psalm_tpu.eval.metrics import IoUMeter
from psalm_tpu.eval.runner import EvalRunner
from psalm_tpu.models.builder import load_pretrained_model


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--json_path", required=True)
    p.add_argument("--image_folder", required=True)
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--seq_bucket", type=int, default=128,
                   help="pad token sequences to the batch max rounded up "
                        "to this multiple instead of model_max_length "
                        "(0 = fixed pad; outputs identical either way)")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--limit", type=int, default=0)
    return p.parse_args()


def evaluation(args, cfg=None, tokenizer=None, model=None, variables=None):
    if model is None:
        tokenizer, model, variables, _ = load_pretrained_model(
            args.model_path, seg_task=SegTask.REFERRING, cfg=cfg)
        cfg = model.cfg  # checkpoint-supplied config when cfg was None
    cfg = cfg or PSALMConfig(seg_task=SegTask.REFERRING)

    dcfg = DataConfig(image_size=cfg.image_size,
                      num_image_tokens=(cfg.image_size // 64) ** 2,
                      num_seg_queries=cfg.mask_decoder.num_queries,
                      pad_len=args.model_max_length)
    ds = ReferringDataset(args.json_path, args.image_folder, tokenizer, dcfg,
                          is_train=False)
    from psalm_tpu.eval.runner import bucket_for_sizes
    bucket = (bucket_for_sizes(ds.image_sizes)
              if getattr(ds, 'image_sizes', None) else None)
    runner = EvalRunner(model, variables, cfg, bucket_hw=bucket)
    meter = IoUMeter()
    pred_writer = None
    if args.output_dir:
        from psalm_tpu.eval.artifacts import RegionPredictionWriter
        pred_writer = RegionPredictionWriter(args.output_dir, "referring")

    n = min(len(ds), args.limit) if args.limit else len(ds)
    t0 = time.time()
    for i in range(0, n, args.eval_batch_size):
        samples = [ds[j] for j in range(i, min(i + args.eval_batch_size, n))]
        batch = collate(samples, seq_bucket=getattr(args, "seq_bucket", 128))
        out = runner.infer(batch)
        ref = out["referring"]
        for b, s in enumerate(samples):
            # top-1 by SEG score x mask quality (SEG_instance_inference)
            top = int(np.argmax(ref["scores"][b]))
            pred = ref["masks"][b][top].astype(bool)  # original resolution
            # gt decoded at the original (H, W), the reference's convention
            gt = ds.original_gt_mask(i + b)
            meter.update(pred, gt)
            if pred_writer is not None:
                pred_writer.add(s["file_name"], [pred], [gt])
        if i % 100 == 0:
            print(f"[{i}/{n}] cIoU={meter.ciou:.2f} gIoU={meter.giou:.2f}")

    results = {"referring": {"cIoU": meter.ciou, "gIoU": meter.giou},
               "images_per_sec": n / (time.time() - t0)}
    if args.output_dir:
        # reference artifact: metric summary txt
        # (referring_segmentation.py:295-300); predictions additionally
        # persisted as RLE pkl for offline re-scoring (round-1 weak #7)
        import os
        from psalm_tpu.eval.artifacts import (RegionPredictionWriter,
                                              write_metric_txt)
        suffix = os.path.splitext(os.path.basename(args.json_path))[0]
        msg = ("benchmark: {}: giou: {:.4f}, ciou: {:.4f}"
               .format(suffix, meter.giou / 100, meter.ciou / 100))
        write_metric_txt(args.output_dir, suffix, msg)
        pred_writer.suffix = suffix
        path = pred_writer.finalize()
        print(f"wrote {path}")
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    evaluation(parse_args())
