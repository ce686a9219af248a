"""Metric implementations: hand-computed PQ cases, AP sanity (perfect
predictions -> AP 100), IoU meters, and the full panoptic eval CLI on the
synthetic COCO tree with a tiny model."""

import numpy as np

from psalm_tpu.eval.metrics import (InstanceAPEvaluator, IoUMeter, PQStat,
                                    SemSegMeter, mask_iou_matrix)


def test_pq_perfect_match():
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    gt[5:] = 2
    segs = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}]
    stat = PQStat()
    stat.update(gt, segs, gt, segs)
    out = stat.summarize()
    assert abs(out["All"]["pq"] - 100.0) < 1e-6


def test_pq_half_overlap_no_match():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :10] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:5, :] = 1  # IoU = 0.5, NOT > 0.5 -> no match
    stat = PQStat()
    stat.update(pred, [{"id": 1, "category_id": 0}],
                gt, [{"id": 1, "category_id": 0}])
    s = stat.per_cat[0]
    assert s.tp == 0 and s.fp == 1 and s.fn == 1


def test_pq_category_mismatch():
    seg = np.ones((4, 4), np.int32)
    stat = PQStat()
    stat.update(seg, [{"id": 1, "category_id": 2}],
                seg, [{"id": 1, "category_id": 0}])
    assert stat.per_cat[0].fn == 1
    assert stat.per_cat[2].fp == 1


def test_ap_perfect():
    rng = np.random.default_rng(0)
    ev = InstanceAPEvaluator([0, 1])
    for _ in range(3):
        masks = rng.uniform(size=(2, 16, 16)) > 0.5
        ev.add_image(masks, [0.9, 0.8], [0, 1], masks, [0, 1])
    out = ev.summarize()
    assert abs(out["AP"] - 100.0) < 1e-5
    assert abs(out["AP50"] - 100.0) < 1e-5


def test_ap_false_positive_hurts():
    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(1, 16, 16)) > 0.5
    fp = ~gt
    ev = InstanceAPEvaluator([0])
    # higher-scored FP before the TP depresses AP below 100
    ev.add_image(np.concatenate([fp, gt]), [0.9, 0.8], [0, 0], gt, [0])
    out = ev.summarize()
    assert 0 < out["AP"] < 100.0


def test_mask_iou_crowd_uses_ioa():
    a = np.zeros((1, 4, 4), bool)
    a[0, :2] = True  # area 8
    b = np.zeros((1, 4, 4), bool)
    b[0] = True  # area 16, crowd
    iou = mask_iou_matrix(a, b, iscrowd=np.array([1]))
    assert abs(iou[0, 0] - 1.0) < 1e-6  # intersection/pred_area


def test_iou_meter():
    m = IoUMeter()
    p = np.zeros((4, 4), bool)
    p[:2] = True
    g = np.zeros((4, 4), bool)
    g[:, :2] = True
    m.update(p, g)  # IoU = 4/12
    m.update(g, g)  # IoU = 1
    assert abs(m.giou - 100 * (4 / 12 + 1) / 2) < 1e-6
    assert abs(m.ciou - 100 * (4 + 8) / (12 + 8)) < 1e-6


def test_sem_meter():
    m = SemSegMeter(3)
    pred = np.array([[0, 1], [2, 2]])
    gt = np.array([[0, 1], [2, 255]])
    m.update(pred, gt)
    out = m.summarize()
    assert abs(out["mIoU"] - 100.0) < 1e-6


def test_panoptic_eval_cli_end_to_end(tmp_path):
    """Full CLI path: synthetic COCO + tiny converted model -> PQ numbers."""
    import argparse
    import jax, jax.numpy as jnp
    from test_data_pipeline import _write_synthetic_coco, StubTokenizer
    from test_convert import synthetic_torch_sd
    from psalm_tpu.config import tiny_test_config, SegTask
    from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
    from psalm_tpu.models.psalm import PSALM
    from psalm_tpu.eval.panoptic_segmentation import evaluation

    root, _ = _write_synthetic_coco(str(tmp_path))
    cfg = tiny_test_config().replace(seg_task=SegTask.PANOPTIC)
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
    model = PSALM(cfg)

    args = argparse.Namespace(model_path="", json_path=root, image_folder=None,
                              eval_batch_size=1, model_max_length=512,
                              output_dir=None, limit=2)
    results = evaluation(args, cfg=cfg, tokenizer=StubTokenizer(), model=model,
                         variables=variables)
    assert "panoptic" in results and "semantic" in results
    assert np.isfinite(results["panoptic"]["All"]["pq"])
    assert results["images_per_sec"] > 0
