"""E2E tests for the two CLIs round-1 lacked direct drives: OV-semantic
(with the sem_seg_predictions.json artifact) and DAVIS VOS (propagation
memory + indexed-PNG output)."""

import argparse
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from test_convert import synthetic_torch_sd
from test_data_pipeline import StubTokenizer

from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from psalm_tpu.config import SegTask, tiny_test_config
from psalm_tpu.data import coco_rle
from psalm_tpu.models.psalm import PSALM


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
    return cfg, variables


def test_semantic_eval_cli_with_artifact(tiny_model, tmp_path):
    from psalm_tpu.eval.semantic_segmentation import evaluation
    cfg, variables = tiny_model
    rng = np.random.default_rng(0)

    img_dir = tmp_path / "img"
    lab_dir = tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    lines = []
    for i in range(2):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"{i}.jpg")
        lab = np.zeros((48, 64), np.uint8)
        lab[:20] = 1
        lab[30:, :20] = 2
        lab[46:, 60:] = 255  # ignore region
        Image.fromarray(lab).save(lab_dir / f"{i}.png")
        lines.append(f"{i}.jpg {i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines))
    (tmp_path / "names.txt").write_text("road\nsky\ntree\n")

    out_dir = str(tmp_path / "out")
    args = argparse.Namespace(
        model_path="", list_path=str(tmp_path / "list.txt"),
        image_folder=str(img_dir), label_folder=str(lab_dir),
        class_names=str(tmp_path / "names.txt"), num_class=0,
        ignore_label=255, model_max_length=512, output_dir=out_dir, limit=0)
    res = evaluation(args, cfg=cfg.replace(seg_task=SegTask.SEMANTIC),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.SEMANTIC)),
                     variables=variables)
    assert np.isfinite(res["semantic"]["mIoU"])

    with open(os.path.join(out_dir, "sem_seg_predictions.json")) as f:
        recs = json.load(f)
    assert recs
    for r in recs:
        assert set(r) == {"file_name", "category_id", "segmentation"}
        m = coco_rle.decode(r["segmentation"])
        assert m.shape == (48, 64)
    # every image contributed at least one class record
    assert {r["file_name"] for r in recs} == {"0.jpg", "1.jpg"}


def test_davis_eval_cli_memory_and_pngs(tiny_model, tmp_path):
    from psalm_tpu.eval.eval_davis import evaluation
    cfg, variables = tiny_model
    rng = np.random.default_rng(1)

    root = tmp_path / "DAVIS"
    vdir = root / "JPEGImages" / "480p" / "bear"
    vdir.mkdir(parents=True)
    records = []
    for i in range(3):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(vdir / f"{i:05d}.jpg")

    m1 = np.zeros((48, 64), np.uint8)
    m1[5:20, 5:25] = 1
    m2 = np.zeros((48, 64), np.uint8)
    m2[25:45, 30:60] = 1
    anns = []
    for fill, m in [(1, m1), (2, m2)]:
        rle = coco_rle.encode(m)
        rle = {"size": rle["size"],
               "counts": rle["counts"].decode("ascii")
               if isinstance(rle["counts"], bytes) else rle["counts"]}
        anns.append({"category_id": fill, "segmentation": rle})
    for i in range(3):
        records.append({
            "image": f"JPEGImages/480p/bear/{i:05d}.jpg",
            "first_frame_image": "JPEGImages/480p/bear/00000.jpg",
            "first_frame_anns": anns,
        })
    jpath = tmp_path / "trainval_val_psalm.json"
    jpath.write_text(json.dumps(records))

    out_dir = tmp_path / "davis_out"
    args = argparse.Namespace(
        model_path="", json_path=str(jpath), image_folder=str(root),
        output_dir=str(out_dir), with_memory=True, model_max_length=512,
        limit=0)
    evaluation(args, cfg=cfg.replace(seg_task=SegTask.REGION),
               tokenizer=StubTokenizer(),
               model=PSALM(cfg.replace(seg_task=SegTask.REGION)),
               variables=variables)

    pngs = sorted(os.listdir(out_dir / "bear"))
    assert pngs == ["00000.png", "00001.png", "00002.png"]
    fused = np.asarray(Image.open(out_dir / "bear" / "00000.png"))
    assert fused.shape == (48, 64)
    assert set(np.unique(fused)) <= {0, 1, 2}

    # sparse-fill preservation: PIL must NOT remap index 2 -> 1 when fill 1
    # is absent (the palette-less P-mode save did exactly that)
    from psalm_tpu.eval.eval_davis import save_indexed_png
    sparse = np.zeros((8, 8), np.uint8)
    sparse[2:5, 2:5] = 2
    save_indexed_png(str(out_dir / "sparse.png"), sparse)
    back = np.asarray(Image.open(out_dir / "sparse.png"))
    assert set(np.unique(back)) == {0, 2}
