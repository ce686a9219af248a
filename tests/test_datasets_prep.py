"""Offline dataset-prep converters (SURVEY §2.7): each of the seven scripts
runs on tiny synthetic raw inputs, emits the reference's JSON schema, and
the key outputs round-trip into the framework's Dataset classes."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from psalm_tpu.data import coco_rle


def _coco_instances(tmp, n_imgs=2):
    images, annotations = [], []
    aid = 1
    for i in range(n_imgs):
        images.append({"id": 100 + i, "file_name": f"{i:012d}.jpg",
                       "height": 48, "width": 64})
        m = np.zeros((48, 64), np.uint8)
        m[8 + i:30, 10:40] = 1
        rle = coco_rle.encode(m)
        rle["counts"] = rle["counts"].decode("ascii") \
            if isinstance(rle["counts"], bytes) else rle["counts"]
        annotations.append({"id": aid, "image_id": 100 + i, "category_id": 1,
                            "bbox": [10, 8 + i, 30, 22 - i], "iscrowd": 0,
                            "area": int(m.sum()), "segmentation": rle})
        aid += 1
    path = os.path.join(tmp, "instances_val2017.json")
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return path


def test_build_coco_instance_roundtrip(tmp_path):
    from datasets_prep.build_coco_instance import build
    inst_json = _coco_instances(str(tmp_path))
    out = str(tmp_path / "instance_val_psalm.json")
    build(inst_json, out)
    recs = json.load(open(out))
    assert len(recs) == 2
    assert set(recs[0]) == {"image", "image_info", "new_img_id", "anns"}
    assert [r["new_img_id"] for r in recs] == [0, 1]

    # round-trip into InstanceDataset
    from test_data_pipeline import StubTokenizer
    from psalm_tpu.data.datasets import DataConfig, InstanceDataset
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(img_dir / f"{i:012d}.jpg")
    dcfg = DataConfig(image_size=64, num_image_tokens=4, num_seg_queries=10,
                      pad_len=512, max_gt_masks=8, max_regions=4,
                      num_region_points=16)
    ds = InstanceDataset(out, str(img_dir), StubTokenizer(), dcfg,
                         is_train=False)
    s = ds[0]
    assert s["gt_valid"].sum() == 1
    assert s["images"].shape == (64, 64, 3)


def test_build_coco_interactive_prompts(tmp_path):
    from datasets_prep.build_coco_interactive import build
    inst_json = _coco_instances(str(tmp_path))
    from datasets_prep.build_coco_instance import build as build_inst
    grouped = str(tmp_path / "grouped.json")
    build_inst(inst_json, grouped)
    out = str(tmp_path / "coco_interactive_val_psalm.json")
    build(grouped, out, seed=0)
    recs = json.load(open(out))
    assert recs
    for ann in recs[0]["anns"]:
        # the four visual-prompt kinds (reference
        # bulid_COCO_Interactivate.py:27-143)
        for k in ("point_visual_prompt_mask", "mask_visual_prompt_mask",
                  "box_visual_prompt_mask", "scribble_visual_prompt_mask"):
            assert k in ann, k
            m = coco_rle.decode(ann[k])
            assert m.shape == (48, 64)
            assert m.sum() > 0, k

    # round-trip: InteractiveDataset consumes it
    from test_data_pipeline import StubTokenizer
    from psalm_tpu.data.datasets import DataConfig, InteractiveDataset
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(img_dir / f"{i:012d}.jpg")
    dcfg = DataConfig(image_size=64, num_image_tokens=4, num_seg_queries=10,
                      pad_len=512, max_gt_masks=8, max_regions=4,
                      num_region_points=16)
    ds = InteractiveDataset(out, str(img_dir), StubTokenizer(), dcfg,
                            region_mask_type="scribble_visual_prompt_mask")
    s = ds[0]
    assert s["region_valid"].sum() == 1


def test_build_refcoco(tmp_path):
    from datasets_prep.build_refcoco import build
    inst_json = _coco_instances(str(tmp_path))
    refs = [{"ref_id": 7, "ann_id": 1, "split": "val",
             "sentences": [{"sent": "the person on the left"}]},
            {"ref_id": 8, "ann_id": 2, "split": "train",
             "sentences": [{"sent": "skip me"}]}]
    rp = str(tmp_path / "refs(unc).p")
    with open(rp, "wb") as f:
        pickle.dump(refs, f)
    out = str(tmp_path / "refcoco_val.json")
    build(rp, inst_json, out, split="val")
    recs = json.load(open(out))
    assert len(recs) == 1
    assert recs[0]["instruction"] == [{"sent": "the person on the left"}]
    assert recs[0]["anns"][0]["id"] == 1


def test_build_grefcoco_no_target(tmp_path):
    from datasets_prep.build_grefcoco import build
    inst_json = _coco_instances(str(tmp_path))
    grefs = [{"image_id": 100, "ann_id": [1], "split": "val",
              "sentences": [{"sent": "a person"}]},
             {"image_id": 101, "ann_id": [-1], "split": "val",
              "sentences": [{"sent": "nothing here"}]}]
    gp = str(tmp_path / "grefs.json")
    json.dump(grefs, open(gp, "w"))
    out = str(tmp_path / "grefcoco_val.json")
    build(gp, inst_json, out, split="val")
    recs = json.load(open(out))
    assert len(recs) == 2
    assert recs[0]["no_target"] is False and recs[1]["no_target"] is True
    assert recs[1]["anns"] == []


def test_build_davis(tmp_path):
    from datasets_prep.build_davis import build
    root = tmp_path / "DAVIS"
    for sub in ("Annotations", "JPEGImages"):
        (root / "2017/trainval" / sub / "480p/bear").mkdir(parents=True)
    (root / "2017/trainval/ImageSets/2017").mkdir(parents=True)
    (root / "2017/trainval/ImageSets/2017/val.txt").write_text("bear\n")
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(root / "2017/trainval/JPEGImages/480p/bear"
                               / f"{i:05d}.jpg")
        ann = np.zeros((48, 64), np.uint8)
        ann[10:30, 10 + i:30 + i] = 1
        ann[35:45, 40:60] = 2
        from psalm_tpu.eval.eval_davis import save_indexed_png
        save_indexed_png(str(root / "2017/trainval/Annotations/480p/bear"
                             / f"{i:05d}.png"), ann)
    out = build(str(root), "trainval", "val")
    recs = json.load(open(out))
    assert len(recs) == 2  # frames beyond the first
    r = recs[0]
    assert set(r) >= {"image", "anns", "first_frame_anns",
                      "first_frame_image"}
    fills = sorted(a["category_id"] for a in r["first_frame_anns"])
    assert fills == [1, 2]
    m = coco_rle.decode(r["first_frame_anns"][0]["segmentation"])
    assert m.shape == (48, 64)


def test_build_lvis_and_llava_filter(tmp_path):
    from datasets_prep.build_lvis import build as build_lvis
    from datasets_prep.prepare_llava_1_5 import build as build_llava
    lvis = {"images": [{"id": 1, "coco_url": "x/000000000009.jpg",
                        "height": 48, "width": 64}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 3,
                             "bbox": [1, 2, 10, 10], "area": 100,
                             "segmentation": [[1, 2, 11, 2, 11, 12, 1, 12]]}],
            "categories": [{"id": 3, "name": "apple"}]}
    lp = str(tmp_path / "lvis_v1_val.json")
    json.dump(lvis, open(lp, "w"))
    out = str(tmp_path / "lvis_psalm.json")
    cats = str(tmp_path / "lvis_categories.json")
    build_lvis(lp, out, cats)
    assert json.load(open(out))
    assert json.load(open(cats))

    mix = [{"id": "a", "image": "x.jpg",
            "conversations": [{"from": "human", "value": "<image>\nhi"}]},
           {"id": "b",
            "conversations": [{"from": "human", "value": "text only"}]}]
    mp = str(tmp_path / "mix.json")
    json.dump(mix, open(mp, "w"))
    outp = str(tmp_path / "filtered.json")
    build_llava(mp, outp)
    kept = json.load(open(outp))
    assert [r["id"] for r in kept] == ["a"]  # text-only sample dropped


def test_interactive_prompt_distributions():
    """Distribution-level agreement with the reference's synthesis constants
    (bulid_COCO_Interactivate.py:27-143, VERDICT r2 #7): sigma-2 blur with a
    mean threshold, centroid-radius point sampling, one 0.9-1.1 box scale,
    0.5-1.2 scribble box with IoU>=0.5 retry + sine amplitude 10-20."""
    from scipy.ndimage import gaussian_filter
    from datasets_prep.build_coco_interactive import (box_prompt, mask_prompt,
                                                      point_prompt,
                                                      scribble_prompt)
    H, W = 96, 128
    mask = np.zeros((H, W), np.uint8)
    mask[20:60, 30:90] = 1          # one big component
    r0, c0, r1, c1 = 20, 30, 60, 90
    cy, cx = (r0 + r1 - 1) / 2, (c0 + c1 - 1) / 2

    # mask: EXACT recomputation of the reference formula
    m = mask_prompt(mask)
    blurred = gaussian_filter(mask.astype(float), sigma=2)
    np.testing.assert_array_equal(m, (blurred > blurred.mean()).astype(np.uint8))
    assert m.sum() > 0 and m.sum() != mask.sum()  # mean-threshold erodes

    radius = min(r1 - r0, c1 - c0) * 0.5
    for seed in range(40):
        rng = np.random.default_rng(seed)
        p = point_prompt(mask, rng)
        assert p.sum() == 1
        py, px = np.argwhere(p)[0]
        assert mask[py, px] == 1
        # polar offset is bounded by the centroid radius (+1 for the int
        # truncation), per the reference's sampling law
        assert abs(py - cy) <= radius + 1 and abs(px - cx) <= radius + 1

        rng = np.random.default_rng(seed)
        b = box_prompt(mask, rng)
        ys, xs = np.nonzero(b)
        bh, bw = ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
        # one scale draw in [0.9, 1.1] about the center (int truncation)
        assert (r1 - r0) * 0.9 - 2 <= bh <= (r1 - r0) * 1.1 + 2
        assert (c1 - c0) * 0.9 - 2 <= bw <= (c1 - c0) * 1.1 + 2
        # filled rectangle
        assert b.sum() == bh * bw

        rng = np.random.default_rng(seed)
        s = scribble_prompt(mask, rng)
        assert s.sum() >= 2
        ys, xs = np.nonzero(s)
        # cols stay inside the scribble box (<= 1.2x the bbox about the
        # centroid); rows may wander by the sine amplitude <= 20
        assert xs.min() >= cx - (c1 - c0) * 0.6 - 2
        assert xs.max() <= cx + (c1 - c0) * 0.6 + 2
        assert ys.min() >= r0 - 0.1 * (r1 - r0) - 20 - 2
        assert ys.max() <= r1 + 0.1 * (r1 - r0) + 20 + 2
