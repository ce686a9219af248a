"""Offline converter: synthesize COCO-Interactive visual prompts.

Reference spec: datasets/bulid_COCO_Interactivate.py — for each instance,
generate four RLE visual prompts (generate_visual_prompt :27-143):
  point    — one random interior pixel of the gt mask;
  mask     — gaussian-blurred-then-rethresholded gt mask;
  box      — the gt box jittered until IoU >= 0.5 with the original (:97);
  scribble — a random polyline through interior points (bezier-ish).
"""

import argparse
import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from psalm_tpu.data import coco_rle


def _rle(mask):
    r = coco_rle.encode(mask.astype(np.uint8))
    return {"size": r["size"], "counts": r["counts"].decode("ascii")}


def point_prompt(mask, rng):
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    i = rng.integers(len(ys))
    out = np.zeros_like(mask)
    out[ys[i], xs[i]] = 1
    return out


def mask_prompt(mask, rng, sigma=5):
    import cv2
    k = 2 * sigma + 1
    blurred = cv2.GaussianBlur(mask.astype(np.float32), (k, k), sigma)
    return (blurred > 0.5).astype(np.uint8)


def box_iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union > 0 else 0.0


def box_prompt(mask, rng, min_iou=0.5, max_tries=50):
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    x1, x2 = xs.min(), xs.max() + 1
    y1, y2 = ys.min(), ys.max() + 1
    H, W = mask.shape
    w, h = x2 - x1, y2 - y1
    for _ in range(max_tries):
        jit = rng.normal(0, 0.1, 4) * [w, h, w, h]
        nb = [x1 + jit[0], y1 + jit[1], x2 + jit[2], y2 + jit[3]]
        nb = [max(0, nb[0]), max(0, nb[1]), min(W, nb[2]), min(H, nb[3])]
        if nb[2] > nb[0] and nb[3] > nb[1] and \
                box_iou([x1, y1, x2, y2], nb) >= min_iou:
            out = np.zeros_like(mask)
            out[int(nb[1]):int(nb[3]), int(nb[0]):int(nb[2])] = 1
            return out
    out = np.zeros_like(mask)
    out[y1:y2, x1:x2] = 1
    return out


def scribble_prompt(mask, rng, n_points=5):
    import cv2
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    idx = rng.choice(len(ys), size=min(n_points, len(ys)), replace=False)
    pts = np.stack([xs[idx], ys[idx]], -1)
    pts = pts[np.argsort(pts[:, 0])]
    out = np.zeros_like(mask, np.uint8)
    cv2.polylines(out, [pts.astype(np.int32)], isClosed=False, color=1,
                  thickness=1)
    return (out & mask.astype(np.uint8))


def build(instance_json: str, out_path: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    with open(instance_json) as f:
        records = json.load(f)
    kept = []
    for rec in records:
        H = rec["image_info"]["height"]
        W = rec["image_info"]["width"]
        new_anns = []
        for ann in rec["anns"]:
            seg = ann["segmentation"]
            if isinstance(seg, dict):
                mask = coco_rle.decode(seg)
            else:
                mask = coco_rle.merge_polygons_to_mask(seg, H, W)
            if mask.sum() == 0:
                continue
            prompts = {
                "point_visual_prompt_mask": point_prompt(mask, rng),
                "mask_visual_prompt_mask": mask_prompt(mask, rng),
                "box_visual_prompt_mask": box_prompt(mask, rng),
                "scribble_visual_prompt_mask": scribble_prompt(mask, rng),
            }
            if any(v is None or v.sum() == 0 for v in prompts.values()):
                continue
            new_anns.append({**ann,
                             **{k: _rle(v) for k, v in prompts.items()}})
        if new_anns:
            kept.append({**rec, "anns": new_anns})
    with open(out_path, "w") as f:
        json.dump(kept, f)
    print(f"wrote {len(kept)} records to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--instance_json", required=True,
                   help="output of build_coco_instance.py")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    build(a.instance_json, a.out, a.seed)
