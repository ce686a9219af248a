"""Segmentation inference heads — vectorized, on-device.

Behavioral spec: the five inference heads at llava_phi.py:308-447. The
reference's panoptic head is a sequential greedy merge loop over queries
(:325-386); here it is reformulated as a static-shape computation: per-pixel
argmax over score-weighted masks, per-query acceptance tests, and stuff-class
merging via a canonical-query map — bit-exact with the greedy loop because
the argmax partition makes per-query pixel sets disjoint and segment ids
depend only on acceptance order.

All heads take an optional ``valid_mask`` (1 inside the un-padded image
region) so they can run at padded resolution on TPU without the reference's
host-side crop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def semantic_inference(class_logits: jnp.ndarray, mask_logits: jnp.ndarray
                       ) -> jnp.ndarray:
    """class_name_semantic_inference (llava_phi.py:402-406).

    class_logits [Q, K]; mask_logits [Q, H, W] -> semseg [K-1, H, W]."""
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), -1)[:, :-1]
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    return jnp.einsum("qc,qhw->chw", probs, masks)


def panoptic_inference(
    class_logits: jnp.ndarray,  # [Q, K] (K includes background last)
    mask_logits: jnp.ndarray,  # [Q, H, W]
    is_thing: jnp.ndarray,  # [K-1] bool
    valid_mask: Optional[jnp.ndarray] = None,  # [H, W]
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """class_name_panoptic_inference (llava_phi.py:325-386), vectorized.

    Returns (panoptic_seg [H, W] int32 with 0 = void,
             dict(id [Q], category [Q], isthing [Q], valid [Q])).
    """
    Q, K = class_logits.shape
    num_classes = K - 1
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), -1)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    if valid_mask is not None:
        masks = masks * valid_mask.astype(masks.dtype)[None]

    keep = (labels != num_classes) & (scores > object_mask_threshold)

    # per-pixel winning query among kept queries (prob-weighted)
    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * masks,
                           -1.0)
    mask_ids = prob_masks.argmax(0)  # [H, W]
    any_kept = keep.any()

    hard = masks >= 0.5
    win = mask_ids[None] == jnp.arange(Q)[:, None, None]  # [Q, H, W]
    final = win & hard
    # mask_area counts only image pixels: the reference's heads run on the
    # cropped (H, W) image, so the padded/bucket region must not count
    # toward the winner's area (hard/final are already zero there because
    # masks is zeroed at invalid pixels, but argmax still "wins" somewhere)
    win_img = win if valid_mask is None else win & valid_mask[None]
    mask_area = jnp.sum(win_img & keep[:, None, None], axis=(1, 2))
    original_area = jnp.sum(hard, axis=(1, 2))
    final_area = jnp.sum(final, axis=(1, 2))

    accepted = (keep & (mask_area > 0) & (original_area > 0) & (final_area > 0)
                & (mask_area >= overlap_threshold * original_area) & any_kept)

    labels_c = jnp.clip(labels, 0, num_classes - 1)
    isthing = is_thing[labels_c] & accepted

    # stuff merging: canonical query = first accepted stuff query of the class
    stuff = accepted & ~isthing
    qidx = jnp.arange(Q)
    same_class = labels_c[None, :] == labels_c[:, None]
    earlier_stuff = stuff[None, :] & same_class & (qidx[None, :] <= qidx[:, None])
    first_stuff = jnp.where(earlier_stuff, qidx[None, :], Q).min(-1)  # [Q]
    canonical = jnp.where(isthing, qidx, jnp.where(stuff, first_stuff, qidx))
    is_canonical = accepted & (canonical == qidx)

    # segment ids in query order over canonical accepted queries
    seg_id_of_canonical = jnp.cumsum(is_canonical.astype(jnp.int32))  # 1-based
    seg_id = jnp.where(accepted, seg_id_of_canonical[canonical], 0)

    # paint: each pixel belongs to at most one query's `final` set
    contrib = jnp.where(final & accepted[:, None, None],
                        seg_id[:, None, None], 0)
    panoptic_seg = contrib.max(0).astype(jnp.int32)

    info = {
        "id": seg_id.astype(jnp.int32),
        "category": labels_c.astype(jnp.int32),
        "isthing": isthing,
        "valid": is_canonical,
    }
    return panoptic_seg, info


def instance_inference(class_logits: jnp.ndarray, mask_logits: jnp.ndarray,
                       topk: int, is_thing: Optional[jnp.ndarray] = None
                       ) -> Dict[str, jnp.ndarray]:
    """class_name_instance_inference (llava_phi.py:407-447).

    Returns dict(masks [k, H, W] bool, scores [k], classes [k],
    keep [k] bool — panoptic thing-filter as a mask, not a gather)."""
    Q, K = class_logits.shape
    num_classes = K - 1
    scores_all = jax.nn.softmax(class_logits.astype(jnp.float32), -1)[:, :-1]
    flat = scores_all.reshape(-1)
    scores, idx = jax.lax.top_k(flat, topk)
    labels = idx % num_classes
    query = idx // num_classes
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))[query]
    hard = masks > 0.5
    mask_scores = (jnp.sum(masks * hard, axis=(1, 2))
                   / (jnp.sum(hard, axis=(1, 2)) + 1e-6))
    out = {
        "masks": hard,
        "scores": scores * mask_scores,
        "classes": labels.astype(jnp.int32),
        "keep": jnp.ones((topk,), bool) if is_thing is None else is_thing[labels],
    }
    return out


def seg_instance_inference(SEG_logits: jnp.ndarray, mask_logits: jnp.ndarray,
                           topk: int) -> Dict[str, jnp.ndarray]:
    """SEG_instance_inference (llava_phi.py:308-324) — referring head."""
    scores_all = jax.nn.sigmoid(SEG_logits.astype(jnp.float32)).reshape(-1)
    scores, idx = jax.lax.top_k(scores_all, topk)
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))[idx]
    hard = masks > 0.5
    mask_scores = (jnp.sum(masks * hard, axis=(1, 2))
                   / (jnp.sum(hard, axis=(1, 2)) + 1e-6))
    return {"masks": hard, "scores": scores * mask_scores,
            "query": idx.astype(jnp.int32)}


def region_inference(region_logits: jnp.ndarray, mask_logits: jnp.ndarray
                     ) -> Dict[str, jnp.ndarray]:
    """region_inference (llava_phi.py:387-400).

    region_logits [R, Q]; mask_logits [Q, H, W].
    Returns dict(masks [Q, H, W] bool, scores [Q, R])."""
    scores = jax.nn.sigmoid(region_logits.astype(jnp.float32))  # [R, Q]
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    hard = masks > 0.5
    mask_scores = (jnp.sum(masks * hard, axis=(1, 2))
                   / (jnp.sum(hard, axis=(1, 2)) + 1e-6))  # [Q]
    return {"masks": hard, "scores": (scores * mask_scores[None, :]).T}
