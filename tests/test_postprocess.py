"""Postprocess parity: the vectorized panoptic merge must reproduce the
reference's sequential greedy loop (llava_phi.py:325-386), re-implemented
here independently in numpy as the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from psalm_tpu.eval.postprocess import (instance_inference, panoptic_inference,
                                        region_inference,
                                        seg_instance_inference,
                                        semantic_inference)


def greedy_panoptic_oracle(class_logits, mask_logits, is_thing,
                           object_thr=0.8, overlap_thr=0.8):
    """Direct numpy transcription of the greedy merge semantics."""
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    probs = softmax(class_logits)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    masks = 1 / (1 + np.exp(-mask_logits))
    num_classes = class_logits.shape[-1] - 1
    keep = (labels != num_classes) & (scores > object_thr)

    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = masks[keep]
    H, W = masks.shape[-2:]
    pan = np.zeros((H, W), np.int32)
    segments = []
    if cur_masks.shape[0] == 0:
        return pan, segments
    prob_masks = cur_scores[:, None, None] * cur_masks
    mask_ids = prob_masks.argmax(0)
    seg_id = 0
    stuff_memory = {}
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = bool(is_thing[pred_class])
        mask_area = (mask_ids == k).sum()
        original_area = (cur_masks[k] >= 0.5).sum()
        mask = (mask_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_thr:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    pan[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = seg_id + 1
            seg_id += 1
            pan[mask] = seg_id
            segments.append({"id": seg_id, "isthing": isthing,
                             "category_id": pred_class})
    return pan, segments


@pytest.mark.parametrize("seed", range(5))
def test_panoptic_merge_matches_greedy_oracle(seed):
    rng = np.random.default_rng(seed)
    Q, K, H, W = 8, 5, 24, 24
    # confident logits so softmax scores frequently exceed 0.8
    class_logits = rng.standard_normal((Q, K)).astype(np.float32) * 4
    mask_logits = (rng.standard_normal((Q, H, W)).astype(np.float32) * 2
                   + rng.uniform(-2, 2, (Q, 1, 1)).astype(np.float32))
    is_thing = rng.uniform(size=K - 1) > 0.5

    want_pan, want_segs = greedy_panoptic_oracle(class_logits, mask_logits,
                                                 is_thing)
    got_pan, info = panoptic_inference(jnp.asarray(class_logits),
                                       jnp.asarray(mask_logits),
                                       jnp.asarray(is_thing))
    got_pan = np.asarray(got_pan)
    np.testing.assert_array_equal(got_pan, want_pan)

    # segment table parity
    got = {int(i): (bool(t), int(c))
           for i, t, c, v in zip(np.asarray(info["id"]),
                                 np.asarray(info["isthing"]),
                                 np.asarray(info["category"]),
                                 np.asarray(info["valid"])) if v}
    want = {s["id"]: (s["isthing"], s["category_id"]) for s in want_segs}
    assert got == want


def test_semantic_inference():
    rng = np.random.default_rng(0)
    Q, K, H, W = 4, 3, 8, 8
    cl = rng.standard_normal((Q, K)).astype(np.float32)
    ml = rng.standard_normal((Q, H, W)).astype(np.float32)
    sem = np.asarray(semantic_inference(jnp.asarray(cl), jnp.asarray(ml)))
    assert sem.shape == (K - 1, H, W)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    want = np.einsum("qc,qhw->chw", softmax(cl)[:, :-1], 1 / (1 + np.exp(-ml)))
    np.testing.assert_allclose(sem, want, rtol=1e-5, atol=1e-6)


def test_instance_and_referring_heads():
    rng = np.random.default_rng(0)
    Q, K, H, W = 6, 4, 8, 8
    cl = jnp.asarray(rng.standard_normal((Q, K)).astype(np.float32))
    ml = jnp.asarray(rng.standard_normal((Q, H, W)).astype(np.float32))
    out = instance_inference(cl, ml, topk=Q)
    assert out["masks"].shape == (Q, H, W)
    assert np.asarray(out["scores"]).shape == (Q,)

    seg = jnp.asarray(rng.standard_normal((Q, 1)).astype(np.float32))
    ref = seg_instance_inference(seg, ml, topk=Q)
    # top-1 must be the max-score query adjusted by mask quality
    assert np.asarray(ref["scores"]).argmax() == 0  # top_k returns sorted

    reg = jnp.asarray(rng.standard_normal((3, Q)).astype(np.float32))
    rout = region_inference(reg, ml)
    assert rout["scores"].shape == (Q, 3)
