"""Splicer semantics tests: the static expansion must reproduce the
reference's chunk-splice behavior (llava_phi.py:581-766)."""

import numpy as np

from psalm_tpu.data.constants import (
    CLS_TOKEN_INDEX, IGNORE_INDEX, IMAGE_TOKEN_INDEX, REFER_TOKEN_INDEX,
    REGION_TOKEN_INDEX, SEG_TOKEN_INDEX, SRC_IMAGE, SRC_PAD, SRC_REGION,
    SRC_SEG_QUERY, SRC_TEXT)
from psalm_tpu.data.splicer import splice, stack_samples


def test_splice_panoptic_like():
    # text(2) <image> text(1) <cls> <cls> text(1) <seg> text(1)
    ids = [11, 12, IMAGE_TOKEN_INDEX, 13, CLS_TOKEN_INDEX, CLS_TOKEN_INDEX,
           14, SEG_TOKEN_INDEX, 15]
    labels = [IGNORE_INDEX] * 8 + [15]
    cls_ids = np.array([101, 102, 103, 201])  # class 0: 3 tokens, class 1: 1
    cls_idx = np.array([0, 0, 0, 1])
    s = splice(ids, labels, num_image_tokens=4, num_seg_queries=3, pad_len=20,
               class_name_ids=cls_ids, cls_indices=cls_idx)

    # layout: 2 text, 4 image, 1 text, 3 cls(1), 1 cls(2), 1 text, 3 seg, 1 text
    assert s.length == 16
    want_type = ([SRC_TEXT] * 2 + [SRC_IMAGE] * 4 + [SRC_TEXT] +
                 [SRC_TEXT] * 4 + [SRC_TEXT] + [SRC_SEG_QUERY] * 3 +
                 [SRC_TEXT] + [SRC_PAD] * 4)
    assert s.src_type.tolist() == want_type
    # class-name tokens carry real ids and 1-based class indices
    assert s.tok_ids[7:11].tolist() == [101, 102, 103, 201]
    assert s.class_name_embedding_indices[7:11].tolist() == [1, 1, 1, 2]
    # seg positions get src_idx 0..2 and seg mask
    assert s.src_idx[12:15].tolist() == [0, 1, 2]
    assert s.seg_query_mask[12:15].tolist() == [1, 1, 1]
    # image token indices
    assert s.src_idx[2:6].tolist() == [0, 1, 2, 3]
    # labels: only final text token keeps its label
    assert s.labels[15] == 15
    assert (s.labels[:15] == IGNORE_INDEX).sum() == 15
    assert s.attention_mask.sum() == 16


def test_splice_referring_and_regions():
    ids = [11, IMAGE_TOKEN_INDEX, REFER_TOKEN_INDEX, REGION_TOKEN_INDEX,
           REGION_TOKEN_INDEX, SEG_TOKEN_INDEX]
    refer = np.array([301, 302])
    s = splice(ids, None, num_image_tokens=2, num_seg_queries=2, pad_len=12,
               token_refer_id=refer, num_regions=2)
    assert s.tok_ids[3:5].tolist() == [301, 302]
    assert s.refer_embedding_indices[3:5].tolist() == [1, 1]
    assert s.src_type[5:7].tolist() == [SRC_REGION, SRC_REGION]
    assert s.src_idx[5:7].tolist() == [0, 1]
    assert s.region_embedding_mask[5:7].tolist() == [1, 1]

    batch = stack_samples([s, s])
    assert batch["tok_ids"].shape == (2, 12)


def test_splice_overflow_raises():
    import pytest
    with pytest.raises(ValueError):
        splice([IMAGE_TOKEN_INDEX], None, num_image_tokens=100,
               num_seg_queries=1, pad_len=10)
