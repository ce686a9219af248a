"""eval/geometry.py vs torch F.interpolate: the composed crop-then-resize
matrices must reproduce the reference's two-step pipeline (x4 bilinear
upsample -> crop [0:nh, 0:nw] -> bilinear resize to (H, W), all
align_corners=False) to fp32 precision, with zero rows/cols past (H, W)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from psalm_tpu.eval.geometry import (crop_resize_to_original,
                                     resize_to_original, valid_mask)

CASES = [((37, 64), (300, 500)), ((64, 40), (123, 77)),
         ((50, 50), (50, 50)), ((17, 33), (640, 480))]


@pytest.mark.parametrize("content,orig", CASES)
def test_crop_resize_matches_torch_two_step(content, orig):
    (nh, nw), (H, W) = content, orig
    S, s4, Hb, Wb = 64, 16, 640, 640
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, s4, s4)).astype(np.float32)

    t = torch.from_numpy(x)[None]
    up = F.interpolate(t, size=(S, S), mode="bilinear", align_corners=False)[0]
    ref = F.interpolate(up[:, :nh, :nw][None], size=(H, W), mode="bilinear",
                        align_corners=False)[0].numpy()

    ours = np.asarray(crop_resize_to_original(
        jnp.asarray(x), (jnp.int32(nh), jnp.int32(nw)),
        (jnp.int32(H), jnp.int32(W)), S, (Hb, Wb)))
    np.testing.assert_allclose(ours[:, :H, :W], ref, atol=2e-5, rtol=1e-5)
    assert (ours[:, H:, :] == 0).all() and (ours[:, :, W:] == 0).all()


@pytest.mark.parametrize("content,orig", CASES[:2])
def test_resize_to_original_matches_sem_seg_postprocess(content, orig):
    """The padded-frame restore alone (detectron2 sem_seg_postprocess)."""
    (nh, nw), (H, W) = content, orig
    S, Hb, Wb = 64, 640, 640
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, S, S)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x[:, :nh, :nw])[None], size=(H, W),
                        mode="bilinear", align_corners=False)[0].numpy()
    ours = np.asarray(resize_to_original(
        jnp.asarray(x), (jnp.int32(nh), jnp.int32(nw)),
        (jnp.int32(H), jnp.int32(W)), (Hb, Wb)))
    np.testing.assert_allclose(ours[:, :H, :W], ref, atol=2e-5, rtol=1e-5)


def test_valid_mask():
    m = np.asarray(valid_mask((jnp.int32(3), jnp.int32(5)), (8, 8)))
    assert m[:3, :5].all() and m.sum() == 15


def test_bucket_for_sizes():
    from psalm_tpu.eval.runner import bucket_for_sizes
    assert bucket_for_sizes([(480, 640), (500, 333)]) == (512, 640)
    assert bucket_for_sizes([(97, 131)], multiple=32) == (128, 160)
