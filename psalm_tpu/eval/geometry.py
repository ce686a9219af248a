"""Exact crop-then-resize eval geometry as MXU matmuls.

The reference's eval order (llava_phi.py:1400-1459) for every head except
the pure-semantic task is:

  1. bilinear-upsample mask logits x4 to the padded frame
     (F.interpolate align_corners=False, llava_phi.py:1401-1406);
  2. crop the un-padded content region [0:nh, 0:nw]
     (detectron2 sem_seg_postprocess);
  3. bilinear-resize to the ORIGINAL image size (H, W);
  4. run the inference heads at (H, W) in fp32.

Steps 1-3 are linear and separable per axis, so each axis is a matrix:
``U`` (the static x4 upsample, [S, S/4]) and ``M`` (the dynamic
crop-and-resize, [Hb, S] with two nonzero torch-parity weights per row and
zero rows past the image's true H). Their product ``C = M @ U`` [Hb, S/4]
maps mask-resolution logits straight to the original-resolution grid in one
MXU matmul per axis — no full-resolution intermediate, and the per-image
dynamic sizes (nh, nw, H, W) only change matrix VALUES, never shapes, so one
compiled program serves every image.

``Hb``/``Wb`` ("bucket") is a static upper bound on original sizes (COCO
originals are <= 640); rows/cols beyond an image's (H, W) are zero and the
heads mask them out, which is exact because every head's statistic is a sum
or argmax over image pixels.

Weight convention: torch F.interpolate(mode='bilinear',
align_corners=False) — src = (dst + 0.5) * in/out - 0.5, clamped at 0,
lambda = src - floor(src), second tap clamped to in-1 (upsampling.h's
area_pixel_compute_source_index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def interp_matrix(in_valid, out_valid, in_size: int, out_size: int
                  ) -> jnp.ndarray:
    """Torch-parity 1-D bilinear interpolation matrix [out_size, in_size].

    Maps the first ``in_valid`` input samples to the first ``out_valid``
    output samples; rows >= out_valid are all-zero. ``in_valid`` and
    ``out_valid`` may be traced scalars (dynamic per image)."""
    in_valid = jnp.asarray(in_valid, jnp.float32)
    out_valid = jnp.asarray(out_valid, jnp.float32)
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = (i + 0.5) * (in_valid / out_valid) - 0.5
    src = jnp.maximum(src, 0.0)
    hi = in_valid.astype(jnp.int32) - 1
    i0 = jnp.minimum(jnp.floor(src).astype(jnp.int32), hi)
    i1 = jnp.minimum(i0 + 1, hi)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    k = jnp.arange(in_size, dtype=jnp.int32)
    m = (jnp.where(k[None, :] == i0[:, None], w0[:, None], 0.0)
         + jnp.where(k[None, :] == i1[:, None], w1[:, None], 0.0))
    return m * (i[:, None] < out_valid)


@functools.lru_cache(maxsize=8)
def _upsample_matrix_np(in_size: int, out_size: int):
    import numpy as np
    i = np.arange(out_size, dtype=np.float64)
    src = np.maximum((i + 0.5) * (in_size / out_size) - 0.5, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    m = np.zeros((out_size, in_size), np.float64)
    m[np.arange(out_size), i0] += 1.0 - w1
    m[np.arange(out_size), i1] += w1
    return m.astype(np.float32)


def crop_resize_matrix(content, original, lowres_size: int, padded_size: int,
                       bucket: int) -> jnp.ndarray:
    """[bucket, lowres_size] matrix = crop-and-resize(content -> original)
    composed with the static x4 upsample (lowres -> padded frame).

    content / original are traced scalars (the axis's nh / H)."""
    up = jnp.asarray(_upsample_matrix_np(lowres_size, padded_size))
    m = interp_matrix(content, original, padded_size, bucket)
    return jax.lax.dot(m, up, precision=_HIGHEST)


def crop_resize_to_original(x: jnp.ndarray, content_hw, original_hw,
                            padded_size: int, bucket_hw) -> jnp.ndarray:
    """Apply the reference's upsample->crop->resize pipeline to [..., h, w]
    mask-resolution logits, producing [..., Hb, Wb] fp32 where rows >= H and
    cols >= W are zero.

    content_hw: (nh, nw) content region in the padded frame (traced).
    original_hw: (H, W) original image size (traced).
    """
    x = x.astype(jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    ch = crop_resize_matrix(content_hw[0], original_hw[0], h, padded_size,
                            bucket_hw[0])
    cw = crop_resize_matrix(content_hw[1], original_hw[1], w, padded_size,
                            bucket_hw[1])
    y = jnp.einsum("hs,...sw->...hw", ch, x, precision=_HIGHEST)
    return jnp.einsum("...hw,vw->...hv", y, cw, precision=_HIGHEST)


def resize_to_original(x: jnp.ndarray, content_hw, original_hw,
                       bucket_hw) -> jnp.ndarray:
    """sem_seg_postprocess alone (crop [0:nh,0:nw] then bilinear to (H,W))
    for inputs already at the padded frame: [..., S, S] -> [..., Hb, Wb]."""
    x = x.astype(jnp.float32)
    mh = interp_matrix(content_hw[0], original_hw[0], x.shape[-2],
                       bucket_hw[0])
    mw = interp_matrix(content_hw[1], original_hw[1], x.shape[-1],
                       bucket_hw[1])
    y = jnp.einsum("hs,...sw->...hw", mh, x, precision=_HIGHEST)
    return jnp.einsum("...hw,vw->...hv", y, mw, precision=_HIGHEST)


def valid_mask(original_hw, bucket_hw) -> jnp.ndarray:
    """[Hb, Wb] bool: True on the image's (H, W) pixels."""
    rows = jnp.arange(bucket_hw[0]) < original_hw[0]
    cols = jnp.arange(bucket_hw[1]) < original_hw[1]
    return rows[:, None] & cols[None, :]
