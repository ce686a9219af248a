"""Bilinear point sampling and resize utilities (NHWC, TPU-friendly).

``point_sample`` reproduces detectron2's point_sample wrapper around
torch.nn.functional.grid_sample (point coords in [0,1]^2, grid = 2*coords-1,
padding_mode='zeros'), used by the reference's criterion
(pretrain_criterion.py:263-273), matcher (pretrain_criterion.py:424-434) and
visual-prompt region sampler (context_cluster.py:43-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(
    feat: jnp.ndarray,  # [B, H, W, C]
    coords: jnp.ndarray,  # [B, N, 2] (x, y) in [0, 1]
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample features at normalized points; returns [B, N, C]."""
    B, H, W, C = feat.shape
    x = coords[..., 0]
    y = coords[..., 1]
    if align_corners:
        px = x * (W - 1)
        py = y * (H - 1)
    else:
        px = x * W - 0.5
        py = y * H - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = (px - x0).astype(feat.dtype)
    wy1 = (py - y0).astype(feat.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = feat.reshape(B, H * W, C)

    def corner(yi, xi, wy, wx):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        g = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(flat, idx)
        return g * ((wy * wx) * valid.astype(feat.dtype))[..., None]

    out = corner(y0i, x0i, wy0, wx0)
    out = out + corner(y0i, x0i + 1, wy0, wx1)
    out = out + corner(y0i + 1, x0i, wy1, wx0)
    out = out + corner(y0i + 1, x0i + 1, wy1, wx1)
    return out


def resize_bilinear(x: jnp.ndarray, out_hw, antialias: bool = False) -> jnp.ndarray:
    """Bilinear resize on [..., H, W, C], half-pixel centers (matches
    F.interpolate(mode='bilinear', align_corners=False))."""
    *lead, H, W, C = x.shape
    shape = (*lead, out_hw[0], out_hw[1], C)
    return jax.image.resize(x, shape, method="bilinear", antialias=antialias)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    *lead, H, W, C = x.shape
    shape = (*lead, out_hw[0], out_hw[1], C)
    return jax.image.resize(x, shape, method="nearest")
