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
    """Bilinear sample features at normalized points; returns [B, N, C].

    TPU gathers are loop-bound (~300 ns per fetched row regardless of
    width), so the four bilinear corners are fetched as ONE 2x2 patch per
    point via lax.gather slice_sizes — 4x fewer loop iterations, exact
    (every valid corner lies inside the edge-clipped patch; invalid corners
    carry zero weight).
    """
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
    fx = (px - x0).astype(feat.dtype)
    fy = (py - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if H < 2 or W < 2 or C < 2:
        # degenerate maps and single-channel feats: per-corner row gathers
        # (slice_sizes=(2,2,1) patch gathers kernel-fault the axon TPU
        # worker)
        flat = feat.reshape(B, H * W, C)

        def corner(yi, xi, wy, wx):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            g = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(flat, idx)
            return g * ((wy * wx) * valid.astype(feat.dtype))[..., None]

        out = corner(y0i, x0i, (1 - fy), (1 - fx))
        out = out + corner(y0i, x0i + 1, (1 - fy), fx)
        out = out + corner(y0i + 1, x0i, fy, (1 - fx))
        out = out + corner(y0i + 1, x0i + 1, fy, fx)
        return out

    yc = jnp.clip(y0i, 0, H - 2)
    xc = jnp.clip(x0i, 0, W - 2)
    starts = jnp.stack([yc, xc], axis=-1)  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.vmap(lambda f, s: jax.lax.gather(
        f, s, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))(feat, starts)
    # patch: [B, N, 2, 2, C]

    wsum = jnp.zeros((*x.shape, 2, 2), feat.dtype)
    for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)),
                        (0, 1, (1 - fy) * fx),
                        (1, 0, fy * (1 - fx)),
                        (1, 1, fy * fx)):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        py_ = jnp.clip(yi - yc, 0, 1)
        px_ = jnp.clip(xi - xc, 0, 1)
        w = wgt * valid.astype(feat.dtype)
        sel_y = jax.nn.one_hot(py_, 2, dtype=feat.dtype)
        sel_x = jax.nn.one_hot(px_, 2, dtype=feat.dtype)
        wsum = wsum + (w[..., None, None] * sel_y[..., :, None]
                       * sel_x[..., None, :])
    return jnp.einsum("bnyx,bnyxc->bnc", wsum, patch)


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


# ---------------------------------------------------------------------------
# matmul-backward point sampling (criterion hot path)


def _axis_weights(p: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dense bilinear interpolation weights along one axis.

    p: [..., P] continuous pixel coordinates; returns [..., P, n] with
    w[..., j] = max(0, 1 - |p - j|) — exactly the two-tap bilinear weights
    (rows outside [0, n) simply have no column, reproducing zero padding).
    """
    j = jnp.arange(n, dtype=p.dtype)
    return jnp.maximum(jnp.asarray(0, p.dtype),
                       1.0 - jnp.abs(p[..., None] - j))


import functools


@functools.lru_cache(maxsize=64)
def _psm_build(fshape, fdtype_name, align_corners):
    """custom_vjp instance specialized to a static feat shape/dtype (the
    residual tree may only hold arrays, so shape/dtype live in this
    closure)."""
    B, H, W, C = fshape
    fdtype = jnp.dtype(fdtype_name)

    @jax.custom_vjp
    def sample(feat, coords):
        return point_sample(feat, coords, align_corners=align_corners)

    def fwd(feat, coords):
        return sample(feat, coords), coords

    def bwd(coords, cot):
        if align_corners:
            px = (coords[..., 0] * (W - 1)).astype(jnp.float32)
            py = (coords[..., 1] * (H - 1)).astype(jnp.float32)
        else:
            px = (coords[..., 0] * W - 0.5).astype(jnp.float32)
            py = (coords[..., 1] * H - 0.5).astype(jnp.float32)
        wy = _axis_weights(py, H)  # [B, P, H]
        wx = _axis_weights(px, W)  # [B, P, W]
        cot = cot.astype(jnp.float32)
        P = coords.shape[1]
        # chunk points so the [B, chunk, W, C] workspace stays small
        chunk = max(1, min(P, (64 << 20) // max(1, 4 * W * C)))
        n_chunks = -(-P // chunk)
        pad = n_chunks * chunk - P
        if pad:
            wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0)))
            wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0)))
            cot = jnp.pad(cot, ((0, 0), (0, pad), (0, 0)))
        wy = wy.reshape(B, n_chunks, chunk, H)
        wx = wx.reshape(B, n_chunks, chunk, W)
        cot = cot.reshape(B, n_chunks, chunk, C)

        def body(acc, args):
            wy_c, wx_c, cot_c = args  # [B, chunk, {H,W,C}]
            v = wx_c[..., :, None] * cot_c[..., None, :]  # [B, chunk, W, C]
            g = jnp.einsum("bph,bpwc->bhwc", wy_c, v,
                           preferred_element_type=jnp.float32)
            return acc + g, ()

        acc0 = jnp.zeros((B, H, W, C), jnp.float32)
        grad, _ = jax.lax.scan(
            body, acc0,
            (wy.transpose(1, 0, 2, 3), wx.transpose(1, 0, 2, 3),
             cot.transpose(1, 0, 2, 3)))
        return grad.astype(fdtype), jnp.zeros_like(coords)

    sample.defvjp(fwd, bwd)
    return sample


def point_sample_mmgrad(feat: jnp.ndarray, coords: jnp.ndarray,
                        align_corners: bool = False) -> jnp.ndarray:
    """point_sample(align_corners=False) whose feature gradient is computed
    as dense MXU matmuls instead of the gather VJP's scatter-add.

    TPU scatter-add is loop-bound (~300 ns/index); the criterion's backward
    scatters P x N x 4 taps per supervision layer (~10M adds per step, the
    bulk of the train step). grad_feat[b,h,w,c] = sum_p wy[b,p,h] wx[b,p,w]
    cot[b,p,c] with the dense per-axis weights of ``_axis_weights`` is the
    same gradient computed as einsums over point chunks (~33 GFLOP, ~1 ms).

    COORDS ARE TREATED AS NON-DIFFERENTIABLE (zero gradient) — every
    criterion call site wraps coords in stop_gradient already; do NOT use
    this variant where a coords gradient is needed.
    """
    return _psm_build(tuple(feat.shape), feat.dtype.name,
                      bool(align_corners))(feat, coords)
