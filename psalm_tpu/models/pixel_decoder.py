"""MSDeformAttn-FPN pixel decoder (TPU-native).

Behavioral spec: MSDeformAttnPixelDecoder (msdeformattn.py:166-315) — a
6-layer deformable-DETR encoder over res3/res4/res5 projected to 256-d
(ffn 1024, 8 heads, 4 points/level per llava_phi.py:516), followed by an FPN
step fusing up to res2 (stride 4) and a 1x1 conv to 256-d ``mask_features``.

TPU-first: everything NHWC; reference points and positional embeddings are
static (computed at trace time with numpy); the deformable sampling runs
through psalm_tpu.ops.msdeform (XLA gathers now, Pallas kernel behind the
same dispatcher).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import PixelDecoderConfig
from psalm_tpu.models.layers import position_embedding_sine
from psalm_tpu.ops.msdeform import ms_deform_attn
from psalm_tpu.ops.sampling import resize_bilinear


def _reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Static [S, L, 2] (x, y) in [0,1] — all-valid masks make valid_ratios 1
    (msdeformattn.py:76-87)."""
    pts = []
    for (H, W) in spatial_shapes:
        ys = (np.arange(H, dtype=np.float32) + 0.5) / H
        xs = (np.arange(W, dtype=np.float32) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    ref = np.concatenate(pts, axis=0)  # [S, 2]
    L = len(spatial_shapes)
    return np.broadcast_to(ref[:, None, :], (ref.shape[0], L, 2)).copy()


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Reference init for sampling_offsets bias (ms_deform_attn.py:66-74):
    unit directions per head scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttnLayer(nn.Module):
    """Deformable self-attention module (ms_deform_attn.py:34-124)."""

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Any = jnp.float32
    # None = dispatcher default; "window" = locality-window MXU formulation
    # (ops/msdeform_window.py) with offsets clamped to ±window_radius px.
    impl: Any = None
    # float, or a length-n_points tuple of per-point radii (config.py
    # window_point_radii; ops/msdeform_window.py module docstring)
    window_radius: Any = 8.0
    window_tile: int = 16
    window_head_chunk: int = 1
    window_scan_tiles: bool = True
    window_scan_unroll: int = 1
    window_fold_points: bool = False
    window_custom_vjp: bool = False

    @nn.compact
    def __call__(self, query, src, reference_points, spatial_shapes):
        """query/src: [B, S, D]; reference_points: [S, L, 2] static."""
        B, S, D = src.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points

        value = nn.Dense(D, dtype=self.dtype, name="value_proj")(src)
        value = value.reshape(B, S, M, D // M)

        bias_init = _offset_bias_init(M, L, P)

        def offset_bias(key, shape, dtype=jnp.float32):
            return jnp.asarray(bias_init, dtype).reshape(shape)

        offsets = nn.Dense(M * L * P * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=offset_bias,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, S, M, L, P, 2)
        attn = nn.Dense(M * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, S, M, L * P).astype(jnp.float32),
                              axis=-1).astype(self.dtype).reshape(B, S, M, L, P)

        normalizer = np.array([[w, h] for (h, w) in spatial_shapes],
                              dtype=np.float32)  # [(W,H)] per level
        ref = jnp.asarray(reference_points)[None, :, None, :, None, :]
        loc = ref + offsets / jnp.asarray(normalizer)[None, None, None, :, None, :]

        # Window-mode exactness instrumentation (VERDICT r1 #4): offsets are
        # in target-level pixels, the unit the window clamp operates in.
        # sow() is free unless the caller makes "intermediates" mutable.
        absoff = jnp.abs(offsets.astype(jnp.float32))
        self.sow("intermediates", "offset_max", jnp.max(absoff))
        rad = self.window_radius
        if self.impl == "window_pallas3" and isinstance(rad, (tuple, list)):
            # pallas3 clamps at a flat max(radii) — telemetry must report the
            # radius the chosen impl actually applies (ADVICE r4).
            rad = max(float(r) for r in rad)
        rad_vec = jnp.asarray(
            rad if isinstance(rad, (tuple, list)) else [float(rad)] * P,
            jnp.float32)[None, None, None, None, :, None]  # per-point
        self.sow("intermediates", "offset_clamp_frac",
                 jnp.mean(jnp.any(absoff > rad_vec, axis=-1)
                          .astype(jnp.float32)))

        if self.impl == "window":
            from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
            out = ms_deform_attn_window(value, spatial_shapes, loc, attn,
                                        tile=self.window_tile,
                                        radius=self.window_radius,
                                        head_chunk=self.window_head_chunk,
                                        scan_tiles=self.window_scan_tiles,
                                        scan_unroll=self.window_scan_unroll,
                                        fold_points=self.window_fold_points,
                                        custom_vjp=self.window_custom_vjp)
        elif self.impl == "window_pallas3":
            from psalm_tpu.ops.msdeform_window_pallas3 import (
                ms_deform_attn_window_pallas3)
            # rad is the telemetry's effective radius (already flattened to
            # max(radii) for this impl above) — one source of truth
            out = ms_deform_attn_window_pallas3(
                value, spatial_shapes, loc, attn, tile=self.window_tile,
                radius=rad)
        else:
            out = ms_deform_attn(value, spatial_shapes, loc, attn,
                                 impl=self.impl)
        return nn.Dense(D, dtype=self.dtype, name="output_proj")(out)


class DenseSelfAttention(nn.Module):
    """TPU-first dense alternative to deformable sampling: full flash
    attention over the concatenated multi-scale token sequence. The key/query
    count (21504 at 1024^2) is MXU-friendly — measured ~20x faster than the
    loop-bound gather path on v5e. Not checkpoint-compatible."""

    dim: int
    nheads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, src):
        B, S, C = src.shape
        h = self.nheads
        hd = C // h
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(query).reshape(B, S, h, hd)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(src).reshape(B, S, h, hd)
        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(src).reshape(B, S, h, hd)
        if jax.default_backend() != "cpu" and S % 128 == 0:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            out = flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)), causal=False,
                sm_scale=float(hd) ** -0.5)
            out = jnp.transpose(out, (0, 2, 1, 3))
        else:
            logits = jnp.einsum("bqhd,bshd->bhqs", q * hd ** -0.5, k)
            attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
            out = jnp.einsum("bhqs,bshd->bqhd", attn, v)
        out = out.reshape(B, S, C)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class EncoderLayer(nn.Module):
    """MSDeformAttnTransformerEncoderLayer (msdeformattn.py:27-66)."""

    cfg: PixelDecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        c = self.cfg
        mode = getattr(c, "attention_mode", "deformable")
        if mode == "dense":
            src2 = DenseSelfAttention(c.conv_dim, c.transformer_nheads,
                                      dtype=self.dtype, name="self_attn")(
                src + pos, src)
        else:
            src2 = MSDeformAttnLayer(
                c.conv_dim, c.num_feature_levels, c.transformer_nheads,
                c.enc_points, dtype=self.dtype,
                impl=mode if mode in ("window", "window_pallas3") else None,
                window_radius=(tuple(c.window_point_radii)
                               if getattr(c, "window_point_radii", ())
                               else getattr(c, "window_radius", 8.0)),
                window_tile=getattr(c, "window_tile", 16),
                window_head_chunk=getattr(c, "window_head_chunk", 1),
                window_scan_tiles=getattr(c, "window_scan_tiles", True),
                window_scan_unroll=getattr(c, "window_scan_unroll", 1),
                window_fold_points=getattr(c, "window_fold_points", False),
                window_custom_vjp=getattr(c, "window_custom_vjp", False),
                name="self_attn")(
                src + pos, src, reference_points, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src + src2)
        ffn = nn.Dense(c.transformer_dim_feedforward, dtype=self.dtype,
                       name="linear1")(src)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(c.conv_dim, dtype=self.dtype, name="linear2")(ffn)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src + ffn)


class MSDeformAttnPixelDecoder(nn.Module):
    """Takes NHWC features dict-order (res2, res3, res4, res5); returns
    (mask_features, transformer_encoder_feature, multi_scale_features)."""

    cfg: PixelDecoderConfig
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.cfg
        res2, res3, res4, res5 = features
        # top-down order res5 -> res3 (msdeformattn.py:272-276)
        tr_feats = [res5, res4, res3]

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.conv_dim))

        srcs, poss, shapes = [], [], []
        for i, x in enumerate(tr_feats):
            B, H, W, _ = x.shape
            y = nn.Conv(c.conv_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}_conv")(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                             name=f"input_proj_{i}_norm")(y)
            pos = position_embedding_sine(H, W, c.conv_dim // 2, dtype=jnp.float32)
            pos = jnp.broadcast_to(pos[None], (B, H, W, c.conv_dim))
            srcs.append(y.reshape(B, H * W, c.conv_dim))
            poss.append((pos.reshape(B, H * W, c.conv_dim)
                         + level_embed[i][None, None]).astype(self.dtype))
            shapes.append((H, W))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref_pts = _reference_points(shapes)

        x = src
        layer_cls = nn.remat(EncoderLayer, static_argnums=(4,)) if self.remat             else EncoderLayer
        for li in range(c.transformer_enc_layers):
            x = layer_cls(c, dtype=self.dtype, name=f"encoder_layer_{li}")(
                x, pos, ref_pts, shapes)

        # split back into level maps
        out: List[jnp.ndarray] = []
        start = 0
        B = x.shape[0]
        for (H, W) in shapes:
            out.append(x[:, start:start + H * W].reshape(B, H, W, c.conv_dim))
            start += H * W

        # FPN: fuse res2 (msdeformattn.py:300-308)
        lateral = nn.Conv(c.conv_dim, (1, 1), dtype=self.dtype,
                          name="adapter_1_conv")(res2)
        lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                               name="adapter_1_norm")(lateral)
        lateral = nn.relu(lateral)
        up = resize_bilinear(out[-1].astype(jnp.float32),
                             lateral.shape[1:3]).astype(lateral.dtype)
        y = lateral + up
        y = nn.Conv(c.conv_dim, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="layer_1_conv")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="layer_1_norm")(y)
        y = nn.relu(y)
        out.append(y)

        mask_features = nn.Conv(c.mask_dim, (1, 1), dtype=self.dtype,
                                name="mask_features")(out[-1])
        multi_scale_features = out[:3]  # res5-, res4-, res3-scale
        return mask_features, out[0], multi_scale_features
