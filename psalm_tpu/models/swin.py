"""Swin Transformer backbone in flax.linen (NHWC, TPU-first).

Behavioral spec: psalm/model/multimodal_encoder/swin_trans.py (the copy PSALM
actually uses — build_swin_b at swin_trans.py:660: embed 128, depths
[2,2,18,2], heads [4,8,16,32], window 12, pre-stage-output LayerNorms
``norm{0..3}``). Produces 4 scales res2..res5 at strides 4/8/16/32.

TPU-first notes:
  * window partition/reverse are pure reshapes/transposes — XLA tiles them.
  * The reference zero-pads each block to a window multiple *after* norm1 and
    lets padded tokens participate in attention of un-shifted blocks
    (swin_trans.py:210-232); we reproduce that exactly for checkpoint parity.
  * Shifted-window attention masks depend only on static (Hp, Wp, window,
    shift) so they are computed with numpy at trace time — no device work.
  * All matmuls run in the configured compute dtype (bf16 on TPU); softmax in
    f32 for stability.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import SwinConfig


def _relative_position_index(window_size: int) -> np.ndarray:
    """Static [Wh*Ww, Wh*Ww] index into the (2w-1)^2 bias table
    (swin_trans.py:96-107)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(Hp: int, Wp: int, window_size: int, shift: int) -> np.ndarray:
    """Static additive attention mask for shifted windows
    (swin_trans.py:368-387): [nW, ws*ws, ws*ws] with 0 / -100."""
    img_mask = np.zeros((Hp, Wp))
    h_slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    w_slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[h, w] = cnt
            cnt += 1
    nH, nW = Hp // window_size, Wp // window_size
    mw = img_mask.reshape(nH, window_size, nW, window_size)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C] (H, W multiples of ws)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """[B*nH*nW, ws*ws, C] -> [B, H, W, C]."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray]) -> jnp.ndarray:
        """x: [nW*B, N, C]; mask: static [nW, N, N] additive or None."""
        Bn, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [Bn, N, h, hd]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        # The bias expansion is a STATIC-index gather of N*N rows; XLA's TPU
        # gather is loop-bound (~300 ns/row). A flat one-hot matmul fixes
        # that but materializes an [N^2, (2w-1)^2] constant (44 MB f32 at
        # w=12) that every block re-reads from HBM at runtime (the table is
        # a jit ARGUMENT, so nothing constant-folds). The bias is Toeplitz
        # in (dy, dx), so it factors into two per-axis one-hot matmuls over
        # [w^2, 2w-1] constants (~13 KB each):
        #   bias[(y1,x1),(y2,x2)] = T2[y1-y2+w-1, x1-x2+w-1]
        ws = self.window_size
        nb = 2 * ws - 1
        ar = np.arange(ws)
        d = (ar[:, None] - ar[None, :] + ws - 1).reshape(-1)  # [ws*ws] pairs
        axis_onehot = np.zeros((ws * ws, nb), np.float32)
        axis_onehot[np.arange(ws * ws), d] = 1.0
        A = jnp.asarray(axis_onehot)
        # rel_index = (dy+w-1)*(2w-1) + (dx+w-1), so table.reshape(nb, nb)
        # is indexed [dy-bucket, dx-bucket] (_relative_position_index)
        t2 = bias_table.astype(jnp.float32).reshape(nb, nb * h)
        u = (A @ t2).reshape(ws * ws, nb, h)          # [y-pair, dx-bucket, h]
        u = jnp.transpose(u, (1, 0, 2)).reshape(nb, ws * ws * h)
        bias = (A @ u).reshape(ws * ws, ws * ws, h)   # [x-pair, y-pair, h]
        # pair index p = i1*ws + i2; reorder to [(y1,x1), (y2,x2)]
        bias = bias.reshape(ws, ws, ws, ws, h)        # [x1, x2, y1, y2, h]
        bias = jnp.transpose(bias, (4, 2, 0, 3, 1)).reshape(h, N, N)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask, dtype=attn.dtype)  # [nW, N, N]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + m[None, :, None]
            attn = attn.reshape(Bn, h, N, N)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, H*W, C]."""
        B, L, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, shift=(-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, ws, self.shift_size)
        else:
            mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                             dtype=self.dtype, name="attn")(xw, mask)
        x = window_reverse(xw, ws, Hp, Wp)

        if self.shift_size > 0:
            x = jnp.roll(x, shift=(self.shift_size, self.shift_size), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, H * W, C)

        x = shortcut + self._drop_path(x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y, deterministic)

    def _drop_path(self, x, deterministic):
        if deterministic or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask.astype(x.dtype) / keep


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns (res2, res3, res4, res5) as NHWC feature maps."""

    cfg: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        """images: [B, H, W, 3] normalized."""
        c = self.cfg
        B, H, W, _ = images.shape
        x = nn.Conv(c.embed_dim, kernel_size=(c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), dtype=self.dtype,
                    name="patch_embed_proj")(images)
        Wh, Ww = x.shape[1], x.shape[2]
        x = x.reshape(B, Wh * Ww, c.embed_dim)
        if c.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_embed_norm")(x)

        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths))
        outs = []
        dims = c.num_features
        cur = 0
        for i, depth in enumerate(c.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim=dims[i], num_heads=c.num_heads[i],
                    window_size=c.window_size,
                    shift_size=0 if j % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                    drop_path=float(dpr[cur + j]), dtype=self.dtype,
                    name=f"layers_{i}_blocks_{j}",
                )(x, Wh, Ww, deterministic)
            cur += depth
            if i in c.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm{i}")(x)
                outs.append(y.reshape(B, Wh, Ww, dims[i]))
            if i < len(c.depths) - 1:
                x = PatchMerging(dims[i], dtype=self.dtype,
                                 name=f"layers_{i}_downsample")(x, Wh, Ww)
                Wh, Ww = (Wh + 1) // 2, (Ww + 1) // 2
        return tuple(outs)
