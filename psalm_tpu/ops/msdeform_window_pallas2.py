"""Lane-packed Pallas window sampler — v2 of msdeform_window_pallas.

Same windowed-deformable math as ops/msdeform_window.py (the oracle), fixing
the two inefficiencies that made the v1 kernel slower than the XLA path
(ROADMAP #2a):

  * the selector matmul ([s, ww*D] @ [ww*D, D]) padded its D=32-lane output
    to 128 lanes (25% MXU util). Replaced with VPU lane reductions: vreg-
    aligned 128-lane slice adds over the padded window axis, then an
    intra-vreg block fold via pltpu.roll — O(ww*D/128 + log(128/D)) vector
    ops instead of an s*wwD*128 matmul;
  * per-head [s, D] output writes padded to 128 lanes. Now G = 128//D heads
    are packed per grid cell, each head's result rolled into its D-lane
    group of one [s, 128] accumulator;
  * the attention-weight fold and the P-point sum happen in-kernel, so the
    kernel writes [s/P, G*D] per cell — 4x less output traffic and no
    XLA-side [*, s, D] intermediate at all.

The t1 = Ay @ win intermediate lives only in VMEM (the XLA path round-trips
~170 MB/head/layer of it through HBM).

Forward-only Pallas; the custom VJP recomputes gradients through the XLA
window path (identical math, matmul-based — no scatters), so training is
exact while eval takes the fast kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psalm_tpu.ops import msdeform as _base
from psalm_tpu.ops import msdeform_window as _win

_SBLK = 256  # samples per grid cell (nq*P rows); bounds VMEM (t1 buffer)


def _tap_matrix(l0, l1, w0, w1, width, dt):
    """[s, width] 2-tap rows via iota compare (taps [s, 1])."""
    s = l0.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, width), 1)
    a0 = jnp.where(cols == l0, w0, 0.0)
    a1 = jnp.where(cols == l1, w1, 0.0)
    return (a0 + a1).astype(dt)


def _fwd_kernel(win_ref, ly0_ref, ly1_ref, wy0_ref, wy1_ref,
                lx0_ref, lx1_ref, wx0_ref, wx1_ref, out_ref, *, P, D):
    """One cell: G heads, sblk samples -> [sblk/P, 128] point-summed out."""
    G = win_ref.shape[0]
    wh, wwDp = win_ref.shape[-2:]
    sblk = ly0_ref.shape[3]
    nv = wwDp // 128
    bpv = 128 // D  # D-blocks per vreg

    acc = jnp.zeros((sblk, 128), jnp.float32)
    for g in range(G):
        Ay = _tap_matrix(ly0_ref[g, 0, 0], ly1_ref[g, 0, 0],
                         wy0_ref[g, 0, 0], wy1_ref[g, 0, 0], wh,
                         win_ref.dtype)
        # t1 in the value dtype (the XLA window path also holds t1 in bf16);
        # halves the dominant VMEM buffer and the lane-reduce VPU traffic
        t1 = jnp.dot(Ay, win_ref[g, 0, 0],
                     preferred_element_type=jnp.float32).astype(win_ref.dtype)
        # x-tap weighting + lane reduction per 128-lane vreg slice (a
        # block-repeat lane expansion of a narrow [s, ww] tap row would be
        # cheaper, but Mosaic lowers neither jnp.repeat nor a np.repeat-
        # style pltpu primitive for the lane axis — pltpu.repeat tiles)
        lx0 = lx0_ref[g, 0, 0]
        lx1 = lx1_ref[g, 0, 0]
        wx0 = wx0_ref[g, 0, 0]
        wx1 = wx1_ref[g, 0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (sblk, 128), 1)
        v = jnp.zeros((sblk, 128), jnp.float32)
        for k in range(nv):
            lane_w = (lane + k * 128) // D
            a = (jnp.where(lane_w == lx0, wx0, 0.0)
                 + jnp.where(lane_w == lx1, wx1, 0.0))
            v = v + t1[:, k * 128:(k + 1) * 128] * a
        # intra-vreg fold: sum the bpv D-blocks into lanes [0, D)
        step = bpv
        width = 128
        while step > 1:
            width //= 2
            # left-roll by `width` == circular right-roll by 128 - width
            # (pltpu.roll requires a non-negative shift)
            v = v + pltpu.roll(v, shift=128 - width, axis=1)
            step //= 2
        # deposit into head g's lane group
        lane = jax.lax.broadcasted_iota(jnp.int32, (sblk, 128), 1)
        head_val = jnp.where(lane < D, v, 0.0)
        if g:
            head_val = pltpu.roll(head_val, shift=g * D, axis=1)
        acc = acc + head_val

    # P-point sum: [sblk, 128] -> [sblk/P, 128]
    out_ref[0, 0, 0] = acc.reshape(sblk // P, P, 128).sum(axis=1)


def _pick_sblk(s_total: int, P: int) -> int:
    if s_total <= _SBLK:
        return s_total
    blk = _SBLK
    while blk > P * 8 and (s_total % blk or (blk // P) % 8):
        blk -= P * 8
    return blk if s_total % blk == 0 else s_total


def _sample_packed(win, taps, G, P, D, interpret):
    """win [Mg, G, B, T, wh, wwDp]; taps 8x [Mg, G, B, T, S, 1];
    returns [Mg, B, T, S/P, 128] f32."""
    Mg, G_, B, T, wh, wwDp = win.shape
    S = taps[0].shape[-2]
    sblk = _pick_sblk(S, P)
    N = S // sblk
    grid = (Mg, B, T, N)
    win_spec = pl.BlockSpec((1, G, 1, 1, wh, wwDp),
                            lambda m, b, t, n: (m, 0, b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    tap = pl.BlockSpec((1, G, 1, 1, sblk, 1),
                       lambda m, b, t, n: (m, 0, b, t, n, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, 1, sblk // P, 128),
                            lambda m, b, t, n: (m, b, t, n, 0),
                            memory_space=pltpu.VMEM)

    def kernel(win_ref, *refs):
        _fwd_kernel(win_ref[0], *[r[0] for r in refs[:-1]], refs[-1],
                    P=P, D=D)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[win_spec] + [tap] * 8,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mg, B, T, S // P, 128), jnp.float32),
        interpret=interpret,
    )(win, *taps)


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             tile, radius, interpret):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dt = value.dtype
    radius = float(radius)
    G = 128 // D
    while M % G:
        G //= 2
    Mg = M // G

    lvl_start = []
    s0 = 0
    for (H, W) in spatial_shapes:
        lvl_start.append(s0)
        s0 += H * W

    outs = []
    for lqi, (Hq, Wq) in enumerate(spatial_shapes):
        Sq = Hq * Wq
        q0 = lvl_start[lqi]
        thq = _win._tile_dim(Hq, tile)
        twq = _win._tile_dim(Wq, tile)
        Ty, Tx = Hq // thq, Wq // twq
        T, nq = Ty * Tx, thq * twq

        def tilefy(a):
            sh = a.shape
            a = a.reshape((B, Ty, thq, Tx, twq) + sh[2:])
            a = jnp.moveaxis(a, 3, 2)
            return a.reshape((B, T, nq) + sh[2:])

        loc_q = tilefy(sampling_locations[:, q0:q0 + Sq])
        attn_q = tilefy(attention_weights[:, q0:q0 + Sq])

        acc = None  # [Mg, B, T, nq, 128] f32
        for lvi, (Hv, Wv) in enumerate(spatial_shapes):
            wh, sy = _win._axis_plan(Ty, thq, Hv, Hq, Hv, radius)
            ww, sx = _win._axis_plan(Tx, twq, Wv, Wq, Wv, radius)
            wwDp = -(-ww * D // 128) * 128
            starts = np.stack(np.meshgrid(np.asarray(sy, np.int32),
                                          np.asarray(sx, np.int32),
                                          indexing="ij"), -1).reshape(-1, 2)
            refy, refx = _win._ref_grid(Hq, Wq, thq, twq, Hv, Wv)

            v0 = lvl_start[lvi]
            vlv = value[:, v0:v0 + Hv * Wv].reshape(B, Hv, Wv, M, D)
            vh = jnp.moveaxis(vlv, 3, 0)                  # [M,B,Hv,Wv,D]
            st = jnp.asarray(starts)
            win = jax.vmap(jax.vmap(lambda vb: jax.vmap(
                lambda s_: jax.lax.dynamic_slice(
                    vb, (s_[0], s_[1], 0), (wh, ww, D)))(st)))(vh)
            win = win.reshape(M, B, T, wh, ww * D)
            if wwDp != ww * D:
                win = jnp.pad(win, ((0, 0),) * 4 + ((0, wwDp - ww * D),))
            win = win.reshape(Mg, G, B, T, wh, wwDp)

            x = loc_q[..., lvi, :, 0] * Wv - 0.5          # [B,T,nq,M,P]
            y = loc_q[..., lvi, :, 1] * Hv - 0.5
            aw = attn_q[..., lvi, :].astype(jnp.float32)
            rx = jnp.asarray(refx)[None, :, :, None]
            ry = jnp.asarray(refy)[None, :, :, None]
            sx_b = jnp.asarray(starts[:, 1])[None, :, None, None]
            sy_b = jnp.asarray(starts[:, 0])[None, :, None, None]

            xh = jnp.moveaxis(x, 3, 0)                    # [M,B,T,nq,P]
            yh = jnp.moveaxis(y, 3, 0)
            awh = jnp.moveaxis(aw, 3, 0)
            lx0, lx1, wx0, wx1 = _win._axis_taps(
                xh, rx[None], sx_b[None], ww, Wv, radius, jnp.float32)[:4]
            ly0, ly1, wy0, wy1 = _win._axis_taps(
                yh, ry[None], sy_b[None], wh, Hv, radius, jnp.float32)[:4]
            # fold the attention weights into the x taps (as the XLA path
            # does) so the kernel's P-sum directly yields the output
            wx0 = wx0 * awh
            wx1 = wx1 * awh

            def shp(a):
                return a.reshape(Mg, G, B, T, nq * P, 1)

            taps = (shp(ly0), shp(ly1), shp(wy0), shp(wy1),
                    shp(lx0), shp(lx1), shp(wx0), shp(wx1))
            contrib = _sample_packed(win, taps, G, P, D, interpret)
            acc = contrib if acc is None else acc + contrib

        # [Mg, B, T, nq, 128] -> [B, Sq, M*D]
        o = acc[..., :G * D].reshape(Mg, B, T, nq, G, D)
        o = jnp.transpose(o, (1, 2, 3, 0, 4, 5)).reshape(B, T, nq, M * D)
        o = o.reshape(B, Ty, Tx, thq, twq, M * D)
        o = jnp.moveaxis(o, 2, 3).reshape(B, Sq, M * D)
        outs.append(o)

    return jnp.concatenate(outs, axis=1).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def _op(value, spatial_shapes, sampling_locations, attention_weights,
        tile, radius, interpret):
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights, tile, radius, interpret)


def _op_fwd(value, spatial_shapes, sampling_locations, attention_weights,
            tile, radius, interpret):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights, tile, radius, interpret)
    return out, (value, sampling_locations, attention_weights)


def _op_bwd(spatial_shapes, tile, radius, interpret, res, g):
    # identical math through the matmul-based XLA window path (no scatters);
    # recompute-in-backward, standard remat cost
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: _win.ms_deform_attn_window(
            v, spatial_shapes, l, a, tile=tile, radius=radius),
        value, loc, attn)
    return vjp(g.astype(value.dtype))


_op.defvjp(_op_fwd, _op_bwd)


def ms_deform_attn_window_pallas2(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    tile: int = 16,
    radius: float = 8.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ms_deform_attn_window with the lane-packed sampler."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple(tuple(s) for s in spatial_shapes)
    if (Q != S or 128 % D or (jax.default_backend() == "cpu"
                              and not interpret)):
        return _win.ms_deform_attn_window(
            value, spatial_shapes, sampling_locations, attention_weights,
            tile=tile, radius=radius)
    return _op(value, spatial_shapes, sampling_locations, attention_weights,
               tile, float(radius), interpret)


_base.register_impl("window_pallas2", ms_deform_attn_window_pallas2)
