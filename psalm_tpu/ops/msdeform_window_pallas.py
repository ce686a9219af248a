"""Pallas TPU kernel for the locality-window deformable sampler.

Same math as ops/msdeform_window.py (which is the oracle for this file),
with the two memory-bound XLA artifacts removed:

  * the per-head T1 = Ay @ window intermediate (168 MB/head/layer in HBM on
    the XLA path) stays in VMEM, and
  * the one-hot tap matrices are built on-chip from iota comparisons
    instead of materializing [s, w] weight matrices in HBM.

Decomposition per grid cell (head m, batch b, tile t, sample-chunk n):
    Ay  [s, wh]        2-tap rows from (ly0, ly1, wy0, wy1)    (VPU iota)
    T1  = Ay @ win     win [wh, ww*D]                          (MXU)
    Ax~ [s, ww*D]      x-taps expanded to lanes via lane//D    (VPU iota)
    out = (T1 * Ax~) @ Sel,  Sel[l, d] = (l % D == d)          (MXU)

Geometry (tap indices/weights, window extraction, attention-weight fold,
point-sum) stays in XLA — shared, tested code from ops/msdeform_window.py —
so the kernel's custom VJP only needs d/d(win, wy0, wy1, wx0, wx1); the
chain into d(value), d(sampling_locations), d(attention_weights) is plain
XLA autodiff by composition.

The kernel requires D (head dim) to divide 128 and s % 8 == 0; PSALM's
encoder (D=32, s=1024) satisfies both. Falls back to the XLA window path
off-TPU unless interpret=True.

Status (v5e, encoder shapes): numerically exact (bf16 roundoff vs the XLA
window path) but currently SLOWER — fwd 60 ms vs 39, fwd+bwd 112 ms vs 76.
The per-cell work ([256, wh] @ [wh, ww*D]) is too small to hide grid
overheads, and the D=32-lane output writes pad to 128 lanes. Kept as
impl="window_pallas" for future tuning (multi-head lane packing to fill
the 128-lane output is the known next step); the XLA window formulation
remains the production default.
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

# samples per grid cell. 256 bounds backward-pass VMEM (~5 live
# [sblk, ww*D] f32 buffers) under the ~16 MB budget; 1024 fails to compile.
_SBLK = 256


def _tap_matrix(l0, l1, w0, w1, width):
    """[s, width] 2-tap rows via iota compare — no gathers, no HBM.

    Taps arrive as [s, 1] column vectors (the singleton lane dim satisfies
    the Mosaic block-shape rule) and broadcast naturally against the iota.
    """
    s = l0.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, width), 1)
    a0 = jnp.where(cols == l0, w0, 0.0)
    a1 = jnp.where(cols == l1, w1, 0.0)
    return (a0 + a1).astype(jnp.float32)


def _expand_x_taps(lx0, lx1, wx0, wx1, ww, D):
    """x-taps [s, 1] broadcast over each tap's D lanes: [s, ww*D]."""
    s = lx0.shape[0]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (s, ww * D), 1) // D
    a0 = jnp.where(lane_w == lx0, wx0, 0.0)
    a1 = jnp.where(lane_w == lx1, wx1, 0.0)
    return (a0 + a1).astype(jnp.float32)


def _sel(ww, D):
    """Constant block-sum selector [ww*D, D]: Sel[l, d] = (l % D == d)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 0) % D
    cols = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 1)
    return (rows == cols).astype(jnp.float32)


def _fwd_kernel(win_ref, ly0_ref, ly1_ref, wy0_ref, wy1_ref,
                lx0_ref, lx1_ref, wx0_ref, wx1_ref, out_ref):
    wh, wwD = win_ref.shape[-2:]
    D = out_ref.shape[-1]
    ww = wwD // D
    Ay = _tap_matrix(ly0_ref[0, 0, 0], ly1_ref[0, 0, 0],
                     wy0_ref[0, 0, 0], wy1_ref[0, 0, 0], wh)
    t1 = jnp.dot(Ay, win_ref[0, 0, 0].astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    Ax = _expand_x_taps(lx0_ref[0, 0, 0], lx1_ref[0, 0, 0],
                        wx0_ref[0, 0, 0], wx1_ref[0, 0, 0], ww, D)
    out_ref[0, 0, 0] = jnp.dot(t1 * Ax, _sel(ww, D),
                                  preferred_element_type=jnp.float32)


def _bwd_kernel(win_ref, ly0_ref, ly1_ref, wy0_ref, wy1_ref,
                lx0_ref, lx1_ref, wx0_ref, wx1_ref, g_ref,
                dwin_ref, dwy0_ref, dwy1_ref, dwx0_ref, dwx1_ref):
    wh, wwD = win_ref.shape[-2:]
    D = g_ref.shape[-1]
    ww = wwD // D
    n = pl.program_id(3)

    ly0 = ly0_ref[0, 0, 0]
    ly1 = ly1_ref[0, 0, 0]
    lx0 = lx0_ref[0, 0, 0]
    lx1 = lx1_ref[0, 0, 0]
    Ay = _tap_matrix(ly0, ly1, wy0_ref[0, 0, 0], wy1_ref[0, 0, 0], wh)
    Ax = _expand_x_taps(lx0, lx1, wx0_ref[0, 0, 0], wx1_ref[0, 0, 0],
                        ww, D)
    win = win_ref[0, 0, 0].astype(jnp.float32)
    g = g_ref[0, 0, 0].astype(jnp.float32)        # [s, D]

    # u[s, ww*D] = g broadcast over each tap block — a dot with Sel^T
    # (a take_along_axis here would lower to a Mosaic gather)
    s = g.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, wwD), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (D, wwD), 1) % D
    selT = (rows == cols).astype(jnp.float32)        # [D, ww*D]
    u = jnp.dot(g, selT, preferred_element_type=jnp.float32)

    t1 = jnp.dot(Ay, win, preferred_element_type=jnp.float32)
    uAx = u * Ax

    # dWin accumulates over the sample-chunk grid axis
    dwin = jax.lax.dot_general(Ay, uAx, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    @pl.when(n == 0)
    def _():
        dwin_ref[0, 0, 0] = dwin

    @pl.when(n != 0)
    def _():
        dwin_ref[0, 0, 0] = dwin_ref[0, 0, 0] + dwin

    # x-tap weight grads: row-reduce (t1*u) over each tap's lane block
    dAx_exp = t1 * u                                  # [s, ww*D]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (s, wwD), 1) // D
    dwx0_ref[0, 0, 0] = jnp.sum(
        jnp.where(lane_w == lx0, dAx_exp, 0.0), axis=1, keepdims=True)
    dwx1_ref[0, 0, 0] = jnp.sum(
        jnp.where(lane_w == lx1, dAx_exp, 0.0), axis=1, keepdims=True)

    # y-tap weight grads: dAy = (u*Ax) @ win^T, then 2-tap row-reduce
    dAy = jax.lax.dot_general(uAx, win, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [s, wh]
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (s, wh), 1)
    dwy0_ref[0, 0, 0] = jnp.sum(
        jnp.where(cols_h == ly0, dAy, 0.0), axis=1, keepdims=True)
    dwy1_ref[0, 0, 0] = jnp.sum(
        jnp.where(cols_h == ly1, dAy, 0.0), axis=1, keepdims=True)


def _pick_sblk(s_total: int) -> int:
    blk = min(_SBLK, s_total)
    while s_total % blk:
        blk -= 8
    return max(blk, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _sample(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1, interpret, D):
    return _sample_fwd_impl(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1,
                            interpret, D)


def _sample_fwd_impl(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1, interpret,
                     D):
    """win [M,B,T,wh,ww*D]; taps [M,B,T,S,1]; returns [M,B,T,S,D] f32."""
    M, B, T, wh, wwD = win.shape
    S = ly0.shape[-2]
    sblk = _pick_sblk(S)
    N = S // sblk
    grid = (M, B, T, N)
    tap = pl.BlockSpec((1, 1, 1, sblk, 1),
                       lambda m, b, t, n: (m, b, t, n, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, 1, wh, wwD),
                               lambda m, b, t, n: (m, b, t, 0, 0),
                               memory_space=pltpu.VMEM)] + [tap] * 8,
        out_specs=pl.BlockSpec((1, 1, 1, sblk, D),
                               lambda m, b, t, n: (m, b, t, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, B, T, S, D), jnp.float32),
        interpret=interpret,
    )(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1)
    return out


def _sample_fwd(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1, interpret, D):
    out = _sample_fwd_impl(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1,
                           interpret, D)
    return out, (win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1)


def _sample_bwd(interpret, D, res, g):
    win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1 = res
    M, B, T, wh, wwD = win.shape
    S = ly0.shape[-2]
    D = g.shape[-1]
    sblk = _pick_sblk(S)
    N = S // sblk
    grid = (M, B, T, N)
    tap = pl.BlockSpec((1, 1, 1, sblk, 1),
                       lambda m, b, t, n: (m, b, t, n, 0),
                       memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((1, 1, 1, wh, wwD),
                            lambda m, b, t, n: (m, b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 1, 1, sblk, D),
                          lambda m, b, t, n: (m, b, t, n, 0),
                          memory_space=pltpu.VMEM)
    douts = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[win_spec] + [tap] * 8 + [g_spec],
        out_specs=[win_spec] + [tap] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((M, B, T, wh, wwD), jnp.float32),
            jax.ShapeDtypeStruct((M, B, T, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, B, T, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, B, T, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, B, T, S, 1), jnp.float32),
        ],
        interpret=interpret,
    )(win, ly0, ly1, wy0, wy1, lx0, lx1, wx0, wx1, g)
    dwin, dwy0, dwy1, dwx0, dwx1 = douts
    zi = jnp.zeros_like(ly0)
    return (dwin.astype(win.dtype), zi, zi, dwy0.astype(wy0.dtype),
            dwy1.astype(wy1.dtype), jnp.zeros_like(lx0),
            jnp.zeros_like(lx1), dwx0.astype(wx0.dtype),
            dwx1.astype(wx1.dtype))


_sample.defvjp(_sample_fwd, _sample_bwd)


def ms_deform_attn_window_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    tile: int = 16,
    radius: float = 8.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ms_deform_attn_window with the sampler in Pallas."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple(tuple(s) for s in spatial_shapes)
    if Q != S or (jax.default_backend() == "cpu" and not interpret):
        return _win.ms_deform_attn_window(
            value, spatial_shapes, sampling_locations, attention_weights,
            tile=tile, radius=radius)
    assert 128 % D == 0, "head dim must divide 128 for the lane layout"
    dt = value.dtype
    radius = float(radius)

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

        acc = None
        for lvi, (Hv, Wv) in enumerate(spatial_shapes):
            wh, sy = _win._axis_plan(Ty, thq, Hv, Hq, Hv, radius)
            ww, sx = _win._axis_plan(Tx, twq, Wv, Wq, Wv, radius)
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

            x = loc_q[..., lvi, :, 0] * Wv - 0.5          # [B,T,nq,M,P]
            y = loc_q[..., lvi, :, 1] * Hv - 0.5
            aw = attn_q[..., lvi, :].astype(jnp.float32)
            rx = jnp.asarray(refx)[None, :, :, None]
            ry = jnp.asarray(refy)[None, :, :, None]
            sx_b = jnp.asarray(starts[:, 1])[None, :, None, None]
            sy_b = jnp.asarray(starts[:, 0])[None, :, None, None]

            def headmajor(a):
                # [B,T,nq,M,P] -> [M,B,T,nq*P]
                return jnp.moveaxis(a, 3, 0).reshape(M, B, T, nq * P)

            xh = jnp.moveaxis(x, 3, 0)                    # [M,B,T,nq,P]
            yh = jnp.moveaxis(y, 3, 0)
            lx0, lx1, wx0, wx1 = _win._axis_taps(
                xh, rx[None], sx_b[None], ww, Wv, radius, jnp.float32)
            ly0, ly1, wy0, wy1 = _win._axis_taps(
                yh, ry[None], sy_b[None], wh, Hv, radius, jnp.float32)

            def flat(a):
                return a.reshape(M, B, T, nq * P, 1)

            sampled = _sample(win, flat(ly0), flat(ly1), flat(wy0),
                              flat(wy1), flat(lx0), flat(lx1), flat(wx0),
                              flat(wx1), interpret, D)    # [M,B,T,s,D] f32
            awh = headmajor(aw)
            contrib = (sampled * awh[..., None]).reshape(
                M, B, T, nq, P, D).sum(4)
            acc = contrib if acc is None else acc + contrib

        o = jnp.transpose(acc, (1, 2, 3, 0, 4))           # [B,T,nq,M,D]
        o = o.reshape(B, Ty, Tx, thq, twq, M * D)
        o = jnp.moveaxis(o, 2, 3).reshape(B, Sq, M * D)
        outs.append(o)

    return jnp.concatenate(outs, axis=1).astype(dt)


_base.register_impl("window_pallas", ms_deform_attn_window_pallas)
