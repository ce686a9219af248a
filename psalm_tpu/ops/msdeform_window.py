"""Locality-window multi-scale deformable attention — TPU-first formulation.

Replaces the reference CUDA kernel's per-sample gathers
(ms_deform_im2col_cuda.cuh:242-305) with MXU matmuls. XLA's TPU gather and
scatter are loop-bound (~300 ns / index — see ops/msdeform.py), which makes
the gather formulation the eval bottleneck and its scatter-add transpose the
training bottleneck. This module removes BOTH by never gathering per sample:

  1. Encoder structure: queries == the flattened multi-scale pixel set, and
     each query's reference point is its own pixel centre
     (models/pixel_decoder.py::_reference_points). So a 2-D *tile* of
     queries samples inside a statically-known window of each value level —
     tile box (in target-level pixels) dilated by a clamp radius R.
  2. Window extraction with static starts: one lax.dynamic_slice per tile
     (vmapped → a single gather whose loop count is the TILE count, ~84,
     not the SAMPLE count, ~2M).
  3. Bilinear sampling inside the window as *separable* matmuls: the 2x2
     bilinear stencil factorises into per-axis 2-tap weight matrices
     Ax [s, ww] and Ay [s, wh] (sums of two scaled one-hots — cheap VPU
     builds, and not a pattern XLA rewrites back into a gather). Then
         sampled[s] = Ay[s] @ window @ Ax[s]^T
     computed as T1 = Ax @ window^T (an MXU matmul) followed by a
     contraction with Ay. The VJP is matmuls too — no scatter anywhere.

Semantics: identical to ms_deform_attn_xla (the torch grid_sample oracle,
zeros padding, align_corners=False) EXCEPT that sampling offsets are clamped
to ±``radius`` pixels of the query's reference point, measured in the target
level's pixels (the native unit of the predictor's offsets,
models/pixel_decoder.py:93). Within the radius the result is exact —
including zero-padding at image borders, because corner validity is computed
from the *global* coordinates and every valid corner of an in-radius sample
provably lies inside the window:

    window start  s = clip(floor(box_min - R), 0, N - w)
    window width  w = ceil((t-1)·f + 2R + 3)        (f = level scale ratio)
    corner range  [floor(box_min - R), floor(box_max + R) + 1] ⊆ [s, s+w-1]

The deformable-DETR offset head is zero-init with bias magnitudes ≤ n_points
(models/pixel_decoder.py::_offset_bias_init), so radius=8 covers init and a
wide training margin; it is configurable per call and via the dispatcher.

Per-POINT radii (``radius`` as a length-P sequence): the init bias magnitude
is exactly (p+1) px for point p (ms_deform_attn.py:66-74 scales the unit
direction by point index), so radii (2, 4, 6, 8) give EVERY point the same
2x-init safety margin that flat r=8 gives only the largest point — while the
window width w = (t-1)·f + 2·r_p + 3 shrinks for the first three points.
Stage-1 matmul work is linear in Σ_p w_p² instead of P·w_max², a ~30% cut at
the 1024² encoder shapes. Points with equal radii share one window slab and
one matmul group (consecutive-run grouping), so a flat radius compiles to
exactly the old single-group program.

Decoder-style calls (Q != S) fall back to the oracle — PSALM only uses
MSDeformAttn in the encoder, where Q == S always holds.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.ops import msdeform as _base


def _tile_dim(n: int, tile: int) -> int:
    """Largest divisor of n that is <= tile."""
    for t in range(min(tile, n), 0, -1):
        if n % t == 0:
            return t
    return 1


@functools.lru_cache(maxsize=None)
def _axis_plan(n_tiles: int, tile_sz: int, scale_num: int, scale_den: int,
               n_v: int, radius: float):
    """Static 1-D window geometry: (width, starts[n_tiles])."""
    f = scale_num / scale_den
    span = (tile_sz - 1) * f
    w = min(n_v, int(math.ceil(span + 2 * radius + 3)))
    starts = []
    for ti in range(n_tiles):
        lo = (ti * tile_sz + 0.5) * f - 0.5 - radius
        starts.append(max(0, min(int(math.floor(lo)), n_v - w)))
    return w, tuple(starts)


@functools.lru_cache(maxsize=None)
def _ref_grid(Hq: int, Wq: int, thq: int, twq: int, Hv: int, Wv: int):
    """Static tile-major reference-point pixel coords in the target level.

    Returns (refy, refx), each [T, nq] float32.
    """
    ys = ((np.arange(Hq, dtype=np.float64) + 0.5) / Hq) * Hv - 0.5
    xs = ((np.arange(Wq, dtype=np.float64) + 0.5) / Wq) * Wv - 0.5
    gy = np.broadcast_to(ys[:, None], (Hq, Wq))
    gx = np.broadcast_to(xs[None, :], (Hq, Wq))

    def tilefy(g):
        Ty, Tx = Hq // thq, Wq // twq
        g = g.reshape(Ty, thq, Tx, twq).transpose(0, 2, 1, 3)
        return np.ascontiguousarray(g.reshape(Ty * Tx, thq * twq),
                                    dtype=np.float32)

    return tilefy(gy), tilefy(gx)


def _axis_taps(coord, ref, st, w_sz, n_v, radius, dt):
    """Per-axis 2-tap stencil: (l0, l1 [..] int32 in [0, w_sz-1], w0, w1,
    v0, v1, dcl) — the single source of the clamp/floor/validity semantics
    (the manual VJP consumes the same tuple, so forward and backward can
    never drift apart).

    coord/ref/st broadcast together (st = window starts). Offsets are
    clamped to ±radius around ref; corner validity uses global coords so
    border zero-padding matches the oracle exactly — invalid corners carry
    zero weight and every VALID corner provably lies in-window (module
    docstring), so the per-tap index clips never move a live tap. The two
    indices clip independently: at a clipped (image-edge) window a valid
    corner0 may legitimately sit at position w_sz-1 while corner1 is
    off-image with zero weight. dcl is the clamp-pass mask
    (|coord - ref| <= radius, jnp.clip's subgradient support): dA/dcoord
    flows through frac gated by dcl; dA/dref through (1 - dcl).
    """
    delta = coord - ref
    c = ref + jnp.clip(delta, -radius, radius)
    c0 = jnp.floor(c)
    frac = (c - c0).astype(dt)
    c0i = c0.astype(jnp.int32)
    v0 = ((c0i >= 0) & (c0i < n_v)).astype(dt)
    v1 = ((c0i + 1 >= 0) & (c0i + 1 < n_v)).astype(dt)
    l0 = jnp.clip(c0i - st, 0, w_sz - 1)
    l1 = jnp.clip(c0i + 1 - st, 0, w_sz - 1)
    dcl = ((delta >= -radius) & (delta <= radius)).astype(dt)
    return l0, l1, (1.0 - frac) * v0, frac * v1, v0, v1, dcl


def _axis_weights(coord, ref, st, w_sz, n_v, radius, fold, dt):
    """Per-axis 2-tap bilinear weight matrix A [..., w_sz] (XLA path)."""
    l0, l1, w0, w1, _, _, _ = _axis_taps(coord, ref, st, w_sz, n_v, radius,
                                         dt)
    if fold is not None:
        w0 = w0 * fold
        w1 = w1 * fold
    return (w0[..., None] * jax.nn.one_hot(l0, w_sz, dtype=dt)
            + w1[..., None] * jax.nn.one_hot(l1, w_sz, dtype=dt))


def _axis_stencil_parts(coord, ref, st, w_sz, n_v, radius, dt):
    """Manual-VJP view of _axis_taps: the unit weight matrix A, the one-hot
    tap matrices, and the dA/dcoord ingredients — all derived from the SAME
    _axis_taps call the forward uses (no duplicated semantics)."""
    l0, l1, w0, w1, v0, v1, dcl = _axis_taps(coord, ref, st, w_sz, n_v,
                                             radius, dt)
    oh0 = jax.nn.one_hot(l0, w_sz, dtype=dt)
    oh1 = jax.nn.one_hot(l1, w_sz, dtype=dt)
    A = w0[..., None] * oh0 + w1[..., None] * oh1
    return A, oh0, oh1, v0, v1, dcl


@functools.lru_cache(maxsize=None)
def _group_sample_cvjp(wh: int, ww: int, Hv: int, Wv: int, radius: float,
                       nq: int, P: int, dtname: str, su: int):
    """Manual-VJP point-group sampler (VERDICT r4 #2).

    Why: AD of the einsum-pair formulation materializes the t1 = Ay @ win
    intermediate ([s, ww*D] per tile, T tiles) and its cotangent in HBM —
    6 x 36.5 ms = 219 ms of the 351 ms training backward (TRAIN_BENCH_r04).
    This VJP saves ONLY the op inputs, rebuilds the 2-tap axis stencils
    (VPU-cheap) in the backward, and runs the three backward matmuls
    (t1 recompute, d_Ay, d_win) per tile inside one lax.scan so t1/d_t1 are
    VMEM-resident reused buffers — the same structure that makes the
    tile-scan FORWARD the fastest variant (BASELINE.md round-4 sweeps).
    Gradient math is exact (same piecewise-linear stencil derivative AD
    computes; tests/test_msdeform.py::test_msda_window_custom_vjp_*).

    Replaces the backward of the reference CUDA kernels
    (ms_deform_im2col_cuda.cuh:306-850) — there a per-sample atomic-add
    scatter; here matmuls against the same stencils.

    Returns f(win, xh, yh, awh, ry, rx, sy_b, sx_b) -> [hc, B, T, nq, D]
    (the point-group sum), where win [hc,B,T,wh,ww*D], xh/yh/awh
    [hc,B,T,nq,P], ry/rx [1,T,nq,1], sy_b/sx_b [1,T,1,1].
    """
    dt = jnp.dtype(dtname)

    def _fwd_compute(win, xh, yh, awh, ry, rx, sy_b, sx_b):
        hc, B, T = xh.shape[:3]
        D = win.shape[-1] // ww
        Ay = _axis_weights(yh, ry, sy_b, wh, Hv, radius, None, dt).reshape(
            hc, B, T, nq * P, wh)
        Ax = _axis_weights(xh, rx, sx_b, ww, Wv, radius, awh.astype(dt),
                           dt).reshape(hc, B, T, nq * P, ww)

        def tile_body(_, ops_t):
            ay, ax, wnl = ops_t
            t1 = jnp.einsum("cbsh,cbhk->cbsk", ay, wnl)
            t1 = t1.reshape(hc, B, nq * P, ww, D)
            return None, (t1 * ax[..., None]).sum(3)

        _, out = jax.lax.scan(
            tile_body, None,
            (jnp.moveaxis(Ay, 2, 0), jnp.moveaxis(Ax, 2, 0),
             jnp.moveaxis(win, 2, 0)), unroll=su)
        out = jnp.moveaxis(out, 0, 2)            # [hc,B,T,s,D]
        return out.reshape(hc, B, T, nq, P, D).sum(4)

    @jax.custom_vjp
    def f(win, xh, yh, awh, ry, rx, sy_b, sx_b):
        return _fwd_compute(win, xh, yh, awh, ry, rx, sy_b, sx_b)

    def f_fwd(win, xh, yh, awh, ry, rx, sy_b, sx_b):
        return (_fwd_compute(win, xh, yh, awh, ry, rx, sy_b, sx_b),
                (win, xh, yh, awh, ry, rx, sy_b, sx_b))

    def f_bwd(res, g):
        win, xh, yh, awh, ry, rx, sy_b, sx_b = res
        hc, B, T = xh.shape[:3]
        D = win.shape[-1] // ww
        Ayu, oh0y, oh1y, v0y, v1y, dcly = _axis_stencil_parts(
            yh, ry, sy_b, wh, Hv, radius, dt)
        Axu, oh0x, oh1x, v0x, v1x, dclx = _axis_stencil_parts(
            xh, rx, sx_b, ww, Wv, radius, dt)
        aw = awh.astype(dt)
        Ay = Ayu.reshape(hc, B, T, nq * P, wh)
        Ax = (Axu * aw[..., None]).reshape(hc, B, T, nq * P, ww)
        # the P-sum's cotangent broadcast: every point sees the query's g
        gs = jnp.broadcast_to(
            g[:, :, :, :, None, :].astype(dt),
            (hc, B, T, nq, P, D)).reshape(hc, B, T, nq * P, D)

        def tile_body(_, ops_t):
            ay, ax, wnl, gt = ops_t
            # t1 recompute (cheap relative to an HBM round trip of the
            # saved tensor) + the three backward contractions, all on
            # VMEM-resident per-tile buffers
            t1 = jnp.einsum("cbsh,cbhk->cbsk", ay, wnl)
            t1 = t1.reshape(hc, B, nq * P, ww, D)
            dax = jnp.einsum("cbswd,cbsd->cbsw", t1, gt)
            dt1 = (ax[..., None] * gt[:, :, :, None, :]).reshape(
                hc, B, nq * P, ww * D)
            day = jnp.einsum("cbsk,cbhk->cbsh", dt1, wnl)
            dwn = jnp.einsum("cbsh,cbsk->cbhk", ay, dt1)
            return None, (dwn, dax, day)

        _, (d_win, dAx, dAy) = jax.lax.scan(
            tile_body, None,
            (jnp.moveaxis(Ay, 2, 0), jnp.moveaxis(Ax, 2, 0),
             jnp.moveaxis(win, 2, 0), jnp.moveaxis(gs, 2, 0)), unroll=su)
        d_win = jnp.moveaxis(d_win, 0, 2)
        dAx = jnp.moveaxis(dAx, 0, 2).reshape(hc, B, T, nq, P, ww)
        dAy = jnp.moveaxis(dAy, 0, 2).reshape(hc, B, T, nq, P, wh)
        # attention weights: out is linear in aw through Ax = aw * Axu
        d_aw = jnp.sum(Axu * dAx, -1)
        # coordinates: 2-tap stencil derivative (one-hot dots, no gathers).
        # d/dcoord flows through the clamp (gate dcl); d/dref through its
        # complement (c = ref + clip(coord - ref): dc/dref = 1 - dcl).
        dAx0 = jnp.sum(oh0x * dAx, -1)
        dAx1 = jnp.sum(oh1x * dAx, -1)
        s_x = v1x * dAx1 - v0x * dAx0
        d_x = aw * dclx * s_x
        dAy0 = jnp.sum(oh0y * dAy, -1)
        dAy1 = jnp.sum(oh1y * dAy, -1)
        s_y = v1y * dAy1 - v0y * dAy0
        d_y = dcly * s_y
        # true ref cotangents (reduce the broadcast dims back to ry/rx's
        # [1, T, nq, 1]) — ry/rx are static grids today, but a zero here
        # would silently diverge from the AD path if they ever became
        # traced (code-review r5)
        d_ry = (((1.0 - dcly) * s_y).sum((0, 1, 4))[None, :, :, None]
                .astype(ry.dtype))
        d_rx = ((aw * (1.0 - dclx) * s_x).sum((0, 1, 4))[None, :, :, None]
                .astype(rx.dtype))
        # window starts enter only through integer tap indices (piecewise
        # constant): their derivative is genuinely zero
        return (d_win.astype(win.dtype), d_x.astype(xh.dtype),
                d_y.astype(yh.dtype), d_aw.astype(awh.dtype),
                d_ry, d_rx, jnp.zeros_like(sy_b), jnp.zeros_like(sx_b))

    f.defvjp(f_fwd, f_bwd)
    return f


def ms_deform_attn_window(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    tile: int = 16,
    radius=8.0,
    head_chunk: int = 1,
    scan_tiles: bool = True,
    scan_unroll: int = 1,
    fold_points: bool = False,
    custom_vjp: bool = False,
) -> jnp.ndarray:
    """Windowed MSDeformAttn. Same signature/convention as ms_deform_attn_xla
    (value [B,S,M,D], locations [B,Q,M,L,P,2] in [0,1], weights [B,Q,M,L,P]);
    requires the encoder case Q == S (falls back to the oracle otherwise).

    radius: a float (one clamp radius for all P sampling points) or a
    length-P sequence of per-point radii (module docstring) — consecutive
    points with equal radii share a window slab and matmul group, so a flat
    radius compiles to the original single-group program.

    scan_tiles: True (eval-optimal) scans window tiles so the t1 = Ay @ win
    intermediate is a small reused buffer (faster forward, 9.75 vs 11.2 ms
    per op on v5e); False (train-optimal) computes the tile batch with one
    einsum pair whose backward parallelizes better (train step 1.94 s vs
    2.16 s with the sequential scan VJP).

    custom_vjp: route each point-group through the manual-VJP tile-scan core
    (_group_sample_cvjp): the fast scan forward AND a hand-written backward
    whose big intermediates stay per-tile (never materialized across tiles
    in HBM) — targets the 6 x 36.5 ms einsum-VJP cost that dominates the
    training backward (VERDICT r4 #2). Ignores scan_tiles (the core is
    scan-formulated both ways); incompatible with fold_points.

    fold_points: the 2-D sampling-matrix formulation. The separable 2-stage
    form must keep the P sampling points distinct through the big y-stage
    matmul (a sum of separable products is not separable), so the MXU does
    nq*P rows of work at contraction depth K = wh (~34 — under a third of
    the 128-deep systolic array). Folding instead builds, per query, ONE
    rank-P 2-D stencil over the flattened window
        A2[q, y*ww+x] = sum_p attn[q,p] * Ay[q,p,y] * Ax[q,p,x]
    (a cheap batched outer product of the same 2-tap axis stencils) and
    samples with a single matmul A2 [nq, wh*ww] @ win [wh*ww, D]: P times
    fewer matmul rows and K = wh*ww (~1156, fully covering the MXU). Same
    clamp/border semantics; summation order over P moves before the spatial
    contraction (bit-identical in f32, reorder-level difference in bf16).
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple(tuple(s) for s in spatial_shapes)
    if Q != S:
        return _base.ms_deform_attn_xla(value, spatial_shapes,
                                        sampling_locations, attention_weights)
    dt = value.dtype
    if custom_vjp and fold_points:
        # the manual VJP is derived for the separable 2-stage form; a
        # silent fall-through to the AD fold path would keep parity while
        # losing the measured backward win (code-review r5)
        raise ValueError("custom_vjp=True is incompatible with "
                         "fold_points=True — the manual VJP covers the "
                         "separable (unfolded) formulation only")
    if isinstance(radius, (tuple, list, np.ndarray)):
        radii = tuple(float(r) for r in radius)
        if len(radii) != P:
            raise ValueError(f"per-point radii: got {len(radii)}, P={P}")
    else:
        radii = (float(radius),) * P
    # consecutive-run grouping: (p_start, p_end, radius)
    pgroups = []
    g0 = 0
    for p in range(1, P + 1):
        if p == P or radii[p] != radii[g0]:
            pgroups.append((g0, p, radii[g0]))
            g0 = p

    lvl_start = []
    s0 = 0
    for (H, W) in spatial_shapes:
        lvl_start.append(s0)
        s0 += H * W

    outs = []
    for lqi, (Hq, Wq) in enumerate(spatial_shapes):
        Sq = Hq * Wq
        q0 = lvl_start[lqi]
        thq = _tile_dim(Hq, tile)
        twq = _tile_dim(Wq, tile)
        Ty, Tx = Hq // thq, Wq // twq
        T, nq = Ty * Tx, thq * twq

        def tilefy(a):
            sh = a.shape
            a = a.reshape((B, Ty, thq, Tx, twq) + sh[2:])
            a = jnp.moveaxis(a, 3, 2)
            return a.reshape((B, T, nq) + sh[2:])

        loc_q = tilefy(sampling_locations[:, q0:q0 + Sq])   # [B,T,nq,M,L,P,2]
        attn_q = tilefy(attention_weights[:, q0:q0 + Sq])   # [B,T,nq,M,L,P]

        acc = None
        for lvi, (Hv, Wv) in enumerate(spatial_shapes):
            refy, refx = _ref_grid(Hq, Wq, thq, twq, Hv, Wv)

            v0 = lvl_start[lvi]
            # head-major value (small transpose: the value level, not the
            # windows) so window extraction needs no big relayout
            vlv = value[:, v0:v0 + Hv * Wv].reshape(B, Hv, Wv, M, D)
            vh = jnp.moveaxis(vlv, 3, 0)                      # [M,B,Hv,Wv,D]
            rx = jnp.asarray(refx)[None, :, :, None]          # [1,T,nq,1]
            ry = jnp.asarray(refy)[None, :, :, None]

            # per-head coords (small transposes) — Ax/Ay are built inside the
            # head-mapped body so only one head's weight matrices are live
            x_all = loc_q[..., lvi, :, 0] * Wv - 0.5          # [B,T,nq,M,P]
            y_all = loc_q[..., lvi, :, 1] * Hv - 0.5
            aw_all = attn_q[..., lvi, :].astype(dt)

            hc = max(1, min(head_chunk, M))
            while M % hc:
                hc -= 1

            contribs = []
            for (p0, p1, rad) in pgroups:
                contribs.append(_level_group(
                    vh, x_all[..., p0:p1], y_all[..., p0:p1],
                    aw_all[..., p0:p1], rx, ry,
                    Ty, thq, Tx, twq, Hq, Wq, Hv, Wv, rad, hc,
                    scan_tiles, scan_unroll, fold_points, dt,
                    custom_vjp=custom_vjp))
            contrib = contribs[0]
            for c in contribs[1:]:
                contrib = contrib + c
            acc = contrib if acc is None else acc + contrib

        o = jnp.transpose(acc, (1, 2, 3, 0, 4))              # [B,T,nq,M,D]
        o = o.reshape(B, Ty, Tx, thq, twq, M * D)
        o = jnp.moveaxis(o, 2, 3).reshape(B, Sq, M * D)
        outs.append(o)

    return jnp.concatenate(outs, axis=1).astype(dt)


def _level_group(vh, x, y, aw, rx, ry, Ty, thq, Tx, twq, Hq, Wq, Hv, Wv,
                 radius, hc, scan_tiles, scan_unroll, fold_points, dt,
                 custom_vjp=False):
    """One (query-level, value-level, point-group) contribution [M,B,T,nq,D].

    vh: head-major value level [M,B,Hv,Wv,D]; x/y: target-level pixel coords
    [B,T,nq,M,Pg]; aw: attention weights, same shape; rx/ry: static reference
    coords [1,T,nq,1]. The window slab, axis plans, and clamp all use this
    group's ``radius``.
    """
    M, B_, Hv_, Wv_, D = vh.shape
    B = x.shape[0]
    T, nq = Ty * Tx, thq * twq
    P = x.shape[-1]

    wh, sy = _axis_plan(Ty, thq, Hv, Hq, Hv, radius)
    ww, sx = _axis_plan(Tx, twq, Wv, Wq, Wv, radius)
    starts = np.stack(np.meshgrid(np.asarray(sy, np.int32),
                                  np.asarray(sx, np.int32),
                                  indexing="ij"), -1).reshape(-1, 2)
    st = jnp.asarray(starts)
    win = jax.vmap(jax.vmap(lambda vb: jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            vb, (s[0], s[1], 0), (wh, ww, D)))(st)))(vh)
    win = win.reshape(M, B_, T, wh, ww * D)

    xh = jnp.moveaxis(x, 3, 0)                        # [M,B,T,nq,P]
    yh = jnp.moveaxis(y, 3, 0)
    awh = jnp.moveaxis(aw, 3, 0)
    sx_b = jnp.asarray(starts[:, 1])[None, :, None, None]
    sy_b = jnp.asarray(starts[:, 0])[None, :, None, None]

    # largest unroll factor <= scan_unroll that divides the tile
    # count (T differs per level: 64/16/4 at 1024^2 tile16)
    su = max(1, min(int(scan_unroll), T))
    while T % su:
        su -= 1

    if custom_vjp and not fold_points:
        f = _group_sample_cvjp(wh, ww, Hv, Wv, float(radius), nq, P,
                               jnp.dtype(dt).name, su)

        def chunked_cv(a):
            return a.reshape((M // hc, hc) + a.shape[1:])

        outh = jax.lax.map(
            lambda ops: f(ops[3], ops[0], ops[1], ops[2], ry, rx,
                          sy_b, sx_b),
            (chunked_cv(xh), chunked_cv(yh), chunked_cv(awh),
             chunked_cv(win)))
        return outh.reshape((M,) + outh.shape[2:])  # [M,B,T,nq,D], P summed

    def head_body(ops, wh=wh, ww=ww, nq=nq, Hv=Hv, Wv=Wv, hc=hc):
        xh_, yh_, awh_, wn = ops  # leading dim hc
        if fold_points:
            # [hc,B,T,nq,P,wh/ww]; attention folded into Ax
            Ay = _axis_weights(yh_, ry, sy_b, wh, Hv, radius,
                               None, dt)
            Ax = _axis_weights(xh_, rx, sx_b, ww, Wv, radius,
                               awh_.astype(dt), dt)
            wn2 = wn.reshape(hc, B, T, wh * ww, D)

            if not scan_tiles:
                a2 = jnp.einsum("cbtqpy,cbtqpx->cbtqyx", Ay, Ax)
                a2 = a2.reshape(hc, B, T, nq, wh * ww)
                return jnp.einsum("cbtqk,cbtkd->cbtqd", a2, wn2)

            def tile_body2(_, ops_t):
                ay, ax, wnl = ops_t  # [hc,B,nq,P,wh/ww], [hc,B,whww,D]
                a2 = jnp.einsum("cbqpy,cbqpx->cbqyx", ay, ax)
                a2 = a2.reshape(hc, B, nq, wh * ww)
                return None, jnp.einsum("cbqk,cbkd->cbqd", a2, wnl)

            _, out = jax.lax.scan(
                tile_body2, None,
                (jnp.moveaxis(Ay, 2, 0), jnp.moveaxis(Ax, 2, 0),
                 jnp.moveaxis(wn2, 2, 0)), unroll=su)
            return jnp.moveaxis(out, 0, 2)  # [hc,B,T,nq,D]

        Ay = _axis_weights(yh_, ry, sy_b, wh, Hv, radius,
                           None, dt).reshape(hc, B, T, nq * P, wh)
        Ax = _axis_weights(xh_, rx, sx_b, ww, Wv, radius,
                           awh_.astype(dt), dt).reshape(
            hc, B, T, nq * P, ww)

        if not scan_tiles:
            # einsum pair: better-parallelizing backward (training)
            t1 = jnp.einsum("cbtsh,cbthk->cbtsk", Ay, wn)
            t1 = t1.reshape(hc, B, T, nq * P, ww, D)
            return jnp.einsum("cbtsw,cbtswd->cbtsd", Ax, t1)

        # scan tiles: the t1 = Ay @ win intermediate per step is a
        # ~2 MB buffer XLA reuses across iterations instead of one
        # T-times-larger HBM round trip (25% faster measured on
        # v5e); the x-contraction as mult+sum fuses into the small
        # per-tile consumer
        def tile_body(_, ops_t):
            ay, ax, wnl = ops_t  # [hc,B,s,wh], [hc,B,s,ww], [hc,B,wh,wwD]
            t1 = jnp.einsum("cbsh,cbhk->cbsk", ay, wnl)
            t1 = t1.reshape(hc, B, nq * P, ww, D)
            return None, (t1 * ax[..., None]).sum(3)

        # unroll: the scan is overhead-bound (~5 us/step at these
        # shapes); unrolling amortizes loop sequencing and lets XLA
        # software-pipeline the per-step slice DMAs
        _, out = jax.lax.scan(
            tile_body, None,
            (jnp.moveaxis(Ay, 2, 0), jnp.moveaxis(Ax, 2, 0),
             jnp.moveaxis(wn, 2, 0)), unroll=su)
        return jnp.moveaxis(out, 0, 2)  # [hc, B, T, s, D]

    def chunked(a):
        return a.reshape((M // hc, hc) + a.shape[1:])

    outh = jax.lax.map(jax.checkpoint(head_body),
                       (chunked(xh), chunked(yh), chunked(awh),
                        chunked(win)))
    outh = outh.reshape((M,) + outh.shape[2:])
    if fold_points:                   # P summed inside the 2-D stencil
        return outh                   # [M,B,T,nq,D]
    return outh.reshape(M, B, T, nq, P, D).sum(4)


_base.register_impl("window", ms_deform_attn_window)
