"""Fused whole-sampler Pallas kernel for windowed MSDeformAttn (v3).

Reference behavior: ms_deform_im2col_cuda.cuh:242-305 via the window-mode
semantics of ops/msdeform_window.py (offsets clamped to ±radius target-level
px, zero padding at image borders, align_corners=False).

Why v3 after v1/v2 lost (docs/PALLAS_NOTES.md): the XLA window path's cost
is per-tile-step fixed work — window slab HBM round trips, stencil (Ay/Ax)
materialization, and the t1 intermediate — sequenced by lax.scan across
~252 tile steps x heads. Sweeps showed it is NOT loop-sequencing-bound
(unroll loses) but per-step-traffic-bound. This kernel keeps ALL of that
per-tile state in VMEM: one grid step = one query tile; the three value
levels' windows are DMA'd HBM->VMEM (double-buffered across the head loop),
stencils live and die in VMEM, and only the final [nq, M*D] tile output is
written back. Boundaries are whole natural tensors ([B,S,M,D] value in,
[B,S,M*D] out), so the pallas_call severs no fusable edges inside the op —
the failure mode that killed v1/v2 integration.

Forward-only (eval path). Training keeps the XLA einsum formulation whose
VJP is matmuls (ops/msdeform_window.py).

Two in-kernel x-stage variants (pick by microbench, `xstage=`):
  "gmat":  t1 [rows, ww*D] 2-D dot; x-weights expanded over D lanes
           (jnp.repeat) and the strided lane reduction done as one matmul
           against a constant block-identity G [ww*D, D] — zero relayouts
           if Mosaic lowers the repeat as an in-vreg broadcast.
  "sum3d": t1 [rows, ww, D] 3-D dot output; x-stage as a broadcast
           multiply + sublane reduction (D=32 lanes pad 4x; prefer small
           tiles).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psalm_tpu.ops import msdeform as _base
from psalm_tpu.ops.msdeform_window import (_axis_plan, _ref_grid, _tile_dim)


def _level_kernel(sy_ref, sx_ref, *refs, Hq, Wq, thq, twq, plans, shapes,
                  M, D, L, P, radius, xstage, dt):
    """One grid step = one query tile of query level (Hq, Wq)."""
    v_refs = refs[:L]
    loc_ref, attn_ref, refy_ref, refx_ref = refs[L:L + 4]
    out_ref = refs[L + 4]
    scr = refs[L + 5:L + 5 + L]
    sems = refs[L + 5 + L]

    i = pl.program_id(0)
    nq = thq * twq
    rows = nq * P

    def start_dma(h, lv, slot):
        wh, ww = plans[lv][0], plans[lv][2]
        return pltpu.make_async_copy(
            v_refs[lv].at[h, pl.ds(sy_ref[lv, i], wh),
                          pl.ds(sx_ref[lv, i], ww), :],
            scr[lv].at[slot],
            sems.at[lv, slot])

    for lv in range(L):
        start_dma(0, lv, 0).start()

    outs = []
    for h in range(M):
        acc = jnp.zeros((nq, D), jnp.float32)
        for lv in range(L):
            wh, _, ww, _ = plans[lv]
            Hv, Wv = shapes[lv]
            slot = h % 2
            start_dma(h, lv, slot).wait()
            if h + 1 < M:
                start_dma(h + 1, lv, (h + 1) % 2).start()
            slab = scr[lv][slot]                        # [wh, ww, D]

            x = loc_ref[0, :, h, lv, :, 0] * Wv - 0.5   # [nq, P] f32
            y = loc_ref[0, :, h, lv, :, 1] * Hv - 0.5
            aw = attn_ref[0, :, h, lv, :]               # [nq, P] f32
            ry = refy_ref[0, lv, :][:, None]            # [nq, 1]
            rx = refx_ref[0, lv, :][:, None]
            sy = sy_ref[lv, i]
            sx = sx_ref[lv, i]

            def taps(c, ref, st, w_sz, n_v):
                c = ref + jnp.clip(c - ref, -radius, radius)
                c0 = jnp.floor(c)
                fr = c - c0
                ci = c0.astype(jnp.int32)
                v0 = ((ci >= 0) & (ci < n_v)).astype(jnp.float32)
                v1 = ((ci + 1 >= 0) & (ci + 1 < n_v)).astype(jnp.float32)
                l0 = jnp.clip(ci - st, 0, w_sz - 1).reshape(rows, 1)
                l1 = jnp.clip(ci + 1 - st, 0, w_sz - 1).reshape(rows, 1)
                w0 = ((1.0 - fr) * v0).reshape(rows, 1)
                w1 = (fr * v1).reshape(rows, 1)
                return l0, l1, w0, w1

            ly0, ly1, wy0, wy1 = taps(y, ry, sy, wh, Hv)
            lx0, lx1, wx0, wx1 = taps(x, rx, sx, ww, Wv)
            awr = aw.reshape(rows, 1)

            ioy = jax.lax.broadcasted_iota(jnp.int32, (rows, wh), 1)
            Ay = (wy0 * (ioy == ly0) + wy1 * (ioy == ly1)).astype(dt)
            iox = jax.lax.broadcasted_iota(jnp.int32, (rows, ww), 1)
            Ax = (awr * (wx0 * (iox == lx0) + wx1 * (iox == lx1)))

            if xstage == "gmat":
                t1 = jax.lax.dot_general(
                    Ay, slab.reshape(wh, ww * D),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [rows, ww*D]
                axe = jnp.repeat(Ax, D, axis=1)           # [rows, ww*D]
                # block-identity G[k, d] = (k % D == d), built from iota so
                # it is traced (pallas kernels cannot capture constants)
                gr = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 0)
                gc = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 1)
                g = (gr % D == gc).astype(dt)
                s = jax.lax.dot_general(
                    (t1 * axe).astype(dt), g,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [rows, D]
            else:  # sum3d
                t1 = jax.lax.dot_general(
                    Ay, slab,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [rows, ww, D]
                s = jnp.sum(t1 * Ax[:, :, None], axis=1)  # [rows, D]

            acc = acc + jnp.sum(s.reshape(nq, P, D), axis=1)
        outs.append(acc)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(dt)


def _tilefy(a, B, Ty, thq, Tx, twq):
    sh = a.shape
    a = a.reshape((B, Ty, thq, Tx, twq) + sh[2:])
    a = jnp.moveaxis(a, 3, 2)
    return a.reshape((B, Ty * Tx, thq * twq) + sh[2:])


def ms_deform_attn_window_pallas3(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    tile: int = 8,
    radius: float = 8.0,
    xstage: str = "sum3d",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same signature/convention as ms_deform_attn_window (encoder Q == S)."""
    if interpret is None:  # Mosaic is TPU-only; interpret on CPU (tests).
        # The tunneled TPU backend reports platform "axon", so test for CPU
        # rather than for "tpu".
        interpret = jax.default_backend() == "cpu"
    if not interpret and jax.default_backend() == "axon" \
            and not os.environ.get("PSALM_PALLAS3_FORCE"):
        # The axon remote-compile helper crashes (no diagnostic) on
        # pltpu.make_async_copy from a pl.ANY operand — bisected in
        # scripts/debug_pallas3.py, recorded in docs/PALLAS_NOTES.md
        # (round-4 addendum 3). Degrade to the XLA window formulation with
        # the same clamp semantics instead of walking into the crash
        # (VERDICT r4 #8). Set PSALM_PALLAS3_FORCE=1 to attempt anyway.
        warnings.warn(
            "window_pallas3 is not compilable on the axon backend "
            "(remote-compile helper crash on HBM->VMEM DMA); falling back "
            "to the XLA window formulation. Set PSALM_PALLAS3_FORCE=1 to "
            "override.", RuntimeWarning, stacklevel=2)
        from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
        return ms_deform_attn_window(
            value, spatial_shapes, sampling_locations, attention_weights,
            tile=max(tile, 16), radius=float(radius))
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple(tuple(s) for s in spatial_shapes)
    if Q != S:
        return _base.ms_deform_attn_xla(value, spatial_shapes,
                                        sampling_locations, attention_weights)
    dt = value.dtype
    radius = float(radius)

    lvl_start = []
    s0 = 0
    for (H, W) in spatial_shapes:
        lvl_start.append(s0)
        s0 += H * W

    # head-major per-level value tensors [B, M, Hv, Wv, D]
    v_levels = []
    for lvi, (Hv, Wv) in enumerate(spatial_shapes):
        v0 = lvl_start[lvi]
        vl = value[:, v0:v0 + Hv * Wv].reshape(B, Hv, Wv, M, D)
        v_levels.append(jnp.moveaxis(vl, 3, 1))

    out_levels = []
    for lqi, (Hq, Wq) in enumerate(spatial_shapes):
        Sq = Hq * Wq
        q0 = lvl_start[lqi]
        thq = _tile_dim(Hq, tile)
        twq = _tile_dim(Wq, tile)
        Ty, Tx = Hq // thq, Wq // twq
        T, nq = Ty * Tx, thq * twq

        plans, sy_np, sx_np, refy_np, refx_np = [], [], [], [], []
        for (Hv, Wv) in spatial_shapes:
            wh, sy = _axis_plan(Ty, thq, Hv, Hq, Hv, radius)
            ww, sx = _axis_plan(Tx, twq, Wv, Wq, Wv, radius)
            plans.append((wh, None, ww, None))
            # per-tile starts in tilefy order (ty-major): tile i = ty*Tx+tx
            sy_np.append(np.repeat(np.asarray(sy, np.int32), Tx))
            sx_np.append(np.tile(np.asarray(sx, np.int32), Ty))
            ry, rx = _ref_grid(Hq, Wq, thq, twq, Hv, Wv)
            refy_np.append(ry)
            refx_np.append(rx)
        sy_arr = jnp.asarray(np.stack(sy_np))            # [L, T] int32
        sx_arr = jnp.asarray(np.stack(sx_np))
        # [T, L, nq] so the per-tile block (1, L, nq) keeps its last two
        # dims equal to the overall dims (Mosaic's (8,128) block rule).
        refy_arr = jnp.asarray(np.stack(refy_np, axis=1))
        refx_arr = jnp.asarray(np.stack(refx_np, axis=1))

        kern = functools.partial(
            _level_kernel, Hq=Hq, Wq=Wq, thq=thq, twq=twq,
            plans=tuple(plans), shapes=spatial_shapes, M=M, D=D, L=L, P=P,
            radius=radius, xstage=xstage, dt=dt)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=(
                [pl.BlockSpec(memory_space=pl.ANY) for _ in range(L)]
                + [pl.BlockSpec((1, nq, M, L, P, 2),
                                lambda i, *_: (i, 0, 0, 0, 0, 0)),
                   pl.BlockSpec((1, nq, M, L, P),
                                lambda i, *_: (i, 0, 0, 0, 0)),
                   pl.BlockSpec((1, L, nq), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec((1, L, nq), lambda i, *_: (i, 0, 0))]),
            out_specs=pl.BlockSpec((1, nq, M * D), lambda i, *_: (i, 0, 0)),
            scratch_shapes=(
                [pltpu.VMEM((2, plans[lv][0], plans[lv][2], D), dt)
                 for lv in range(L)]
                + [pltpu.SemaphoreType.DMA((L, 2))]),
        )

        outs_b = []
        for b in range(B):
            loc_t = _tilefy(sampling_locations[b:b + 1, q0:q0 + Sq]
                            .astype(jnp.float32), 1, Ty, thq, Tx, twq)[0]
            attn_t = _tilefy(attention_weights[b:b + 1, q0:q0 + Sq]
                             .astype(jnp.float32), 1, Ty, thq, Tx, twq)[0]
            out_t = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((T, nq, M * D), dt),
                interpret=interpret,
            )(sy_arr, sx_arr, *[v[b] for v in v_levels], loc_t, attn_t,
              refy_arr, refx_arr)
            # un-tilefy: [T, nq, C] -> [Sq, C]
            o = out_t.reshape(Ty, Tx, thq, twq, M * D)
            o = jnp.moveaxis(o, 1, 2).reshape(Sq, M * D)
            outs_b.append(o)
        out_levels.append(jnp.stack(outs_b))             # [B, Sq, M*D]

    return jnp.concatenate(out_levels, axis=1).astype(dt)
