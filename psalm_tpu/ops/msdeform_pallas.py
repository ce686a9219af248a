"""Pallas TPU kernel for multi-scale deformable attention (encoder case).

The TPU-native replacement for the reference's only CUDA kernel
(ms_deform_im2col_cuda.cuh:242-305). Exploits the encoder's structure —
queries == the flattened multi-scale key set (Q == S) — so every
(level, point, corner) term is one hardware ``dynamic_gather``
(take_along_axis with idx shape == table shape, the only gather Mosaic
lowers natively) over the per-head value table resident in VMEM.

Grid: (B, M/G, L*P) with G heads packed into the 128-lane dimension.
The value block and output accumulator stay pinned in VMEM across the L*P
innermost grid steps (their index maps are constant in t), so HBM traffic is
one read of value + one write of output per head-group, plus the small
loc/attn streams.

Backward: custom VJP that re-runs the XLA oracle's VJP (matching
ms_deform_attn_core_pytorch gradients exactly); the forward kernel is the
hot path (6 encoder layers per image at eval).
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


def _kernel(consts_ref, value_ref, loc_ref, attn_ref, out_ref):
    """One (batch, head-group, term) cell.

    consts_ref: SMEM [LP, 3] int32 (H, W, level_start) per term
    value_ref:  VMEM [S, GD] head-group value table (global rows)
    loc_ref:    VMEM [S, G, 2] pixel coords (x, y) for this term
    attn_ref:   VMEM [S, G] attention weights for this term
    out_ref:    VMEM [S, GD] accumulator (f32)
    """
    t = pl.program_id(2)
    H = consts_ref[t, 0]
    W = consts_ref[t, 1]
    start = consts_ref[t, 2]

    S, GD = value_ref.shape[-2:]
    G = loc_ref.shape[-2]
    D = GD // G

    x = loc_ref[0, 0, 0, :, :, 0]  # [S, G]
    y = loc_ref[0, 0, 0, :, :, 1]
    aw = attn_ref[0, 0, 0]         # [S, G]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    value = value_ref[0, 0]
    acc = jnp.zeros((S, GD), jnp.float32)
    Hf = H
    Wf = W
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < Hf) & (xi >= 0) & (xi < Wf)
        idx = (jnp.clip(yi, 0, Hf - 1) * Wf + jnp.clip(xi, 0, Wf - 1)
               + start)  # [S, G]
        wy = jnp.where(dy == 1, fy, 1.0 - fy)
        wx = jnp.where(dx == 1, fx, 1.0 - fx)
        w = wy * wx * valid.astype(jnp.float32) * aw  # [S, G]
        # broadcast per-head index/weight across the head's D lanes
        idx_l = jnp.broadcast_to(idx[:, :, None], (S, G, D)).reshape(S, GD)
        w_l = jnp.broadcast_to(w[:, :, None], (S, G, D)).reshape(S, GD)
        g = jnp.take_along_axis(value, idx_l, axis=0)
        acc = acc + g.astype(jnp.float32) * w_l

    @pl.when(t == 0)
    def _():
        out_ref[0, 0] = acc

    @pl.when(t != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + acc


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "heads_per_group",
                                    "interpret"))
def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             heads_per_group: int = 1, interpret: bool = False):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert Q == S, "pallas msdeform kernel requires the encoder case Q == S"
    G = heads_per_group
    assert M % G == 0
    MG = M // G
    LP = L * P

    # value: [B, S, M, D] -> [B, MG, S, G*D]
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(B, MG, G, S, D)
    v = jnp.transpose(v, (0, 1, 3, 2, 4)).reshape(B, MG, S, G * D)

    # pixel coords per term: [B, MG, LP, S, G, 2]
    loc = jnp.transpose(sampling_locations, (0, 2, 3, 4, 1, 5))  # [B,M,L,P,Q,2]
    loc = loc.reshape(B, MG, G, LP, S, 2)
    loc = jnp.transpose(loc, (0, 1, 3, 4, 2, 5))  # [B, MG, LP, S, G, 2]
    wh = np.array([[w, h] for (h, w) in spatial_shapes], np.float32)
    wh = np.repeat(wh, P, axis=0)  # [LP, 2]
    loc = loc * jnp.asarray(wh)[None, None, :, None, None, :] - 0.5

    attn = jnp.transpose(attention_weights, (0, 2, 3, 4, 1))  # [B,M,L,P,Q]
    attn = attn.reshape(B, MG, G, LP, S)
    attn = jnp.transpose(attn, (0, 1, 3, 4, 2))  # [B, MG, LP, S, G]

    consts = []
    start = 0
    for (H, W) in spatial_shapes:
        for _ in range(P):
            consts.append((H, W, start))
        start += H * W
    consts = jnp.asarray(np.array(consts, np.int32))

    out = pl.pallas_call(
        _kernel,
        grid=(B, MG, LP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # consts, whole array
            pl.BlockSpec((1, 1, S, G * D), lambda b, m, t: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S, G, 2), lambda b, m, t: (b, m, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S, G), lambda b, m, t: (b, m, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S, G * D), lambda b, m, t: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, MG, S, G * D), jnp.float32),
        interpret=interpret,
    )(consts, v, loc.astype(jnp.float32), attn.astype(jnp.float32))

    # [B, MG, S, G, D] -> [B, S, M*D]
    out = out.reshape(B, MG, S, G, D)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, S, M * D)
    return out.astype(value.dtype)


@jax.custom_vjp
def _msda(value, sampling_locations, attention_weights, spatial_shapes,
          heads_per_group):
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights, heads_per_group)


def _msda_fwd(value, sampling_locations, attention_weights, spatial_shapes,
              heads_per_group):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights, heads_per_group)
    return out, (value, sampling_locations, attention_weights, spatial_shapes)


def _msda_bwd(res, g):
    value, loc, attn, spatial_shapes = res
    _, vjp = jax.vjp(
        lambda v, l, a: _base.ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, attn)
    dv, dl, da = vjp(g)
    return dv, dl, da, None, None


_msda.defvjp(_msda_fwd, _msda_bwd)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, heads_per_group: int = 1):
    """Public entry; falls back to the XLA oracle off-TPU or when Q != S."""
    S = value.shape[1]
    Q = sampling_locations.shape[1]
    if Q != S or jax.default_backend() == "cpu":
        return _base.ms_deform_attn_xla(value, tuple(spatial_shapes),
                                        sampling_locations, attention_weights)
    return _msda(value, sampling_locations, attention_weights,
                 tuple(tuple(s) for s in spatial_shapes), heads_per_group)


_base.register_impl("pallas", ms_deform_attn_pallas)
