"""Pallas int4 matvec for the serving decode step.

Why this kernel exists (BASELINE.md "Serving decode"): the decode step is
HBM-bound on weight reads. int8 decode wins because XLA fuses the
int8->bf16 convert into the dot's operand load; the int4 nibble unpack
(shift pair) does NOT fuse, so the XLA int4 paths pay an extra
materialization pass and int4 only buys capacity, not bandwidth. Here the
unpack runs in VMEM on the VPU right after the packed block lands, so HBM
traffic is the true int4 byte count: K*N/2 weight bytes + K*N/16 scale
bytes per matvec — a 1.78x traffic cut vs int8 and 3.6x vs bf16.

Storage layout is exactly models/quant.py::quantize_kernel_int4's
half-split packing (the deployed Quant4Dense format, so switching the
decode path to this kernel needs no re-quantization):

  packed int8 [K/2, N]: byte row i holds original input row i in the LOW
  nibble and row K/2 + i in the HIGH nibble; group scales f32 [G, N] with
  G = K/group along the input axis (groups never straddle the half split).

Kernel shape: grid (N/TO, K-chunks); each program unpacks a
[KCH, TO] packed block with the (w<<4)>>4 / w>>4 sign-extension pair,
applies the per-group scales broadcast to rows (weights materialize only
in VMEM, never in HBM), and accumulates x_lo @ W_lo + x_hi @ W_hi into the
[B, TO] f32 output block across the K-chunk grid axis.

Reference behavior spec: bitsandbytes load_in_4bit as configured by the
reference builder (/root/reference/psalm/model/builder.py:31-40).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, p_ref, s_ref, o_ref, *, half, kch, group):
    c = pl.program_id(1)
    gch = kch // group  # scale rows per chunk-half

    # f32 compute throughout: the matvec is HBM-bound (its FLOPs are ~1000x
    # below the bandwidth cost), so the extra MXU passes of an f32 dot are
    # free and the weight-scale product stays exact.
    p = p_ref[...]  # [kch, TO] int8 (two nibbles per byte)
    low = jnp.right_shift(jnp.left_shift(p, 4), 4).astype(jnp.float32)
    high = jnp.right_shift(p, 4).astype(jnp.float32)

    to = p.shape[-1]
    sl = s_ref[pl.ds(c * gch, gch), :]  # [gch, TO] f32
    sh = s_ref[pl.ds(half // group + c * gch, gch), :]
    # per-row scale expansion, VMEM-only: [gch, TO] -> [kch, TO]
    sl = jnp.broadcast_to(sl[:, None, :], (gch, group, to)).reshape(kch, to)
    sh = jnp.broadcast_to(sh[:, None, :], (gch, group, to)).reshape(kch, to)

    xl = x_ref[:, pl.ds(c * kch, kch)].astype(jnp.float32)
    xh = x_ref[:, pl.ds(half + c * kch, kch)].astype(jnp.float32)
    acc = (jnp.dot(xl, low * sl, preferred_element_type=jnp.float32)
           + jnp.dot(xh, high * sh, preferred_element_type=jnp.float32))

    @pl.when(c == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(c > 0)
    def _accum():
        o_ref[...] += acc


def int4_matvec_supported(rows: int, K: int, N: int, group: int) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA einsum path
    (Quant4Dense's formulation) otherwise."""
    if K % 2:
        return False
    half = K // 2
    if group <= 0 or half % group or N % 128:
        return False
    kch = half if half <= 2048 else 2048
    return half % kch == 0 and kch % group == 0 and rows <= 16


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def int4_matvec(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                group: int, interpret: bool = False) -> jnp.ndarray:
    """x [B, K] float; packed int8 [K/2, N] half-split; scale f32 [K/group, N].

    Returns x @ dequant(packed, scale) as f32 [B, N]."""
    B, K = x.shape
    half, N = packed.shape
    assert half * 2 == K and scale.shape == (K // group, N), (
        x.shape, packed.shape, scale.shape, group)
    kch = half if half <= 2048 else 2048
    n_chunks = half // kch
    to = next(t for t in (256, 128) if N % t == 0)
    kernel = functools.partial(_kernel, half=half, kch=kch, group=group)
    return pl.pallas_call(
        kernel,
        grid=(N // to, n_chunks),
        in_specs=[
            pl.BlockSpec((B, K), lambda n, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kch, to), lambda n, c: (c, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, to), lambda n, c: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, to), lambda n, c: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x, packed, scale)


def int4_matvec_xla(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                    group: int) -> jnp.ndarray:
    """XLA fallback for shapes the kernel gates out, matching its f32
    numerics (Quant4Dense's per-group-partial formulation, f32 compute —
    the decode matvec is HBM-bound, so f32 math costs nothing)."""
    B, K = x.shape
    half, N = packed.shape
    G = K // group
    low = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    high = jnp.right_shift(packed, 4)
    xg = x.astype(jnp.float32).reshape(B, 2, G // 2, group)
    kl = low.reshape(G // 2, group, N).astype(jnp.float32)
    kh = high.reshape(G // 2, group, N).astype(jnp.float32)
    p_lo = jnp.einsum("bgd,gdo->bgo", xg[:, 0], kl,
                      preferred_element_type=jnp.float32)
    p_hi = jnp.einsum("bgd,gdo->bgo", xg[:, 1], kh,
                      preferred_element_type=jnp.float32)
    part = jnp.concatenate([p_lo, p_hi], axis=1)
    return jnp.einsum("bgo,go->bo", part, scale.astype(part.dtype))
