"""Bisect which construct in the v3 pallas kernel crashes the Mosaic
remote-compile helper (exit 1, no error text). Progressive stages:

  s0  scaffolding only (scalar prefetch grid, blocked in/out, write zeros)
  s1  + manual HBM->VMEM DMA of one window slab (pl.ANY operand, pl.ds)
  s2  + double-buffered DMA across the head loop
  s3  + stencil build (iota one-hots) + 2-D dot (gmat path, no repeat)
  s4  + jnp.repeat lane expansion + block-identity G matmul (full gmat)
  s5  + 3-D dot + sublane reduction (sum3d x-stage)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_pallas3.py
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, nq, M, D = 16, 64, 8, 32
wh, ww = 24, 24
Hv = Wv = 32


def kern(stage, sy_ref, v_ref, loc_ref, out_ref, scr, sems):
    i = pl.program_id(0)
    rows = nq * 4
    if stage == 0:
        out_ref[0] = jnp.zeros((nq, M * D), jnp.bfloat16)
        return

    def start_dma(h, slot):
        return pltpu.make_async_copy(
            v_ref.at[h, pl.ds(sy_ref[i], wh), pl.ds(sy_ref[i], ww), :],
            scr.at[slot], sems.at[slot])

    if stage == 1:
        start_dma(0, 0).start()
        start_dma(0, 0).wait()
        out_ref[0] = jnp.tile(
            jnp.sum(scr[0], axis=(0, 1)).astype(jnp.bfloat16)[None, :],
            (nq, M))
        return

    start_dma(0, 0).start()
    outs = []
    for h in range(M):
        slot = h % 2
        start_dma(h, slot).wait()
        if h + 1 < M:
            start_dma(h + 1, (h + 1) % 2).start()
        slab = scr[slot]
        if stage == 2:
            outs.append(jnp.tile(jnp.sum(slab, axis=(0, 1))[None, :],
                                 (nq, 1)).astype(jnp.float32))
            continue
        y = loc_ref[0, :, h, 0, :, 0] * Hv - 0.5          # [nq, P]
        ci = jnp.floor(y).astype(jnp.int32)
        l0 = jnp.clip(ci - sy_ref[i], 0, wh - 1).reshape(rows, 1)
        w0 = (y - jnp.floor(y)).reshape(rows, 1)
        ioy = jax.lax.broadcasted_iota(jnp.int32, (rows, wh), 1)
        Ay = (w0 * (ioy == l0)).astype(jnp.bfloat16)
        iox = jax.lax.broadcasted_iota(jnp.int32, (rows, ww), 1)
        Ax = w0 * (iox == l0)
        if stage == 3:
            t1 = jax.lax.dot_general(
                Ay, slab.reshape(wh, ww * D), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [rows, ww*D]
            s = t1[:, :D]
        elif stage == 4:
            t1 = jax.lax.dot_general(
                Ay, slab.reshape(wh, ww * D), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            axe = jnp.repeat(Ax, D, axis=1)
            gr = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 0)
            gc = jax.lax.broadcasted_iota(jnp.int32, (ww * D, D), 1)
            g = (gr % D == gc).astype(jnp.bfloat16)
            s = jax.lax.dot_general((t1 * axe).astype(jnp.bfloat16), g,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:  # stage 5: 3-D dot + sublane reduce
            t1 = jax.lax.dot_general(
                Ay, slab, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [rows, ww, D]
            s = jnp.sum(t1 * Ax[:, :, None], axis=1)
        outs.append(jnp.sum(s.reshape(nq, 4, D), axis=1))
    out_ref[0] = jnp.concatenate(outs, -1).astype(jnp.bfloat16)


rng = np.random.RandomState(0)
v = jnp.asarray(rng.randn(M, Hv, Wv, D), jnp.bfloat16)
loc = jnp.asarray(rng.rand(T, nq, M, 1, 4, 2), jnp.float32)
sy = jnp.zeros((T,), jnp.int32)

for stage in range(6):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, nq, M, 1, 4, 2),
                               lambda i, *_: (i, 0, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, nq, M * D), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, wh, ww, D), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))])
    f = jax.jit(lambda s_, v_, l_, stage=stage, gs=gs: pl.pallas_call(
        functools.partial(kern, stage), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, nq, M * D), jnp.bfloat16))(
            s_, v_, l_))
    try:
        out = f(sy, v, loc)
        out.block_until_ready()
        print(f"stage {stage}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"stage {stage}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)
