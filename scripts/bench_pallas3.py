"""Pallas whole-sampler kernel (v3) vs the XLA window op, real encoder
shapes, scan-difference device time.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas3.py
"""
import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timer import scan_rate_ms

from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
from psalm_tpu.ops.msdeform_window_pallas3 import ms_deform_attn_window_pallas3

SHAPES = ((128, 128), (64, 64), (32, 32))
B, M, D, L, P = 1, 8, 32, 3, 4
S = sum(h * w for h, w in SHAPES)

rng = np.random.RandomState(0)
refs = []
for (H, W) in SHAPES:
    ys = (np.arange(H) + 0.5) / H
    xs = (np.arange(W) + 0.5) / W
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
ref = np.concatenate(refs, 0)
norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
off = rng.uniform(-3.5, 3.5, size=(B, S, M, L, P, 2)).astype(np.float32)
loc = (ref[None, :, None, None, None, :]
       + off / norm[None, None, None, :, None, :]).astype(np.float32)
val = rng.randn(B, S, M, D).astype(np.float32)
attn = rng.rand(B, S, M, L, P).astype(np.float32)
attn /= attn.sum((-1, -2), keepdims=True)

val_d = jnp.asarray(val, jnp.bfloat16)
loc_d = jnp.asarray(loc, jnp.float32)
attn_d = jnp.asarray(attn, jnp.bfloat16)

VARIANTS = [
    ("xla window scan h2 r8 ",
     functools.partial(ms_deform_attn_window, spatial_shapes=SHAPES,
                       radius=8.0, head_chunk=2)),
]
for xs_ in ("sum3d", "gmat"):
    for tile in (8, 16):
        VARIANTS.append((
            f"pallas3 {xs_:5s} t{tile:<2d} r8 ",
            functools.partial(ms_deform_attn_window_pallas3,
                              spatial_shapes=SHAPES, tile=tile, radius=8.0,
                              xstage=xs_)))

# correctness spot-check on-device before timing
base = None
for name, fn in VARIANTS:
    f = jax.jit(lambda v, l, a, fn=fn: fn(v, sampling_locations=l,
                                          attention_weights=a))
    try:
        out = np.asarray(f(val_d, loc_d, attn_d), np.float32)
        if base is None:
            base = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - base)))
        ms = scan_rate_ms(f, val_d, loc_d, attn_d, k=6, reps=3)
        print(f"{name} {ms:8.2f} ms   maxdiff {err:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
