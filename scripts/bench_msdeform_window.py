"""Microbench: windowed vs patch vs xla MSDeformAttn at PSALM encoder shapes.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_msdeform_window.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.ops.msdeform import ms_deform_attn_xla, ms_deform_attn_patch
from psalm_tpu.ops.msdeform_window import ms_deform_attn_window

SHAPES = ((32, 32), (64, 64), (128, 128))  # res5, res4, res3 @ 1024^2
B, M, D, L, P = 1, 8, 32, 3, 4
S = sum(h * w for h, w in SHAPES)
R = 8.0

rng = np.random.RandomState(0)
refs = []
for (H, W) in SHAPES:
    ys = (np.arange(H) + 0.5) / H
    xs = (np.arange(W) + 0.5) / W
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
ref = np.concatenate(refs, 0)
norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
off = rng.uniform(-R + 1, R - 1, size=(B, S, M, L, P, 2)).astype(np.float32)
loc = (ref[None, :, None, None, None, :]
       + off / norm[None, None, None, :, None, :]).astype(np.float32)
val = rng.randn(B, S, M, D).astype(np.float32)
attn = rng.rand(B, S, M, L, P).astype(np.float32)
attn /= attn.sum((-1, -2), keepdims=True)

dt = jnp.bfloat16
val_d = jnp.asarray(val, dt)
loc_d = jnp.asarray(loc, jnp.float32)
attn_d = jnp.asarray(attn, dt)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(f, *a, n=10):
    sync(f(*a))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n):
        acc += sync(f(*a))
    return (time.perf_counter() - t0) / n * 1e3


impls = {
    "xla": ms_deform_attn_xla,
    "patch": ms_deform_attn_patch,
    "window": functools.partial(ms_deform_attn_window, tile=16, radius=R),
}

for name, fn in impls.items():
    f = jax.jit(lambda v, l, a, fn=fn: fn(v, SHAPES, l, a))
    try:
        ms = timeit(f, val_d, loc_d, attn_d)
        print(f"fwd  {name:7s} {ms:8.2f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"fwd  {name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}")

for name, fn in impls.items():
    def loss(v, l, a, fn=fn):
        return jnp.sum(jnp.square(fn(v, SHAPES, l, a).astype(jnp.float32)))
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    try:
        ms = timeit(lambda v, l, a: g(v, l, a)[0], val_d, loc_d, attn_d, n=5)
        print(f"fbwd {name:7s} {ms:8.2f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"fbwd {name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}")

# numerics sanity on-device (bf16): window vs xla
o_x = jax.jit(lambda v, l, a: ms_deform_attn_xla(v, SHAPES, l, a))(
    val_d, loc_d, attn_d)
o_w = jax.jit(lambda v, l, a: ms_deform_attn_window(
    v, SHAPES, l, a, tile=16, radius=R))(val_d, loc_d, attn_d)
err = float(jnp.abs(o_x.astype(jnp.float32) - o_w.astype(jnp.float32)).max())
print(f"bf16 window-vs-xla maxerr {err:.3e} (scale "
      f"{float(jnp.abs(o_x.astype(jnp.float32)).max()):.3f})")
