"""Sweep window-op knobs (tile, head_chunk) on TPU at encoder shapes."""
import functools, itertools, time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from psalm_tpu.ops.msdeform_window import ms_deform_attn_window

SHAPES = ((32, 32), (64, 64), (128, 128))
B, M, D, L, P = 1, 8, 32, 3, 4
S = sum(h * w for h, w in SHAPES)
R = 8.0
rng = np.random.RandomState(0)
refs = []
for (H, W) in SHAPES:
    ys = (np.arange(H) + 0.5) / H; xs = (np.arange(W) + 0.5) / W
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
ref = np.concatenate(refs, 0)
norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
off = rng.uniform(-R + 1, R - 1, size=(B, S, M, L, P, 2)).astype(np.float32)
loc = jnp.asarray(ref[None, :, None, None, None, :] + off / norm[None, None, None, :, None, :], jnp.float32)
val = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
attn = rng.rand(B, S, M, L, P).astype(np.float32)
attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True), jnp.bfloat16)

def timeit(f, n=10):
    float(jnp.sum(f().astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(f().astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3

for tile, hc in itertools.product((16, 32), (1, 2, 4, 8)):
    raw = functools.partial(ms_deform_attn_window, tile=tile,
                            radius=R, head_chunk=hc)
    fn = jax.jit(lambda v, l, a: raw(v, SHAPES, l, a))
    try:
        ms = timeit(lambda: fn(val, loc, attn))
        def lossf(v, l, a):
            return jnp.sum(jnp.square(raw(v, SHAPES, l, a).astype(jnp.float32)))
        g = jax.jit(jax.grad(lossf, argnums=(0, 1, 2)))
        float(jnp.sum(g(val, loc, attn)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(5):
            float(jnp.sum(g(val, loc, attn)[0].astype(jnp.float32)))
        bms = (time.perf_counter() - t0) / 5 * 1e3
        print(f"tile={tile} hc={hc}: fwd {ms:7.2f} ms  fbwd {bms:7.2f} ms")
    except Exception as e:
        print(f"tile={tile} hc={hc}: FAILED {type(e).__name__} {str(e)[:120]}")
