"""Sweep window-op knobs (tile, head_chunk, scan) on TPU at encoder shapes.

Rationale for small tiles at large radius: the scan-tile formulation's t1
intermediate is [nq*P, ww, D] per (tile, head) and its total HBM traffic
per level pair is S*P*D*wh where wh = (t-1)*f + 2R + 3 — the halo term 2R+3
is paid once per TILE ROW of queries, so at R=8 a smaller tile cuts wh
(t16: 34 -> t8: 26 -> t4: 22 at f=1; 79 -> 47 -> 35 at f=4) and with it the
dominant traffic term. Sweep env: PSALM_SWEEP_R (radius, default 8),
PSALM_SWEEP_TILES, PSALM_SWEEP_HC, PSALM_SWEEP_BWD=0 to skip backward.
"""
import functools, itertools, os, time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from psalm_tpu.ops.msdeform_window import ms_deform_attn_window

SHAPES = ((32, 32), (64, 64), (128, 128))
B, M, D, L, P = 1, 8, 32, 3, 4
S = sum(h * w for h, w in SHAPES)
R = float(os.environ.get("PSALM_SWEEP_R", "8"))
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

TILES = tuple(int(t) for t in
              os.environ.get("PSALM_SWEEP_TILES", "4,8,16,32").split(","))
HCS = tuple(int(h) for h in
            os.environ.get("PSALM_SWEEP_HC", "1,2,4,8").split(","))
DO_BWD = os.environ.get("PSALM_SWEEP_BWD", "1") != "0"

for tile, hc, scan in itertools.product(TILES, HCS, (True, False)):
    raw = functools.partial(ms_deform_attn_window, tile=tile,
                            radius=R, head_chunk=hc, scan_tiles=scan)
    fn = jax.jit(lambda v, l, a: raw(v, SHAPES, l, a))
    tag = f"tile={tile:2d} hc={hc} scan={int(scan)} R={R:.0f}"
    try:
        ms = timeit(lambda: fn(val, loc, attn))
        if DO_BWD:
            def lossf(v, l, a):
                return jnp.sum(jnp.square(raw(v, SHAPES, l, a).astype(jnp.float32)))
            g = jax.jit(jax.grad(lossf, argnums=(0, 1, 2)))
            float(jnp.sum(g(val, loc, attn)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(5):
                float(jnp.sum(g(val, loc, attn)[0].astype(jnp.float32)))
            bms = (time.perf_counter() - t0) / 5 * 1e3
            print(f"{tag}: fwd {ms:7.2f} ms  fbwd {bms:7.2f} ms", flush=True)
        else:
            print(f"{tag}: fwd {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
