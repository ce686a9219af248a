"""Window-sampler variant shootout at PSALM encoder shapes (VERDICT r3 #3).

Times each ms_deform_attn_window variant with the in-program lax.scan
difference method — ONE dispatch runs the op k times with a carry-dependent
input perturbation (so XLA cannot hoist the body), timed against a k=1 run
of the same program; (T_k - T_1)/(k-1) cancels the tunneled backend's
per-dispatch RPC floor and download cost, so the numbers are pure device
time regardless of tunnel state (the method bench.py's device rate uses).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_window_variants.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/psalm_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from psalm_tpu.ops.msdeform_window import ms_deform_attn_window

SHAPES = ((128, 128), (64, 64), (32, 32))  # res3, res4, res5 @ 1024^2
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

dt = jnp.bfloat16
val_d = jnp.asarray(val, dt)
loc_d = jnp.asarray(loc, jnp.float32)
attn_d = jnp.asarray(attn, dt)


def scan_rate_ms(fn, k=8, reps=3, grad=False):
    """Device ms/op via the in-program scan difference method."""
    if grad:
        def loss(v, l, a):
            return jnp.sum(jnp.square(fn(v, l, a).astype(jnp.float32)))
        g = jax.grad(loss, argnums=(0, 1, 2))

        def one(v, l, a):
            gv, gl, ga = g(v, l, a)
            return (jnp.sum(gv.astype(jnp.float32))
                    + jnp.sum(gl) + jnp.sum(ga.astype(jnp.float32)))
    else:
        def one(v, l, a):
            return jnp.sum(fn(v, l, a).astype(jnp.float32))

    def run_k(v, l, a, length):
        def body(c, _):
            # carry-dependent ~0 perturbation: a real data dependency XLA
            # cannot constant-fold, so the loop body cannot be hoisted
            return one(v, l + c * 1e-30, a).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    jitted = jax.jit(run_k, static_argnums=3)
    # float() materializes on the host — the only reliable sync on the
    # tunneled axon runtime (block_until_ready can return early there)
    for length in (1, k):
        float(jitted(val_d, loc_d, attn_d, length))
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jitted(val_d, loc_d, attn_d, 1))
        t1 = time.perf_counter()
        float(jitted(val_d, loc_d, attn_d, k))
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    return sorted(per)[len(per) // 2] * 1e3


# Round 2 of the sweep. Round-1 findings (2026-08-19, v5e, scan-diff):
#   legacy scan r8 10.54 / r4 7.51 ms; legacy einsum r8 13.74.
#   fold_points LOSES everywhere (2.5x fwd, 2.2x bwd): the 2-D stencil
#   build materializes ~4x the VPU-built volume of the separable Ay/Ax
#   one-hots, and the K=34 matmul it was meant to fix wasn't the binding
#   cost. The op looks LOOP-bound: h1 scan runs 8 heads x 252 tiles = 2016
#   sequential steps (~5 us/step); this round sweeps head_chunk and tile
#   on the LEGACY path to cut iteration count.
# Round 3 of the sweep. Round-2 findings (2026-08-19, v5e, scan-diff):
#   fwd r8: h1 10.73, h2 9.96 (best, -7%), h4 10.74, h8 11.41; every t32
#   and einsum variant slower (13-20 ms). fbwd r8: eins h1 50.19 (round-1)
#   stays the training default — eins h4 66.65 / h8 68.41 regress.
# This round: lax.scan unroll on the tile loop (the ~5 us/step hypothesis)
# crossed with the h2 winner.
# Round 5 of the sweep: PER-POINT radii (VERDICT r3 #3 attempt (a)). The
# offset head's init bias magnitude is exactly (p+1) px for point p, so
# (2,4,6,8) matches flat r8's 2x-init safety policy per point and (1,2,3,4)
# matches flat r4's exact-at-init bound — at ~25-30% less stage-1 matmul
# work (window width (t-1)f + 2 r_p + 3 per point group).
VARIANTS = [
    ("flat  scan h2 r8        ", dict(radius=8.0, scan_tiles=True,
                                      head_chunk=2)),
    ("pp    scan h2 (2,4,6,8) ", dict(radius=(2.0, 4.0, 6.0, 8.0),
                                      scan_tiles=True, head_chunk=2)),
    ("pp    scan h2 (1,2,3,4) ", dict(radius=(1.0, 2.0, 3.0, 4.0),
                                      scan_tiles=True, head_chunk=2)),
    ("flat  scan h2 r4        ", dict(radius=4.0, scan_tiles=True,
                                      head_chunk=2)),
    ("flat  eins h1 r8        ", dict(radius=8.0, scan_tiles=False)),
    ("pp    eins h1 (2,4,6,8) ", dict(radius=(2.0, 4.0, 6.0, 8.0),
                                      scan_tiles=False)),
    ("pp    eins h1 (1,2,3,4) ", dict(radius=(1.0, 2.0, 3.0, 4.0),
                                      scan_tiles=False)),
]

print(f"shapes {SHAPES} S={S} M={M} D={D} P={P}  (device scan-diff ms/op)")
for name, kw in VARIANTS:
    fn = functools.partial(ms_deform_attn_window, spatial_shapes=SHAPES, **kw)
    f = lambda v, l, a, fn=fn: fn(v, sampling_locations=l,
                                  attention_weights=a)
    try:
        ms = scan_rate_ms(f)
        print(f"fwd  {name}  {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fwd  {name}  FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

for name, kw in VARIANTS:
    if "eins" not in name:
        continue  # bwd for train-relevant (einsum) variants only
    fn = functools.partial(ms_deform_attn_window, spatial_shapes=SHAPES, **kw)
    f = lambda v, l, a, fn=fn: fn(v, sampling_locations=l,
                                  attention_weights=a)
    try:
        ms = scan_rate_ms(f, k=5, grad=True)
        print(f"fbwd {name}  {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fbwd {name}  FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
