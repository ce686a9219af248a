"""Round-5 window-sampler sweep: the manual-VJP tile-scan core vs AD.

Targets VERDICT r4 #2 — the training backward's dominant cost is the window
op's einsum VJP (6 x 36.5 ms = 219 of 351 ms). The custom VJP
(ops/msdeform_window.py::_group_sample_cvjp) saves only the op inputs and
keeps t1/d_t1 per-tile; this sweep measures fwd and fwd+bwd per-op device
time (scan-difference method) against the AD einsum baseline, at flat r8/r4
and the per-point radii the r4f shootout measured.

Also probes 2-GROUP per-point radii (4,4,8,8): r4f showed 4 point groups
(2,4,6,8) lose to flat r8 on fwd scan + fbwd (group fixed overhead), so the
halved-group-count variant tests whether fewer, fatter groups keep the
matmul savings without the overhead.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_window_cvjp.py
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


def scan_rate_ms(fn, k=8, reps=3, grad=False, argnums=(0, 1, 2)):
    """Device ms/op via the in-program scan difference method.

    grad=True times fwd+bwd; argnums restricts which inputs get gradients
    (differencing two argnums rows isolates per-input backward costs,
    e.g. the d_value un-windowing scatter = all-args minus (1, 2))."""
    if grad:
        def loss(v, l, a):
            return jnp.sum(jnp.square(fn(v, l, a).astype(jnp.float32)))
        g = jax.grad(loss, argnums=argnums)

        def one(v, l, a):
            gs = g(v, l, a)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in gs)
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


VARIANTS = [
    ("AD   eins h1 r8         ", dict(radius=8.0, scan_tiles=False)),
    ("cvjp scan h1 r8         ", dict(radius=8.0, custom_vjp=True)),
    ("cvjp scan h2 r8         ", dict(radius=8.0, custom_vjp=True,
                                      head_chunk=2)),
    ("cvjp scan h1 r4         ", dict(radius=4.0, custom_vjp=True)),
    ("cvjp scan h1 (1,2,3,4)  ", dict(radius=(1.0, 2.0, 3.0, 4.0),
                                      custom_vjp=True)),
    ("cvjp scan h1 (4,4,8,8)  ", dict(radius=(4.0, 4.0, 8.0, 8.0),
                                      custom_vjp=True)),
    ("AD   eins h1 (4,4,8,8)  ", dict(radius=(4.0, 4.0, 8.0, 8.0),
                                      scan_tiles=False)),
    ("AD   scan h2 (4,4,8,8)  ", dict(radius=(4.0, 4.0, 8.0, 8.0),
                                      scan_tiles=True, head_chunk=2)),
]

print(f"shapes {SHAPES} S={S} M={M} D={D} P={P}  (device scan-diff ms/op)")
# backward attribution at the winning config: which input's grad is the cost?
_attr = functools.partial(ms_deform_attn_window, spatial_shapes=SHAPES,
                          radius=8.0, custom_vjp=True)
_attr_f = lambda v, l, a: _attr(v, sampling_locations=l, attention_weights=a)
for args, label in (((1, 2), "loc+attn only (no d_value)"),
                    ((0,), "value only"),
                    ((0, 1, 2), "all")):
    try:
        ms = scan_rate_ms(_attr_f, k=5, grad=True, argnums=args)
        print(f"fbwd cvjp r8 grads {label:<28} {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fbwd cvjp r8 grads {label} FAILED: {str(e)[:120]}",
              flush=True)

for name, kw in VARIANTS:
    fn = functools.partial(ms_deform_attn_window, spatial_shapes=SHAPES, **kw)
    f = lambda v, l, a, fn=fn: fn(v, sampling_locations=l,
                                  attention_weights=a)
    for grad, tag, k in ((False, "fwd ", 8), (True, "fbwd", 5)):
        try:
            ms = scan_rate_ms(f, k=k, grad=grad)
            print(f"{tag} {name}  {ms:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} {name}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
