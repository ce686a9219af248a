"""Swin-B per-stage breakdown at 1024^2 on TPU (scan-difference timed).

The eval breakdown (round 4) put swin+projector at 19.4 ms device time
against ~620 GFLOP of matmuls (~3.1 ms at peak, ~16% MFU). This script
splits that: patchify conv, each stage's blocks, and inside one stage-0 /
stage-2 block the attention core vs MLP vs LayerNorms, plus the projector.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_swin_breakdown.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timer import scan_rate_ms

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.swin import SwinTransformer, SwinBlock, window_partition
from psalm_tpu.models.projector import build_projector

cfg = PSALMConfig(compute_dtype="bfloat16")
sc = cfg.swin
dt = jnp.bfloat16
rng = np.random.RandomState(0)
# PSALM_SWIN_BENCH_SIZE: shrink for CPU smoke tests (default = real 1024)
B, S = 1, int(os.environ.get("PSALM_SWIN_BENCH_SIZE", cfg.image_size))

model = SwinTransformer(sc, dtype=dt)
img = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), img)

full = jax.jit(model.apply)
ms = scan_rate_ms(full, params, img)
print(f"swin full (4 scales out)      {ms:8.2f} ms")

proj = build_projector(cfg.projector, dtype=dt)
feats = jax.jit(full)(params, img)
pparams = jax.jit(proj.init)(jax.random.PRNGKey(1), feats[-1])
pm = scan_rate_ms(jax.jit(proj.apply), pparams, feats[-1])
print(f"projector                     {pm:8.2f} ms")

# one block per stage, x as jit arg
dims = sc.num_features
res = [S // 4, S // 8, S // 16, S // 32]
for i, (dim, heads, depth) in enumerate(zip(dims, sc.num_heads, sc.depths)):
    H = W = res[i]
    x = jnp.asarray(rng.randn(B, H * W, dim), dt)
    for shift, tag in ((0, "win "), (sc.window_size // 2, "shft")):
        blk = SwinBlock(dim=dim, num_heads=heads, window_size=sc.window_size,
                        shift_size=shift, mlp_ratio=sc.mlp_ratio,
                        qkv_bias=sc.qkv_bias, dtype=dt)
        bp = jax.jit(lambda r, x_, blk=blk, H=H, W=W: blk.init(r, x_, H, W))(
            jax.random.PRNGKey(i), x)
        f = jax.jit(lambda p, x_, blk=blk, H=H, W=W: blk.apply(p, x_, H, W))
        bms = scan_rate_ms(f, bp, x)
        print(f"stage{i} {tag} block ({H}x{W}x{dim})   {bms:8.2f} ms"
              f"  (x{depth // 2} pairs)")

# inside stage 0: attention core vs MLP at the real window shapes
from psalm_tpu.models.swin import WindowAttention
ws = sc.window_size
H0 = res[0] + (ws - res[0] % ws) % ws
nW = (H0 // ws) ** 2
xw = jnp.asarray(rng.randn(nW, ws * ws, dims[0]), dt)
wa = WindowAttention(dims[0], ws, sc.num_heads[0], sc.qkv_bias, dtype=dt)
wp = jax.jit(wa.init)(jax.random.PRNGKey(7), xw, None)
wms = scan_rate_ms(jax.jit(lambda p, x_: wa.apply(p, x_, None)), wp, xw)
print(f"stage0 attn core ({nW}x{ws*ws}x{dims[0]}) {wms:8.2f} ms")

import flax.linen as nn
mlp = nn.Sequential([nn.Dense(dims[0] * 4, dtype=dt), jax.nn.gelu,
                     nn.Dense(dims[0], dtype=dt)])
x0 = jnp.asarray(rng.randn(B, res[0] * res[0], dims[0]), dt)
mp = jax.jit(mlp.init)(jax.random.PRNGKey(8), x0)
mms = scan_rate_ms(jax.jit(mlp.apply), mp, x0)
print(f"stage0 mlp                    {mms:8.2f} ms")

ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
lp = jax.jit(ln.init)(jax.random.PRNGKey(9), x0)
lms = scan_rate_ms(jax.jit(ln.apply), lp, x0)
print(f"stage0 layernorm (f32)        {lms:8.2f} ms")

# the pieces outside the blocks: patchify conv, patch mergings, out-norms
pe = nn.Conv(sc.embed_dim, kernel_size=(4, 4), strides=(4, 4), dtype=dt)
pep = jax.jit(pe.init)(jax.random.PRNGKey(10), img)
pems = scan_rate_ms(jax.jit(pe.apply), pep, img)
print(f"patchify conv 4x4/4           {pems:8.2f} ms")


def patchify_matmul(p, im):
    B_, H_, W_, _ = im.shape
    x = im.reshape(B_, H_ // 4, 4, W_ // 4, 4, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B_, -1, 48)
    k = p["params"]["kernel"].reshape(48, sc.embed_dim).astype(dt)
    return x.astype(dt) @ k + p["params"]["bias"].astype(dt)


pmms = scan_rate_ms(jax.jit(patchify_matmul), pep, img)
print(f"patchify as im2row matmul     {pmms:8.2f} ms")

from psalm_tpu.models.swin import PatchMerging
for i in range(3):
    H = W = res[i]
    xm = jnp.asarray(rng.randn(B, H * W, dims[i]), dt)
    pmod = PatchMerging(dims[i], dtype=dt)
    pp2 = jax.jit(lambda r, x_, pmod=pmod, H=H, W=W: pmod.init(r, x_, H, W))(
        jax.random.PRNGKey(11 + i), xm)
    f2 = jax.jit(lambda p, x_, pmod=pmod, H=H, W=W: pmod.apply(p, x_, H, W))
    print(f"patch merging {i} ({H}x{W}x{dims[i]})  "
          f"{scan_rate_ms(f2, pp2, xm):8.2f} ms")

for i in range(4):
    H = W = res[i]
    xo = jnp.asarray(rng.randn(B, H * W, dims[i]), dt)
    lno = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    lpo = jax.jit(lno.init)(jax.random.PRNGKey(20 + i), xo)
    print(f"out-norm{i} ({H * W}x{dims[i]})        "
          f"{scan_rate_ms(jax.jit(lno.apply), lpo, xo):8.2f} ms")
