"""Verification drive: use psalm_tpu as a downstream user would — compose the
vision tower + projector + LLM from the public package and run real data
through the jitted pipeline on the 8-device CPU mesh."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax, jax.numpy as jnp
import numpy as np

import psalm_tpu
from psalm_tpu import PSALMConfig, SegTask
from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.swin import SwinTransformer
from psalm_tpu.models.projector import ResNetSwinProjector
from psalm_tpu.models.phi import PhiForCausalLM
from psalm_tpu.ops.msdeform import ms_deform_attn

print("package:", psalm_tpu.__version__, "devices:", len(jax.devices()))
cfg = tiny_test_config()
print("task switch:", cfg.seg_task, "panoptic_on:", cfg.seg_task.panoptic_on,
      "semantic_on:", cfg.seg_task.semantic_on)

rng = jax.random.PRNGKey(0)
img = jax.random.normal(rng, (2, 64, 64, 3))

swin = SwinTransformer(cfg.swin)
sw_params = swin.init(rng, img)
feats = jax.jit(lambda p, x: swin.apply(p, x))(sw_params, img)
print("swin scales:", [f.shape for f in feats])

proj = ResNetSwinProjector(cfg.projector)
pp = proj.init(rng, feats[-1])
tokens = jax.jit(lambda p, x: proj.apply(p, x))(pp, feats[-1])
print("image tokens:", tokens.shape)

phi = PhiForCausalLM(cfg.phi)
B, Ltxt = 2, 6
ids = jax.random.randint(rng, (B, Ltxt), 0, cfg.phi.vocab_size)
phi_params = phi.init(rng, input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
text_emb = phi.apply({"params": phi_params}, ids, method=lambda m, i: m.embed(i))
seq = jnp.concatenate([text_emb[:, :3], tokens, text_emb[:, 3:]], axis=1)
logits, hidden, _ = jax.jit(lambda p, e: phi.apply({"params": p}, e))(phi_params, seq)
print("phi full-seq:", logits.shape, "hidden:", hidden.shape,
      "finite:", bool(jnp.isfinite(hidden).all()))

# KV-cache greedy decode of 5 tokens from the multimodal prefix
caches = phi.apply({"params": phi_params}, B, seq.shape[1] + 5,
                   method=lambda m, b, s: m.model.init_cache(b, s, jnp.float32))
pos = jnp.broadcast_to(jnp.arange(seq.shape[1]), (B, seq.shape[1]))
lg, _, caches = phi.apply({"params": phi_params}, seq, positions=pos, caches=caches)
tok = jnp.argmax(lg[:, -1], -1)
out_toks = [tok]
for t in range(4):
    e = phi.apply({"params": phi_params}, tok[:, None], method=lambda m, i: m.embed(i))
    lg, _, caches = phi.apply({"params": phi_params}, e,
                              positions=jnp.full((B, 1), seq.shape[1] + t), caches=caches)
    tok = jnp.argmax(lg[:, -1], -1)
    out_toks.append(tok)
print("greedy decode tokens:", np.asarray(jnp.stack(out_toks, 1)))

# msdeform through the dispatcher (public entry)
shapes = ((8, 8), (4, 4))
S = sum(h * w for h, w in shapes)
val = jax.random.normal(rng, (1, S, 2, 4))
loc = jax.random.uniform(rng, (1, S, 2, 2, 4, 2))
aw = jax.nn.softmax(jax.random.normal(rng, (1, S, 2, 2 * 4)), -1).reshape(1, S, 2, 2, 4)
out = jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a))(val, loc, aw)
print("msdeform out:", out.shape, "finite:", bool(jnp.isfinite(out).all()))

# probe: bf16 compute dtype through swin
swin16 = SwinTransformer(cfg.swin, dtype=jnp.bfloat16)
f16 = swin16.apply(sw_params, img.astype(jnp.bfloat16))
print("bf16 swin res5 dtype:", f16[-1].dtype, "drift vs f32:",
      float(jnp.abs(f16[-1].astype(jnp.float32) - feats[-1]).max()))
print("VERIFY OK")
