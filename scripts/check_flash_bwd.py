"""Validate Phi flash-attention BACKWARD numerics on TPU vs dense attention.

Gate for enabling use_flash in training (ROADMAP item 9): compares loss
gradients through the full 24-layer Phi stack with use_flash on/off on the
same bf16 inputs/params. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_flash_bwd.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.phi import PhiModel

import dataclasses
cfg = dataclasses.replace(PSALMConfig().phi, num_layers=4)  # full-width
# layers; 4 deep keeps the DENSE reference's stored [32,L,L] attention
# matrices within HBM. Numerics are per-layer, depth adds nothing.
rng = np.random.RandomState(0)
B, L = 1, 1408  # multiple of 128 (flash pads internally otherwise)
x = jnp.asarray(rng.randn(B, L, cfg.hidden_size) * 0.02, jnp.bfloat16)
mask = jnp.ones((B, L), jnp.int32)

models = {f: PhiModel(cfg, dtype=jnp.bfloat16, use_flash=f)
          for f in (False, True)}
params = jax.jit(lambda r: models[False].init(
    r, inputs_embeds=x, attention_mask=mask))(jax.random.PRNGKey(0))


def loss(p, flash):
    h = models[flash].apply(p, inputs_embeds=x, attention_mask=mask)[0]
    return jnp.sum(jnp.square(h.astype(jnp.float32))) / (B * L)


grads = {}
for flash in (False, True):
    g = jax.jit(jax.grad(lambda p: loss(p, flash)))(params)
    grads[flash] = jax.tree.map(lambda a: np.asarray(a, np.float32), g)
    t0 = time.perf_counter()
    for _ in range(4):
        gg = jax.jit(jax.grad(lambda p: loss(p, flash)))(params)
        float(jnp.sum(jax.tree.leaves(gg)[0].astype(jnp.float32)))
    print(f"flash={flash}: grad step {(time.perf_counter()-t0)/4*1e3:.1f} ms")

flat_d, _ = jax.tree_util.tree_flatten_with_path(grads[False])
flat_f = jax.tree.leaves(grads[True])
# floor each leaf's scale at 1e-3 x the global grad magnitude: leaves whose
# true gradient is ~0 (e.g. k_proj bias — softmax is near-invariant to
# uniform key shifts) would otherwise blow up a pure per-leaf relative err
gmax = max(np.abs(a).max() for _, a in flat_d)
worst = (0.0, "", 0.0, 0.0)
for (kp, a), b in zip(flat_d, flat_f):
    scale = max(np.abs(a).max(), 1e-3 * gmax)
    rel = np.abs(a - b).max() / scale
    if rel > worst[0]:
        worst = (float(rel),
                 "/".join(str(getattr(k, "key", k)) for k in kp),
                 float(np.abs(a - b).max()), float(np.abs(a).max()))
print(f"worst floored-relative grad err: {worst[0]:.3e} at {worst[1]} "
      f"(abs {worst[2]:.3e}, leaf scale {worst[3]:.3e}, global {gmax:.3e})")
print("OK" if worst[0] < 0.05 else "MISMATCH")
