"""Verification drive: panoptic inference end-to-end through the public
package — tiny PSALM forward on a synthetic image, on-device panoptic merge,
plus an empty-scene probe (no confident queries)."""
import os
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("DEMO_FORCE_CPU", "1") == "1":
    # re-exec without the axon sitecustomize so we get the 8-device CPU mesh
    import sys
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.eval.postprocess import (panoptic_inference, semantic_inference,
                                        instance_inference)
import __graft_entry__ as ge

print("devices:", jax.devices()[:2], "…" if len(jax.devices()) > 2 else "")
cfg = tiny_test_config()
K = 4
model = PSALM(cfg)
batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                         num_class_names=K))(
    jax.random.PRNGKey(0), batch)

@jax.jit
def infer(params, batch):
    out = model.apply(params, batch, use_class_names=True, num_class_names=K)
    return out["pred_class_name_logits"][0], out["pred_masks"][0]

cls_logits, mask_logits = infer(params, batch)
print("class logits:", cls_logits.shape, "mask logits:", mask_logits.shape)

is_thing = jnp.asarray([True, False, True])
# With random weights every query is diffuse, so the 0.8 confidence gate and
# the 0.8 overlap test reject everything (observed: 0 segments). To exercise
# the non-empty merge path, keep two queries confident in distinct classes
# and give them dominant disjoint masks derived from the model's own output.
Q = cls_logits.shape[0]
cls_adj = jnp.full((Q, K), -20.0).at[0, 0].set(20.0).at[1, 1].set(20.0)
half = jnp.zeros((16, 16)).at[:, :8].set(12.0) - 6.0  # left half positive
masks_adj = (mask_logits * 0.01).at[0].add(half).at[1].add(-half)
pan, info = panoptic_inference(cls_adj, masks_adj, is_thing)
n_seg = int(np.asarray(info["valid"]).sum())
print("panoptic segments:", n_seg, "unique ids:", np.unique(np.asarray(pan)).tolist())

sem = semantic_inference(cls_logits, mask_logits)
inst = instance_inference(cls_logits, mask_logits, topk=cfg.mask_decoder.num_queries)
print("semantic:", sem.shape, "instance scores top3:",
      np.asarray(inst["scores"])[:3].round(3).tolist())

# probe: nothing confident -> empty panoptic seg, zero segments
flat_logits = jnp.zeros_like(cls_logits)
pan0, info0 = panoptic_inference(flat_logits, mask_logits, is_thing)
assert int(np.asarray(info0["valid"]).sum()) == 0
assert np.asarray(pan0).max() == 0
print("empty-scene probe: 0 segments, void panoptic map ✓")
print("DEMO EVAL OK")
