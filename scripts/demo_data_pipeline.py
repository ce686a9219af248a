"""Verification drive: synthetic COCO tree -> task datasets -> homogeneous
batches -> collate -> PSALM forward with CONVERTED (torch-format) weights.
Exercises the datasets, mappers, RLE codec, sampler, and checkpoint converter
through the public package in one flow."""
import os, sys, tempfile
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("DEMO_FORCE_CPU", "1") == "1":
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_data_pipeline import _write_synthetic_coco, StubTokenizer, _cfg
from psalm_tpu.config import tiny_test_config
from psalm_tpu.data.datasets import (PanopticDataset, InteractiveDataset,
                                     UnifiedTaskSampler, collate)
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from test_convert import synthetic_torch_sd

tmp = tempfile.mkdtemp()
root, inst_json = _write_synthetic_coco(tmp)
tok = StubTokenizer()
dcfg = _cfg()
pan = PanopticDataset(root, tok, dcfg, is_train=False)
inter = InteractiveDataset(inst_json, os.path.join(root, "val2017"), tok, dcfg)
sampler = UnifiedTaskSampler([pan, inter], batch_size=2)

b1 = collate(sampler.next_batch())
b2 = collate(sampler.next_batch())
print("batch1:", b1["dataset_type"], "tok_ids", b1["tok_ids"].shape,
      "gt_valid/sample", b1["gt_valid"].sum(1).tolist())
print("batch2:", b2["dataset_type"], "region_valid", b2["region_valid"].sum(1).tolist())

# forward the panoptic batch through PSALM initialized from a TORCH-format
# state dict via the converter
cfg = tiny_test_config()
sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
model = PSALM(cfg)
K = int(b1["num_class_names"][0])
batch = {k: jnp.asarray(v) for k, v in b1.items()
         if k not in ("dataset_type", "image_id", "num_class_names")}
out = jax.jit(lambda v, b: model.apply(v, b, use_class_names=True,
                                       num_class_names=K))(variables, batch)
pm = np.asarray(out["pred_masks"])
print("pred_masks from converted ckpt:", pm.shape, "finite:", np.isfinite(pm).all())

# probe: corrupted RLE string -> codec should fail loudly, not silently
from psalm_tpu.data import coco_rle
try:
    coco_rle.decode({"size": [48, 64], "counts": "!!!corrupt"})
    bad = coco_rle.decode({"size": [48, 64], "counts": "!!!corrupt"})
    print("corrupt RLE decoded to shape", bad.shape, "(lenient)")
except Exception as e:
    print("corrupt RLE raised:", type(e).__name__)

# probe: prompt longer than pad_len -> splicer must raise ValueError
from psalm_tpu.data.splicer import splice
from psalm_tpu.data.constants import IMAGE_TOKEN_INDEX
try:
    splice([IMAGE_TOKEN_INDEX], None, num_image_tokens=9999, num_seg_queries=1,
           pad_len=16)
    print("overflow NOT caught — BUG")
except ValueError as e:
    print("overflow probe raised ValueError:", e)
print("DEMO DATA PIPELINE OK")
