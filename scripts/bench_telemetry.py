"""Cost of the window-clamp telemetry check (VERDICT r3 weak #7).

The EvalRunner runs an instrumented forward (eval/instrument.py) on batch 0
and every ``window_check_every`` (default 50) batches. This script measures
that cost two ways on the flagship panoptic config:

  device ms    scan-difference time of the jitted instrumented forward vs
               the plain eval forward (the instrumented one sows per-layer
               scalar offset stats, which can perturb fusion)
  wall ms      one _check_window_mode-equivalent call end-to-end (includes
               the handful-of-scalars download)

Amortized overhead = extra_ms / (check_every * per_image_ms).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_telemetry.py
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timer import scan_rate_ms

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.eval.instrument import (offset_clamp_report, summarize,
                                       _instrumented_forward)
import __graft_entry__ as ge

cfg = PSALMConfig(compute_dtype="bfloat16")
cfg = cfg.replace(pixel_decoder=dataclasses.replace(
    cfg.pixel_decoder, attention_mode="window"))
K = cfg.num_classes + 1
model = PSALM(cfg, dtype=jnp.bfloat16)
batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                         num_class_names=K))(
    jax.random.PRNGKey(0), batch)

kw = dict(use_class_names=True, use_seg_embedding=False, use_regions=False,
          max_regions=0, num_class_names=K, compute_logits=False)

plain = jax.jit(lambda p, b: model.apply(p, b, use_class_names=True,
                                         num_class_names=K)["pred_masks"])
ms_plain = scan_rate_ms(plain, params, batch)
print(f"plain eval forward            {ms_plain:8.1f} ms (device)")

inst = _instrumented_forward(model, tuple(sorted(kw.items())))
ms_inst = scan_rate_ms(inst, params, batch)
print(f"instrumented forward (jitted) {ms_inst:8.1f} ms (device)")

# end-to-end wall time of one report (incl. scalar downloads), post-warmup
summarize(offset_clamp_report(model, params, batch, **kw))
t0 = time.perf_counter()
stats = summarize(offset_clamp_report(model, params, batch, **kw))
wall = (time.perf_counter() - t0) * 1e3
print(f"offset_clamp_report wall      {wall:8.1f} ms  stats={stats}")
per50 = ms_inst / 50.0
print(f"amortized @check_every=50     {per50:8.2f} ms/image "
      f"({per50 / ms_plain * 100:.1f}% of the plain forward)")
