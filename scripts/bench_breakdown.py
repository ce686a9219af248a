"""Per-stage timing of the flagship panoptic pipeline on the TPU."""
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/psalm_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import jax.numpy as jnp

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.eval.postprocess import panoptic_inference
import __graft_entry__ as ge

import os
import dataclasses
cfg = PSALMConfig(compute_dtype="bfloat16")
mode = os.environ.get("PSALM_BENCH_PIXDEC_MODE", "window")
if mode != "deformable":
    cfg = cfg.replace(pixel_decoder=dataclasses.replace(
        cfg.pixel_decoder, attention_mode=mode))
K = cfg.num_classes + 1
model = PSALM(cfg, dtype=jnp.bfloat16)
batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                         num_class_names=K))(
    jax.random.PRNGKey(0), batch)

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timer import scan_rate_ms


def timed(name, fn, *args, iters=None):
    # in-program scan difference timing (scan_timer.py): pure device
    # ms/stage regardless of tunnel state. The earlier async-dispatch
    # methodology underrepresented RPC costs with a healthy tunnel and
    # overrepresented device time with a degraded one (overlapped
    # dispatches are penalized — the BENCH_r03 pathology).
    out = fn(*args)
    # time against the LAST float arg (the stage input; perturbing params
    # would be equally fine — any real data dependency defeats hoisting)
    ms = scan_rate_ms(fn, *args)
    print(f"{name:28s} {ms:8.1f} ms", flush=True)
    return out

imgs = batch["images"]

swin = jax.jit(lambda p, im: model.apply(p, im, method=lambda m, x: m.encode_images(x)))
feats, tokens = timed("swin+projector", swin, params, imgs)

phi_in = jax.jit(lambda p, b, it: model.apply(
    p, b["tok_ids"], b["src_type"], b["src_idx"], it,
    method=lambda m, t, st, si, img: m.assemble_embeddings(t, st, si, img)))
seq = timed("assemble", phi_in, params, batch, tokens)

phi = jax.jit(lambda p, s, am: model.apply(
    p, s, am, method=lambda m, e, a: m.phi(e, attention_mask=a)))
hid = timed("phi 24L full-seq", phi, params, seq, batch["attention_mask"])

pd = jax.jit(lambda p, f: model.apply(p, list(f), method=lambda m, x: m.pixel_decoder(x)))
pdout = timed("pixel decoder (msdeform x6)", pd, params, feats)

mask_features, _, ms = pdout
segq = jnp.zeros((1, 100, 256), jnp.bfloat16)
clse = jnp.zeros((1, K, 256), jnp.bfloat16)
md = jax.jit(lambda p, ms_, mf, sq, ce: model.apply(
    p, list(ms_), mf, sq, None, ce, None, None, None,
    method=lambda m, a, b, c, d, e, f, g, h: m.predictor(
        a, b, c, SEG_embedding=d, class_name_embedding=e, class_name_valid=f,
        region_embedding=g, region_valid=h)))
timed("mask decoder (9L)", md, params, ms, mask_features, segq, clse)

full = jax.jit(lambda p, b: model.apply(p, b, use_class_names=True,
                                        num_class_names=K))
out = timed("FULL forward", full, params, batch)

is_thing = jnp.asarray([i % 2 == 0 for i in range(K - 1)])
pp = jax.jit(lambda cl, m: panoptic_inference(cl, m, is_thing))
timed("panoptic postprocess 256", pp, out["pred_class_name_logits"][0],
      out["pred_masks"][0])

# round-3 geometry path: crop-resize to the COCO bucket + heads at 640
from psalm_tpu.eval import geometry

BUCKET = (640, 640)
content = jnp.asarray([[768, 1024]], jnp.int32)
original = jnp.asarray([[480, 640]], jnp.int32)

geom = jax.jit(lambda m, c, o: jax.vmap(
    lambda mm, cc, oo: geometry.crop_resize_to_original(
        mm, cc, oo, cfg.image_size, BUCKET))(m, c, o))
mo = timed("crop-resize to 640 bucket", geom, out["pred_masks"], content,
           original)

valid = jax.vmap(lambda o: geometry.valid_mask(o, BUCKET))(original)
pp640 = jax.jit(lambda cl, m, v: panoptic_inference(cl, m, is_thing, v))
timed("panoptic merge @640", pp640, out["pred_class_name_logits"][0],
      mo[0], valid[0])

from psalm_tpu.eval.postprocess import semantic_inference
sem = jax.jit(lambda cl, m: jnp.argmax(semantic_inference(cl, m), axis=0))
timed("semantic head+argmax @640", sem, out["pred_class_name_logits"][0],
      mo[0])
