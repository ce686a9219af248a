"""Serving-decode throughput bench: tok/s across precision x chunk size.

The decode step is HBM-bandwidth-bound on the Phi weight reads (~1.4B
params; v5e ~819 GB/s => ~290 tok/s at bf16, ~580 at int8). Measures the
steady-state chunked decode (models/generation.py) for:
  f32    — params as loaded (round-2 configuration)
  bf16   — params cast to bf16 (builder's serving cast)
  int8   — weight-only int8 Phi linears (quantize_phi_int8)
over chunk sizes {8, 16, 32, 64}.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode.py
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from psalm_tpu.config import PSALMConfig
from psalm_tpu.models.generation import Generator
from psalm_tpu.models.psalm import PSALM

MAX_LEN = 2048
NEW_TOKENS = 128
# PSALM_DECODE_BATCH=N: N concurrent sequences per decode dispatch — the
# weight reads amortize across the batch, so aggregate tok/s scales until
# the matvecs turn compute-bound (static request batching; the worker can
# group waiting requests the same way)
BATCH = int(os.environ.get("PSALM_DECODE_BATCH", "1"))


def make_variables(cfg, model, rng=0):
    import __graft_entry__ as ge
    batch = ge._panoptic_batch(cfg, B=1, num_classes=cfg.num_classes + 1)
    return jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=cfg.num_classes + 1))(
        jax.random.PRNGKey(rng), batch), batch


def gen_batch(cfg):
    from psalm_tpu.data.constants import IMAGE_TOKEN_INDEX
    from psalm_tpu.data.splicer import splice, stack_samples
    s = cfg.image_size
    n_img = (s // 64) ** 2
    ids = [101, IMAGE_TOKEN_INDEX, 102, 103, 104]
    sp = splice(ids, None, num_image_tokens=n_img, num_seg_queries=0,
                pad_len=n_img + 32)
    batch = {k: np.asarray(v)[None] for k, v in sp.as_dict().items()}
    rng = np.random.default_rng(0)
    batch["images"] = rng.standard_normal((1, s, s, 3)).astype(np.float32)
    if BATCH > 1:
        batch = {k: np.repeat(v, BATCH, axis=0) for k, v in batch.items()}
    return batch


def steady_scan_rate(gen, batch, k1=16, k2=144, reps=3):
    """Steady-state decode tok/s via the in-program difference method
    (VERDICT r4 #5): ONE decode_chunk dispatch runs k sampled decode steps
    under lax.scan with the (logits, pos, caches, rng) carry chaining them —
    a real data dependency XLA cannot hoist. (T_k2 - T_k1)/(k2 - k1) cancels
    the per-dispatch RPC floor and download cost exactly like
    scripts/scan_timer.py, replacing the half-length request-difference
    estimate whose tunnel-jitter amplification made the r4 batch x chunk
    table non-monotone (BASELINE.md)."""
    B = batch["tok_ids"].shape[0]
    caches = gen.model.apply(
        gen.variables, B, gen.max_len,
        method=lambda m, b, s: m.phi.model.init_cache(b, s, gen.cache_dtype))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ("tok_ids", "src_type", "src_idx", "attention_mask",
                       "images")}
    logits, caches, pos = gen._prefill(gen.variables, jbatch, caches)
    rng = jax.random.PRNGKey(0)
    temp = jnp.zeros((B,), jnp.float32)

    def run(k):
        nonlocal logits, pos, caches, rng
        t0 = time.perf_counter()
        toks, logits, pos, caches, rng = gen._decode_chunk(
            gen.variables, logits, pos, caches, rng, temp, k)
        np.asarray(toks)  # host materialization = the reliable sync
        return time.perf_counter() - t0

    run(k1)  # compile both lengths (donated caches thread through)
    run(k2)
    per = []
    for _ in range(reps):
        t1 = run(k1)
        t2 = run(k2)
        per.append((t2 - t1) / (k2 - k1))
    dt_tok = sorted(per)[len(per) // 2]
    return B / max(dt_tok, 1e-9)


def bench_variant(name, quant_bits, cast_bf16, chunks=(16, 32, 64, 128),
                  storage="packed"):
    import dataclasses
    cfg = PSALMConfig(compute_dtype="bfloat16")
    if quant_bits:
        cfg = cfg.replace(phi=dataclasses.replace(
            cfg.phi, quant_bits=quant_bits, quant_storage=storage))
    model = PSALM(cfg, dtype=jnp.bfloat16)
    # float init (quant_bits=0) for weight minting, then quantize/cast
    model_f = PSALM(cfg.replace(phi=dataclasses.replace(cfg.phi,
                                                        quant_bits=0)),
                    dtype=jnp.bfloat16)
    variables, _ = make_variables(cfg.replace(
        phi=dataclasses.replace(cfg.phi, quant_bits=0)), model_f)
    if quant_bits == 8:
        from psalm_tpu.models.quant import quantize_phi_int8
        variables = jax.device_put(quantize_phi_int8(
            jax.tree.map(np.asarray, variables)))
    if quant_bits == 4:
        from psalm_tpu.models.quant import quantize_phi_int4
        variables = jax.device_put(quantize_phi_int4(
            jax.tree.map(np.asarray, variables), storage=storage))
    if cast_bf16:
        def cast(x):
            return (x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x)
        variables = jax.tree.map(cast, variables)

    gen = Generator(model, variables, max_len=MAX_LEN)
    batch = gen_batch(cfg)
    out = {}
    # one chunk-independent device-true steady rate (scan-difference)
    steady = steady_scan_rate(gen, batch)
    out["steady_scan"] = round(steady, 1)
    print(f"[{name}] steady-state decode (scan-difference, device): "
          f"{steady:.1f} tok/s aggregate", file=sys.stderr)
    for chunk in chunks:
        t0 = time.perf_counter()
        toks = gen.generate(batch, max_new_tokens=NEW_TOKENS,
                            chunk_size=chunk)
        warm = time.perf_counter() - t0  # includes compile
        # full-request rate (prefill + decode + dispatch overheads in the
        # denominator) — the number the serving (B, chunk) choice is made
        # from, since the chunk size only changes dispatch amortization
        reqs = []
        for _ in range(3):
            t0 = time.perf_counter()
            toks = gen.generate(batch, max_new_tokens=NEW_TOKENS,
                                chunk_size=chunk)
            reqs.append(time.perf_counter() - t0)
        dt = sorted(reqs)[len(reqs) // 2]
        tps = toks.shape[0] * toks.shape[1] / dt  # aggregate over batch
        out[chunk] = {"request": round(tps, 1)}
        print(f"[{name}] chunk={chunk}: {tps:.1f} tok/s request "
              f"(median of 3; first incl compile {warm:.1f}s)",
              file=sys.stderr)
    return out


def main():
    results = {}
    variants = sys.argv[1:] or ["bf16", "int8", "f32"]
    for v in variants:
        if v == "f32":
            results["f32"] = bench_variant("f32", 0, False)
        elif v == "bf16":
            results["bf16"] = bench_variant("bf16", 0, True)
        elif v == "int8":
            results["int8"] = bench_variant("int8", 8, True)
        elif v == "int4":
            results["int4"] = bench_variant("int4", 4, True)
        elif v == "int4n":
            results["int4n"] = bench_variant("int4n", 4, True,
                                             storage="native")
        elif v == "int4p":
            results["int4p"] = bench_variant("int4p", 4, True,
                                             storage="pallas")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
