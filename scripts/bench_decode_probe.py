"""Decode-step cost bisection: where do the per-token ms go?

Times, with real jit arguments on the live chip:
  decode_chunk   the shipped chunked decode (k tokens / dispatch)
  mat_proxy      the same per-token weight reads as pure matmuls
                 (24 x [qkv+dense+fc1+fc2] + lm_head), k steps via scan
  attn_proxy     the per-token KV-cache attention reads alone, k steps

If decode_chunk >> mat_proxy + attn_proxy the overhead is in program
structure (cache update pattern, bias build, scan carry), not bandwidth.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode_probe.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = int(os.environ.get("PSALM_PROBE_CHUNK", "32"))
ITERS = int(os.environ.get("PSALM_PROBE_ITERS", "6"))


def sync(out):
    # block_until_ready does not actually sync on the tunneled axon
    # backend; downloading a scalar does.
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timed(fn, *args, iters=ITERS, warmup=2, label=""):
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(f"  {label:<14} {p50 * 1e3:8.1f} ms  ({p50 * 1e3 / K:.2f} ms/tok)",
          file=sys.stderr)
    return p50


def main():
    from psalm_tpu.config import PSALMConfig
    cfg = PSALMConfig(compute_dtype="bfloat16").phi
    D, F, V, H, HD, NL, S = (cfg.hidden_size, cfg.intermediate_size,
                             cfg.vocab_size, cfg.num_heads, cfg.head_dim,
                             cfg.num_layers, 2048)
    rng = np.random.default_rng(0)

    # ---- matmul proxy: identical weight traffic, zero attention ----------
    Ws = [dict(qkv=jnp.asarray(rng.standard_normal((D, 3 * D)) * .02,
                               jnp.bfloat16),
               dense=jnp.asarray(rng.standard_normal((D, D)) * .02,
                                 jnp.bfloat16),
               fc1=jnp.asarray(rng.standard_normal((D, F)) * .02,
                               jnp.bfloat16),
               fc2=jnp.asarray(rng.standard_normal((F, D)) * .02,
                               jnp.bfloat16)) for _ in range(NL)]
    head = jnp.asarray(rng.standard_normal((D, V)) * .02, jnp.bfloat16)

    def mat_step(x, Ws, head):
        for w in Ws:
            a = x @ w["qkv"]
            x = x + a[:, :D] @ w["dense"] + jnp.tanh(x @ w["fc1"]) @ w["fc2"]
        return (x @ head).astype(jnp.float32)

    def mat_chunk(x, Ws, head):
        def body(c, _):
            x = c
            lg = mat_step(x, Ws, head)
            return x + lg[:, :D].astype(jnp.bfloat16) * 0, lg
        c, ys = jax.lax.scan(body, x, None, length=K)
        return ys[-1]

    x0 = jnp.asarray(rng.standard_normal((1, D)), jnp.bfloat16)
    mat_j = jax.jit(mat_chunk)
    timed(mat_j, x0, Ws, head, label="mat_proxy")

    # ---- attention proxy: KV reads alone ---------------------------------
    ck = [jnp.asarray(rng.standard_normal((1, H, HD, S)), jnp.bfloat16)
          for _ in range(NL)]
    cv = [jnp.asarray(rng.standard_normal((1, H, HD, S)), jnp.bfloat16)
          for _ in range(NL)]

    def attn_step(q, ck, cv):
        outs = q
        for k_, v_ in zip(ck, cv):
            a = jnp.einsum("bhld,bhds->bhls", outs, k_,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a / 8.0, axis=-1).astype(jnp.bfloat16)
            outs = jnp.einsum("bhls,bhds->bhld", a, v_,
                              preferred_element_type=jnp.bfloat16)
        return outs

    def attn_chunk(q, ck, cv):
        def body(c, _):
            return attn_step(c, ck, cv), None
        c, _ = jax.lax.scan(body, q, None, length=K)
        return c

    q0 = jnp.asarray(rng.standard_normal((1, H, 1, HD)), jnp.bfloat16)
    attn_j = jax.jit(attn_chunk)
    timed(attn_j, q0, ck, cv, label="attn_proxy")

    # ---- the real decode_chunk ------------------------------------------
    from scripts.bench_decode import make_variables, gen_batch
    from psalm_tpu.config import PSALMConfig as PC
    from psalm_tpu.models.generation import Generator
    from psalm_tpu.models.psalm import PSALM
    fcfg = PC(compute_dtype="bfloat16")
    model = PSALM(fcfg, dtype=jnp.bfloat16)
    variables, _ = make_variables(fcfg, model)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    gen = Generator(model, variables, max_len=S)
    batch = gen_batch(fcfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k in ("tok_ids", "src_type", "src_idx", "attention_mask",
                   "images")}
    caches = model.apply(variables, 1, S,
                         method=lambda m, b, s: m.phi.model.init_cache(
                             b, s, jnp.bfloat16))
    logits, caches, pos = gen._prefill(variables, jb, caches)
    temp = jnp.float32(0.0)
    key = jax.random.PRNGKey(0)

    def chunk_once(logits, pos, caches, key):
        toks, lg, p, c, k = gen._decode_chunk(variables, logits, pos, caches,
                                              key, temp, K)
        return toks

    # donation consumes caches; re-make per call outside the timer when on
    donate = os.environ.get("PSALM_DECODE_DONATE", "1") == "1"

    def time_gen(gen, label):
        if donate:
            def run():
                c = jax.tree.map(jnp.copy, caches)
                sync(c)  # settle the copy before timing
                t0 = time.perf_counter()
                sync(gen._decode_chunk(
                    gen.variables, logits, pos, c, key, temp, K)[0])
                return time.perf_counter() - t0
            for _ in range(2):
                run()
            times = sorted(run() for _ in range(ITERS))
            p50 = times[ITERS // 2]
            print(f"  {label:<14} {p50 * 1e3:8.1f} ms  "
                  f"({p50 * 1e3 / K:.2f} ms/tok) [donate]", file=sys.stderr)
        else:
            timed(lambda l, p, c, k: gen._decode_chunk(
                gen.variables, l, p, c, k, temp, K)[0],
                logits, pos, caches, key, label=label)

    time_gen(gen, "decode_chunk")

    # ---- dispatch-overhead floor: trivial program, full variables tree ----
    triv = jax.jit(lambda v, t: t + 1)
    timed(triv, variables, jnp.zeros((1,), jnp.int32), label="dispatch_vars")
    triv2 = jax.jit(lambda t: t + 1)
    timed(triv2, jnp.zeros((1,), jnp.int32), label="dispatch_min")

    # ---- quantized variants ----------------------------------------------
    for bits in (8, 4):
        import dataclasses
        from psalm_tpu.models.quant import (quantize_phi_int8,
                                            quantize_phi_int4)
        qcfg = fcfg.replace(phi=dataclasses.replace(fcfg.phi,
                                                    quant_bits=bits))
        qmodel = PSALM(qcfg, dtype=jnp.bfloat16)
        qfn = quantize_phi_int8 if bits == 8 else quantize_phi_int4
        qvars = jax.device_put(qfn(jax.tree.map(np.asarray, variables)))
        qgen = Generator(qmodel, qvars, max_len=S)
        time_gen(qgen, f"decode_int{bits}")


if __name__ == "__main__":
    main()
