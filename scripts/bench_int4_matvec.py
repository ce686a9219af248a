"""Decode-matvec precision shootout: bf16 / int8 / int4 variants.

The serving decode step is HBM-bound on weight reads (BASELINE.md roofline:
int8 1.8 GB/token -> 455 tok/s bound). int4 halves the Phi weight bytes
again, but the manual nibble-unpack (models/quant.py Quant4Dense) measured
SLOWER than int8 because the shifts don't fuse into the dot's operand load.
This bench isolates the matvec to rank the fixes:

  bf16          x[1,K] @ W[K,N] bf16                      (baseline)
  int8          (x @ W_q.astype(bf16)) * scale            (serving default)
  int4_manual   Quant4Dense math (half-split nibble path)
  int4_native   W stored as jnp.int4 [K,N], astype(bf16) in the dot --
                XLA packs int4 2/byte in HBM and owns the unpack
  int4_native_group  int4 native storage with per-group partial-dot scales
                (the Quant4Dense quantization quality at native speed)

Each variant runs under one lax.scan dispatch of STEPS matvecs (decode's
shape) cycling through L distinct weight copies sized so every step misses
VMEM and pays the HBM read, like a real 24-layer decode step does.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int4_matvec.py
"""
import json
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import os

STEPS = 48
GROUP = 64
MIN_CYCLE_BYTES = 128 << 20  # weight-copy cycle must exceed VMEM by far
SHAPES = [(2048, 6144), (2048, 2048), (2048, 8192), (8192, 2048),
          (2048, 51200)]
if os.environ.get("PSALM_I4_SMOKE"):  # CPU trace/correctness smoke
    STEPS = 4
    MIN_CYCLE_BYTES = 1
    SHAPES = [(256, 384)]


def scan_time(fn, x, ws, iters=5):
    """Median per-step time of lax.scan(STEPS) over fn(carry, *ws[i]).

    ws: list of per-copy weight tuples; stacked on a leading L axis and
    indexed per step so each application reads fresh weights from HBM."""
    L = len(ws)
    stacked = [jnp.stack([w[j] for w in ws]) for j in range(len(ws[0]))]
    idx = jnp.asarray(np.arange(STEPS) % L, jnp.int32)

    def body(carry, i):
        wsel = [jax.lax.dynamic_index_in_dim(s, i, keepdims=False)
                for s in stacked]
        y = fn(carry, *wsel)
        if y.shape[-1] >= carry.shape[-1]:
            upd = y[..., : carry.shape[-1]]
        else:
            upd = jnp.pad(y, ((0, 0), (0, carry.shape[-1] - y.shape[-1])))
        return (carry + upd.astype(carry.dtype) * 1e-6), ()

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(body, x, idx)
        return out

    jax.block_until_ready(run(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(x)).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] / STEPS


def copies_for(bytes_per_copy):
    return max(2, int(math.ceil(MIN_CYCLE_BYTES / max(1, bytes_per_copy))))


def main():
    from psalm_tpu.models.quant import quantize_kernel_int4
    rng = np.random.RandomState(0)
    results = {}
    for K, N in SHAPES:
        x = jnp.asarray(rng.randn(1, K), jnp.bfloat16)
        row = {}
        group = math.gcd(K // 2, GROUP)
        G = K // group

        def make(seed):
            return rng.randn(K, N).astype(np.float32) * 0.02

        # ---- bf16 ----
        L = copies_for(K * N * 2)
        ws = []
        base = [make(i) for i in range(min(L, 4))]
        for i in range(L):
            ws.append((jnp.asarray(base[i % len(base)], jnp.bfloat16),))
        row["bf16"] = scan_time(lambda c, W: c @ W, x, ws)

        # ---- int8 per-out-channel ----
        L = copies_for(K * N)
        ws = []
        for i in range(L):
            w = base[i % len(base)]
            amax = np.abs(w).max(0)
            s8 = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q8 = np.clip(np.round(w / s8), -127, 127).astype(np.int8)
            ws.append((jnp.asarray(q8), jnp.asarray(s8, jnp.bfloat16)))
        row["int8"] = scan_time(
            lambda c, Q, S: (c @ Q.astype(jnp.bfloat16)) * S, x, ws)

        # ---- int4 manual (Quant4Dense half-split math) ----
        L = copies_for(K * N // 2)
        ws = []
        for i in range(L):
            packed, sg = quantize_kernel_int4(base[i % len(base)], GROUP)
            ws.append((jnp.asarray(packed), jnp.asarray(sg, jnp.float32)))

        def manual(c, P, S):
            low = jnp.right_shift(jnp.left_shift(P, 4), 4)
            high = jnp.right_shift(P, 4)
            xg = c.reshape(1, 2, G // 2, group)
            kl = low.reshape(G // 2, group, N).astype(jnp.bfloat16)
            kh = high.reshape(G // 2, group, N).astype(jnp.bfloat16)
            pl_ = jnp.einsum("bgd,gdo->bgo", xg[:, 0], kl)
            ph = jnp.einsum("bgd,gdo->bgo", xg[:, 1], kh)
            part = jnp.concatenate([pl_, ph], axis=1)
            return jnp.einsum("bgo,go->bo", part, S.astype(part.dtype))

        row["int4_manual"] = scan_time(manual, x, ws)

        # ---- int4 native dtype, per-out-channel scale ----
        # jnp.int4 array CREATION itself can fail on some backends (the
        # tunneled axon runtime recursively jits the eager S4 convert), so
        # the guard wraps construction too
        L = copies_for(K * N // 2)
        try:
            ws = []
            for i in range(L):
                w = base[i % len(base)]
                amax4 = np.abs(w).max(0)
                s4 = np.where(amax4 > 0, amax4 / 7.0, 1.0).astype(np.float32)
                q4 = np.clip(np.round(w / s4), -7, 7).astype(np.int8)
                ws.append((jnp.asarray(q4, jnp.int4),
                           jnp.asarray(s4, jnp.bfloat16)))
            row["int4_native"] = scan_time(
                lambda c, Q, S: (c @ Q.astype(jnp.bfloat16)) * S, x, ws)
        except Exception as e:  # noqa: BLE001 — backend may lack int4
            print(f"  int4_native failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            row["int4_native"] = -1.0

        # ---- int4 native storage + per-group partial-dot scales ----
        def native_g(c, Q, S):
            xg = c.reshape(1, G, group)
            kq = Q.reshape(G, group, N).astype(jnp.bfloat16)
            part = jnp.einsum("bgd,gdo->bgo", xg, kq)
            return jnp.einsum("bgo,go->bo", part, S.astype(part.dtype))

        try:
            ws = []
            for i in range(L):
                w = base[i % len(base)]
                kg = w.reshape(G, group, N)
                amaxg = np.abs(kg).max(1)
                sgr = np.where(amaxg > 0, amaxg / 7.0, 1.0).astype(np.float32)
                qg = np.clip(np.round(kg / sgr[:, None, :]), -7, 7)
                ws.append((jnp.asarray(qg.reshape(K, N).astype(np.int8),
                                       jnp.int4),
                           jnp.asarray(sgr, jnp.float32)))
            row["int4_native_group"] = scan_time(native_g, x, ws)
        except Exception as e:  # noqa: BLE001
            print(f"  int4_native_group failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            row["int4_native_group"] = -1.0

        # ---- int4 Pallas VMEM-unpack kernel (ops/int4_matvec.py) ----
        from psalm_tpu.ops.int4_matvec import (int4_matvec,
                                               int4_matvec_supported)
        L = copies_for(K * N // 2)
        ws = []
        for i in range(L):
            packed, sg = quantize_kernel_int4(base[i % len(base)], GROUP)
            ws.append((jnp.asarray(packed), jnp.asarray(sg, jnp.float32)))
        if int4_matvec_supported(1, K, N, group):
            interp = jax.default_backend() == "cpu"
            try:
                row["int4_pallas"] = scan_time(
                    lambda c, P, S: int4_matvec(c, P, S, group,
                                                interpret=interp), x, ws)
            except Exception as e:  # noqa: BLE001
                print(f"  int4_pallas failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                row["int4_pallas"] = -1.0
        else:
            row["int4_pallas"] = -1.0

        key = f"{K}x{N}"
        results[key] = {k: round(v * 1e6, 1) for k, v in row.items()}
        print(f"{key}: " + "  ".join(
            f"{k}={v * 1e6:7.1f}us" for k, v in row.items()),
            file=sys.stderr)
        bts = {"bf16": K * N * 2, "int8": K * N, "int4": K * N // 2}
        print("  roofline us: " + "  ".join(
            f"{k}={b / 819e9 * 1e6:6.1f}" for k, b in bts.items()),
            file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
