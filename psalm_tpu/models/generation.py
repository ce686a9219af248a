"""Autoregressive generation for the chat/serve path.

The reference serves chat through HF ``generate`` with a KV cache
(model_worker.py:122-192; the 1-token decode re-enters the multimodal
preparer's early-exit branch, llava_phi.py:773-778). Here: one jitted prefill
over the spliced multimodal sequence, then a jitted single-token decode step
reused across positions — static shapes, no per-step retrace.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


class Generator:
    def __init__(self, model, variables, max_len: int = 2048,
                 cache_dtype=jnp.bfloat16):
        self.model = model
        self.variables = variables
        self.max_len = max_len
        self.cache_dtype = cache_dtype

        def prefill(variables, batch, caches):
            seq = model.apply(
                variables, batch["tok_ids"], batch["src_type"],
                batch["src_idx"],
                model.apply(variables, batch["images"],
                            method=lambda m, im: m.encode_images(im)[1]),
                method=lambda m, t, st, si, it: m.assemble_embeddings(
                    t, st, si, it))
            L = seq.shape[1]
            positions = jnp.broadcast_to(jnp.arange(L), seq.shape[:2])
            logits, hidden, caches = model.apply(
                variables, seq, positions=positions, caches=caches,
                method=lambda m, e, positions, caches: m.phi(
                    e, positions=positions, caches=caches))
            # last non-pad position's logits
            last = jnp.sum(batch["attention_mask"].astype(jnp.int32), -1) - 1
            next_logits = jnp.take_along_axis(
                logits, last[:, None, None], axis=1)[:, 0]
            return next_logits, caches, last + 1

        def decode(variables, token, pos, caches):
            emb = model.apply(variables, token[:, None],
                              method=lambda m, t: m.phi.embed(t))
            logits, _, caches = model.apply(
                variables, emb, positions=pos[:, None], caches=caches,
                method=lambda m, e, positions, caches: m.phi(
                    e, positions=positions, caches=caches))
            return logits[:, 0], caches

        def sample(logits, temperature, key):
            # temperature: [B] (a scalar is broadcast by generate()) — per-
            # sequence temperatures let the batching layer mix requests
            greedy = jnp.argmax(logits, -1)
            t = jnp.maximum(temperature, 1e-6)
            drawn = jax.random.categorical(key, logits / t[:, None], axis=-1)
            return jnp.where(temperature > 0, drawn, greedy)

        def decode_chunk(variables, logits, pos, caches, rng, temperature,
                         n_steps):
            """Sample + decode ``n_steps`` tokens in ONE dispatch (lax.scan):
            the per-token host round trip — a ~27 ms RPC on a tunneled TPU,
            and a dispatch latency anywhere — is paid once per chunk."""

            def body(carry, _):
                logits, pos, caches, rng = carry
                rng, k = jax.random.split(rng)
                tok = sample(logits, temperature, k)
                logits, caches = decode(variables, tok, pos, caches)
                return (logits, pos + 1, caches, rng), tok

            (logits, pos, caches, rng), toks = jax.lax.scan(
                body, (logits, pos, caches, rng), None, length=n_steps)
            return jnp.transpose(toks), logits, pos, caches, rng  # [B, K]

        self._prefill = jax.jit(prefill)
        self._decode = jax.jit(decode)
        # donate the KV caches: without aliasing, every chunk dispatch pays a
        # full cache copy before the first in-place update can happen.
        # (PSALM_DECODE_DONATE=0 opts out — useful on runtimes where donated
        # buffers are handled pathologically.)
        import os
        donate = (3,) if os.environ.get("PSALM_DECODE_DONATE", "1") == "1" \
            else ()
        self._decode_chunk = jax.jit(decode_chunk, static_argnums=(6,),
                                     donate_argnums=donate)

    def generate(self, batch: Dict[str, np.ndarray], max_new_tokens: int = 128,
                 temperature: float = 0.0, eos_id: Optional[int] = None,
                 rng: Optional[jax.Array] = None, stream=None,
                 chunk_size: int = 8) -> np.ndarray:
        """chunk_size: tokens decoded per device dispatch. The stream
        callback still receives one [B] array per token; EOS is honored at
        token granularity (tokens past a sequence's EOS are dropped)."""
        # clamp: chunk_size flows in from client requests (model_worker);
        # 0 would loop forever, negatives raise inside lax.scan, and each
        # distinct value is a static jit arg -> a fresh compile, so cap it.
        # Cap 128: on a tunneled runtime each dispatch carries a ~100 ms
        # arg-marshaling/RPC floor, so one dispatch per max_new_tokens=128
        # request is the sweet spot; EOS past-end tokens are wasted work but
        # decode is ~6 ms/token vs the floor.
        chunk_size = max(1, min(int(chunk_size), 128))
        B = batch["tok_ids"].shape[0]
        caches = self.model.apply(
            self.variables, B, self.max_len,
            method=lambda m, b, s: m.phi.model.init_cache(b, s,
                                                          self.cache_dtype))
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("tok_ids", "src_type", "src_idx", "attention_mask",
                           "images")}
        logits, caches, pos = self._prefill(self.variables, jbatch, caches)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # scalar temperature broadcasts to [B]; an array gives each
        # sequence its own temperature (0 = greedy for that row)
        temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))

        tokens: List[np.ndarray] = []
        done = np.zeros(B, bool)
        remaining = max_new_tokens
        while remaining > 0:
            k = min(chunk_size, remaining)
            chunk, logits, pos, caches, rng = self._decode_chunk(
                self.variables, logits, pos, caches, rng, temp, k)
            chunk_np = np.asarray(chunk)  # [B, k] — one sync per chunk
            remaining -= k
            stop = False
            for j in range(k):
                tok_np = np.where(done, eos_id if eos_id is not None else 0,
                                  chunk_np[:, j])
                tokens.append(tok_np)
                if stream is not None:
                    stream(tok_np)
                if eos_id is not None:
                    done |= tok_np == eos_id
                    if done.all():
                        stop = True
                        break
            if stop:
                break
        return np.stack(tokens, axis=1)
