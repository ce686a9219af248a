"""Static request batching (serve/batching.py): batched decode must emit
exactly what each request would get solo (greedy), honor per-request
max_new_tokens, and actually group concurrent requests into one call."""
import threading

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.models.generation import Generator
from psalm_tpu.serve.batching import BatchedGenerator
import __graft_entry__ as ge


def _setup():
    cfg = tiny_test_config()
    model = PSALM(cfg)
    K = 3
    b2 = ge._panoptic_batch(cfg, B=2, num_classes=K)
    variables = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                                num_class_names=K))(
        jax.random.PRNGKey(0), b2)
    gen = Generator(model, variables, max_len=b2["tok_ids"].shape[1] + 16,
                    cache_dtype=jnp.float32)
    # two distinct single-sample requests (different token ids)
    r0 = {k: np.asarray(v)[:1] for k, v in b2.items()}
    r1 = {k: np.asarray(v)[1:2].copy() for k, v in b2.items()}
    r1["tok_ids"] = r1["tok_ids"].copy()
    r1["tok_ids"][0, 0] = 7  # make the prompts differ
    return gen, r0, r1


def test_batched_matches_solo_and_groups():
    gen, r0, r1 = _setup()
    solo0 = gen.generate(r0, max_new_tokens=6)[0]
    solo1 = gen.generate(r1, max_new_tokens=6)[0]

    bg = BatchedGenerator(gen, eos_id=None, max_batch=2, window_s=0.5,
                          chunk_size=2)
    calls = []
    real_generate = gen.generate

    def counting_generate(*a, **k):
        calls.append(k.get("max_new_tokens"))
        return real_generate(*a, **k)

    gen.generate = counting_generate
    try:
        results = {}

        def run(name, req, n):
            results[name] = [int(t) for t in bg.submit(req, n)]

        t0 = threading.Thread(target=run, args=("a", r0, 6))
        t1 = threading.Thread(target=run, args=("b", r1, 3))
        t0.start(); t1.start(); t0.join(timeout=300); t1.join(timeout=300)
    finally:
        gen.generate = real_generate

    assert len(calls) == 1, f"expected ONE batched call, got {calls}"
    assert calls[0] == 6  # group max of (6, 3)
    np.testing.assert_array_equal(results["a"], np.asarray(solo0[:6]))
    # request b truncated to its own budget
    np.testing.assert_array_equal(results["b"], np.asarray(solo1[:3]))


def test_per_sequence_temperature_row0_greedy():
    gen, r0, r1 = _setup()
    solo0 = gen.generate(r0, max_new_tokens=4)[0]
    bg = BatchedGenerator(gen, eos_id=None, max_batch=2, window_s=0.5,
                          chunk_size=2)
    results = {}

    def run(name, req, temp):
        results[name] = [int(t) for t in bg.submit(req, 4, temperature=temp)]

    t0 = threading.Thread(target=run, args=("greedy", r0, 0.0))
    t1 = threading.Thread(target=run, args=("sampled", r1, 0.9))
    t0.start(); t1.start(); t0.join(timeout=300); t1.join(timeout=300)

    # the greedy row is unaffected by its sampled neighbor
    np.testing.assert_array_equal(results["greedy"], np.asarray(solo0[:4]))
    assert len(results["sampled"]) == 4
