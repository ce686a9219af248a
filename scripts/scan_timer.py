"""In-program lax.scan difference timing — device ms/op on any backend.

One dispatch runs `fn` k times inside lax.scan with a carry-dependent ~0
perturbation on the first float leaf of the perturbed argument (a real data
dependency XLA cannot constant-fold or hoist), timed against a k=1 run of
the same program; (T_k - T_1)/(k-1) cancels the per-dispatch RPC floor and
the result download of the sandbox's tunneled runtime, isolating what the
chip does per iteration. Robust to overlapped-dispatch degradation by
construction (single dispatch) — the pathology that collapsed BENCH_r03.
"""
import time

import jax
import jax.numpy as jnp


def scan_rate_ms(fn, *args, k: int = 8, reps: int = 3,
                 perturb_arg: int = 0) -> float:
    """Median device milliseconds per `fn(*args)` call.

    perturb_arg is accepted for API compatibility but unused: the body is
    made un-hoistable with lax.optimization_barrier over (args..., carry) —
    the barrier op depends on the loop carry, so every barrier output is
    loop-variant and the computation consuming them cannot be moved out of
    the loop. (An additive ~0 perturbation of one input leaf is NOT safe:
    if that particular leaf is dead in the stage — e.g. the first flax
    param leaf of a module the stage never reads — XLA DCEs the add and
    then hoists the now-invariant body, which is how the first round-4
    breakdown read 0 ms for every stage.)"""

    def one(*a):
        out = fn(*a)
        s = jnp.float32(0)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype"):
                s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    def run_k(length, *a):
        def body(c, _):
            tied = jax.lax.optimization_barrier((a, c))
            return one(*tied[0]) + 0.0 * tied[1], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    jitted = jax.jit(run_k, static_argnums=0)

    def sync(x):
        # block_until_ready can return before execution completes on the
        # tunneled axon runtime; materializing the scalar on the host is
        # the only reliable sync there
        return float(x)

    for length in (1, k):
        sync(jitted(length, *args))
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(jitted(1, *args))
        t1 = time.perf_counter()
        sync(jitted(k, *args))
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    return sorted(per)[len(per) // 2] * 1e3
