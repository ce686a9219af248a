"""Training step: optax AdamW + cosine schedule, pjit data parallelism with
ZeRO-style sharded optimizer state.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-2 engine
(train.py:455-462, scripts/zero2.json): grads are averaged by pjit-inserted
reduce-scatter/all-gather over the 'data' mesh axis; the Adam moments are
sharded across 'data' (the ZeRO-2 analog) via out_shardings; bf16 compute
with f32 params needs no loss scaling.

Recipe defaults follow scripts/train.sh:23-35 — lr 6e-5 cosine, warmup ratio
0.03, weight decay 0, grad clip off in the shipped recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def make_optimizer(lr: float = 6e-5, total_steps: int = 100_000,
                   warmup_ratio: float = 0.03, weight_decay: float = 0.0,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    warmup = int(total_steps * warmup_ratio)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(warmup, 1),
        decay_steps=total_steps, end_value=0.0)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=weight_decay))
    return optax.chain(*chain)


def zero_shard_spec(mesh: Mesh, tree) -> Any:
    """ZeRO-style sharding for param-shaped arrays (Adam moments included):
    partition the first axis divisible by the 'data' mesh size; replicate
    scalars and indivisible shapes."""
    n = mesh.shape["data"]

    def spec(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        for axis, size in enumerate(x.shape):
            if size % n == 0 and size >= n:
                parts = [None] * x.ndim
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def opt_state_sharding(mesh: Mesh, opt_state, params=None) -> Any:
    return zero_shard_spec(mesh, opt_state)


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True):
    """loss_fn(params, batch, rng) -> (scalar_loss, metrics dict).

    Returns a jitted step(state, batch, rng) -> (state, metrics). When a mesh
    is given, batch must be sharded over 'data' and the optimizer state is
    placed with ZeRO sharding by the caller at init.
    """

    def step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_state(params, tx: optax.GradientTransformation,
               mesh: Optional[Mesh] = None) -> TrainState:
    opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)
    if mesh is not None:
        opt_sh = opt_state_sharding(mesh, opt_state, params)
        rep = NamedSharding(mesh, P())
        state = TrainState(
            jax.device_put(state.step, rep),
            jax.device_put(state.params, jax.tree.map(
                lambda _: rep, state.params)),
            jax.device_put(state.opt_state, opt_sh),
        )
    return state
