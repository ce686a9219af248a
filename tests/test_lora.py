"""LoRA: zero-init equivalence with the base model, base grafting, frozen
training, and merge-export equivalence."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.phi import PhiForCausalLM
from psalm_tpu.train.lora import (graft_base_params, lora_mask,
                                  lora_optimizer, merge_lora)


def _cfgs():
    base = tiny_test_config().phi
    lora = dataclasses.replace(base, lora_rank=4)
    return base, lora


def test_lora_zero_init_matches_base_after_graft():
    base_cfg, lora_cfg = _cfgs()
    base_model = PhiForCausalLM(base_cfg)
    lora_model = PhiForCausalLM(lora_cfg)
    ids = jnp.arange(12).reshape(1, 12) % base_cfg.vocab_size

    base_params = base_model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    lora_params = lora_model.init(jax.random.PRNGKey(1), input_ids=ids)["params"]
    grafted = graft_base_params(lora_params, base_params)

    want, _, _ = base_model.apply({"params": base_params}, input_ids=ids)
    got, _, _ = lora_model.apply({"params": grafted}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # merge-export reproduces the adapted model exactly when B != 0
    bumped = jax.tree_util.tree_map_with_path(
        lambda kp, x: x + 0.01 if any(getattr(k, "key", "") == "lora_B"
                                      for k in kp) else x, grafted)
    adapted, _, _ = lora_model.apply({"params": bumped}, input_ids=ids)
    merged = merge_lora(jax.tree.map(np.asarray, bumped),
                        alpha=lora_cfg.lora_alpha)
    merged_out, _, _ = base_model.apply(
        {"params": jax.tree.map(jnp.asarray, merged)}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(merged_out), np.asarray(adapted),
                               rtol=1e-4, atol=1e-4)


def test_lora_optimizer_freezes_base():
    _, lora_cfg = _cfgs()
    model = PhiForCausalLM(lora_cfg)
    ids = jnp.arange(8).reshape(1, 8) % lora_cfg.vocab_size
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    tx = lora_optimizer(optax.sgd(0.1), params)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits, _, _ = model.apply({"params": p}, input_ids=ids)
        return jnp.sum(logits ** 2) * 1e-6

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    mask = lora_mask(params)
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = {tuple(kp): v for kp, v
                in jax.tree_util.tree_flatten_with_path(new_params)[0]}
    flat_mask = {tuple(kp): v for kp, v
                 in jax.tree_util.tree_flatten_with_path(mask)[0]}
    changed_frozen = 0
    changed_lora = 0
    for kp, old in flat_old:
        diff = float(jnp.abs(flat_new[tuple(kp)] - old).max())
        if flat_mask[tuple(kp)]:
            changed_lora += diff > 0
        else:
            changed_frozen += diff > 0
    assert changed_frozen == 0
    assert changed_lora > 0  # lora_A gets gradients (B is zero but A's grad
    # flows through B... actually B grads flow; at least some lora leaf moves
