"""Weight-only int8 load (bnb load_in_8bit analog, models/quant.py):
quantize-then-apply accuracy, QLoRA composition with the finetune mask, and
the builder flag."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.phi import PhiModel
from psalm_tpu.models.quant import (QUANT_LAYER_NAMES, quantize_kernel,
                                    quantize_phi_int8)


def _phi_setup(lora_rank=0, quant=False, seed=0):
    cfg = tiny_test_config().phi
    cfg = dataclasses.replace(cfg, lora_rank=lora_rank,
                              quant_bits=8 if quant else 0)
    model = PhiModel(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, 12, cfg.hidden_size) * 0.5, jnp.float32)
    mask = jnp.ones((1, 12), jnp.int32)
    return cfg, model, x, mask


def test_quantize_kernel_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    k = rng.randn(64, 32).astype(np.float32)
    q, scale = quantize_kernel(k)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale[None, :]
    # symmetric 127-level quantization: |err| <= scale/2 per element
    assert (np.abs(deq - k) <= scale[None, :] * 0.5 + 1e-7).all()


def test_phi_int8_forward_close_to_fp32():
    _, model, x, mask = _phi_setup()
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=x,
                           attention_mask=mask)
    want = model.apply(variables, inputs_embeds=x, attention_mask=mask)[0]

    qcfg, qmodel, _, _ = _phi_setup(quant=True)
    qvars = quantize_phi_int8({"params": {"phi": variables["params"]}})
    got = qmodel.apply({"params": qvars["params"]["phi"]}, inputs_embeds=x,
                       attention_mask=mask)[0]
    rel = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
    assert rel < 0.05, rel
    # and it is genuinely int8 underneath
    leaf = qvars["params"]["phi"]["layers_0"]["self_attn"]["q_proj"]
    assert leaf["kernel_q"].dtype == jnp.int8
    assert "kernel" not in leaf


def test_qlora_structure_and_finetune_partition():
    """Quantized base + LoRA adapters: adapters train, int8 base freezes."""
    from psalm_tpu.train.lora import partition_params, psalm_finetune_mask

    cfg, model, x, mask = _phi_setup(lora_rank=4, quant=True)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=x,
                           attention_mask=mask)
    node = variables["params"]["layers_0"]["self_attn"]["q_proj"]
    assert set(node) == {"base", "lora_A", "lora_B"}
    assert node["base"]["kernel_q"].dtype == jnp.int8

    tree = {"phi": variables["params"]}
    mask_tree = psalm_finetune_mask(tree)
    trainable, frozen = partition_params(tree, mask_tree)
    flat_tr = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_flatten_with_path(trainable)[0]}
    assert flat_tr and all("lora" in k for k in flat_tr), list(flat_tr)[:3]
    assert any(v.dtype == jnp.int8 for v in jax.tree.leaves(frozen))
    # grads flow through the quantized base into the adapters
    def loss(tr):
        from psalm_tpu.train.lora import combine_params
        p = combine_params(tr, frozen)
        out = model.apply({"params": p["phi"]}, inputs_embeds=x,
                          attention_mask=mask)[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)
    g = jax.grad(loss)(trainable)
    gn = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert np.isfinite(gn)


def test_builder_load_8bit(tmp_path):
    from test_convert import synthetic_torch_sd
    import torch
    from psalm_tpu.models.builder import load_pretrained_model

    cfg = tiny_test_config()
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          synthetic_torch_sd(cfg, np.random.default_rng(0)).items()}
    torch.save(sd, str(tmp_path / "pytorch_model.bin"))
    _, model, variables, _ = load_pretrained_model(str(tmp_path), cfg=cfg,
                                                   load_8bit=True)
    assert model.cfg.phi.quant_bits == 8
    q = variables["params"]["phi"]["model"]["layers_0"]["self_attn"]["q_proj"]
    assert q["kernel_q"].dtype == jnp.int8
    # embeddings and lm_head stay full precision
    assert variables["params"]["phi"]["lm_head"]["kernel"].dtype != jnp.int8


def test_int4_native_storage_matches_packed():
    """Quant4Dense(storage='native') computes the same outputs as the
    packed-nibble path: identical quantized values + group scales, only
    the storage format differs (jnp.int4 vs int8 nibble pairs)."""
    from psalm_tpu.models.quant import (Quant4Dense, quantize_kernel_int4,
                                        quantize_kernel_int4_native)
    rng = np.random.RandomState(0)
    in_f, out_f, group = 128, 96, 32
    k = rng.randn(in_f, out_f).astype(np.float32) * 0.05
    bias = rng.randn(out_f).astype(np.float32) * 0.01
    x = jnp.asarray(rng.randn(3, in_f), jnp.float32)

    packed, scale_p = quantize_kernel_int4(k, group)
    q4n, scale_n = quantize_kernel_int4_native(k, group)
    np.testing.assert_array_equal(scale_p, scale_n)

    dp = Quant4Dense(out_f, group=group)
    dn = Quant4Dense(out_f, group=group, storage="native")
    yp = dp.apply({"params": {"kernel_q4": jnp.asarray(packed),
                              "scale": jnp.asarray(scale_p),
                              "bias": jnp.asarray(bias)}}, x)
    yn = dn.apply({"params": {"kernel_q4n": q4n,
                              "scale": jnp.asarray(scale_n),
                              "bias": jnp.asarray(bias)}}, x)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yn),
                               rtol=1e-5, atol=1e-5)


def test_int4_pallas_storage_matches_packed():
    """Quant4Dense(storage='pallas') dispatches decode-shaped calls to the
    ops/int4_matvec.py kernel (interpret mode on CPU) and prefill-shaped
    calls to the packed einsum math; both agree with the packed path to
    bf16/f32 compute-order tolerance on the same param tree."""
    from psalm_tpu.models.quant import Quant4Dense, quantize_kernel_int4
    rng = np.random.RandomState(0)
    in_f, out_f, group = 256, 128, 64
    k = rng.randn(in_f, out_f).astype(np.float32) * 0.05
    bias = rng.randn(out_f).astype(np.float32) * 0.01
    packed, scale = quantize_kernel_int4(k, group)
    params = {"params": {"kernel_q4": jnp.asarray(packed),
                         "scale": jnp.asarray(scale),
                         "bias": jnp.asarray(bias)}}
    dp = Quant4Dense(out_f, group=group, dtype=jnp.float32)
    dk = Quant4Dense(out_f, group=group, dtype=jnp.float32,
                     storage="pallas")
    for rows in (1, 3, 64):  # decode-shaped (kernel) and prefill (fallback)
        x = jnp.asarray(rng.randn(rows, in_f), jnp.float32)
        yp = dp.apply(params, x)
        yk = dk.apply(params, x)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yp),
                                   rtol=2e-2, atol=2e-3)
    # leading batch dims flatten into rows
    xb = jnp.asarray(rng.randn(2, 4, in_f), jnp.float32)
    np.testing.assert_allclose(np.asarray(dk.apply(params, xb)),
                               np.asarray(dp.apply(params, xb)),
                               rtol=2e-2, atol=2e-3)


def test_quantize_phi_int4_native_tree():
    from psalm_tpu.models.quant import quantize_phi_int4
    cfg, model, x, mask = _phi_setup()
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=x,
                           attention_mask=mask)
    qv = quantize_phi_int4(
        {"params": {"phi": jax.tree.map(np.asarray, variables)["params"]}},
        storage="native")
    leaves = jax.tree.leaves(qv)
    assert any(getattr(l, "dtype", None) == jnp.int4 for l in leaves)
    # the native-storage model consumes the converted tree
    qcfg = dataclasses.replace(cfg, quant_bits=4, quant_storage="native")
    qmodel = PhiModel(qcfg)
    y = qmodel.apply({"params": qv["params"]["phi"]}, inputs_embeds=x,
                     attention_mask=mask)[0]
    assert np.isfinite(np.asarray(y, np.float32)).all()
