"""Model loading entry for eval/serve (the reference's
psalm/model/builder.py:27-72 analog).

Accepts either a torch-format HF checkpoint dir (the released PSALM weights,
converted on the fly) or an orbax directory saved by this framework, plus the
HF tokenizer living in the same dir.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from psalm_tpu.config import PSALMConfig, SegTask
from psalm_tpu.models.psalm import PSALM


def load_pretrained_model(model_path: str, seg_task: SegTask = SegTask.PANOPTIC,
                          dtype=jnp.float32, cfg: Optional[PSALMConfig] = None,
                          load_8bit: bool = False, load_4bit: bool = False
                          ) -> Tuple[Any, PSALM, Any, int]:
    """Returns (tokenizer, model, variables, context_len).

    load_8bit / load_4bit: weight-only int8 / packed-int4 Phi linears (the
    reference's bitsandbytes flags, psalm/model/builder.py:31-44; ours is
    models/quant.py — the int4 path is a real group-quantized load, not the
    reference's config-only passthrough).
    """
    if cfg is None:
        # a converted checkpoint dir carries its own config
        # (checkpoint/convert.py main writes psalm_tpu_config.json)
        cfg_path = os.path.join(model_path, "psalm_tpu_config.json")
        if os.path.isdir(model_path) and os.path.exists(cfg_path):
            from psalm_tpu.config import config_from_json
            with open(cfg_path) as f:
                cfg = config_from_json(f.read()).replace(seg_task=seg_task)
        else:
            cfg = PSALMConfig(seg_task=seg_task)
    assert not (load_8bit and load_4bit)
    if load_8bit and cfg.phi.quant_bits != 8:
        import dataclasses
        cfg = cfg.replace(phi=dataclasses.replace(cfg.phi, quant_bits=8))
    if load_4bit and cfg.phi.quant_bits != 4:
        import dataclasses
        cfg = cfg.replace(phi=dataclasses.replace(cfg.phi, quant_bits=4))
    model = PSALM(cfg, dtype=dtype)

    variables = None
    if os.path.isdir(model_path):
        has_orbax = os.path.exists(os.path.join(model_path, "_METADATA")) or \
            os.path.exists(os.path.join(model_path, "manifest.ocdbt"))
        if has_orbax:
            from psalm_tpu.checkpoint.convert import load_orbax
            variables = load_orbax(model_path)
        else:
            from psalm_tpu.checkpoint.convert import (convert_psalm_checkpoint,
                                                      load_torch_state_dict)
            sd = load_torch_state_dict(model_path)
            variables = convert_psalm_checkpoint(sd, cfg)
        if load_8bit:
            from psalm_tpu.models.quant import quantize_phi_int8
            variables = quantize_phi_int8(variables)
        if load_4bit:
            from psalm_tpu.models.quant import quantize_phi_int4
            variables = quantize_phi_int4(variables)
        variables = jax.tree.map(jnp.asarray, variables)
        if dtype == jnp.bfloat16:
            # serving: store float weights in bf16 so the decode step's HBM
            # weight traffic matches the compute dtype (f32 storage would
            # double it and halve the bandwidth-bound tok/s). int8/int4
            # leaves, their dequant 'scale's, and normalization stats stay
            # full precision (tiny, and the quant error budget assumes f32
            # scales).
            keep_f32 = ("scale", "batch_stats")

            def cast(path, x):
                if not hasattr(x, "dtype") or x.dtype != jnp.float32:
                    return x
                keys = {getattr(k, "key", getattr(k, "name", ""))
                        for k in path}
                return x if keys & set(keep_f32) else x.astype(jnp.bfloat16)

            variables = jax.tree_util.tree_map_with_path(cast, variables)

    tokenizer = None
    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(model_path)
        if "[SEG]" not in tokenizer.get_vocab():
            tokenizer.add_tokens("[SEG]")
    except Exception:
        pass

    return tokenizer, model, variables, cfg.phi.max_position_embeddings
