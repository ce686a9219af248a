"""Checkpoint-conversion structure test: build a synthetic torch-style state
dict with the reference's key names (shapes taken from the tiny config), run
the converter, and check the resulting tree drops into PSALM.init's structure
exactly and supports a forward pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.config import tiny_test_config
from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from psalm_tpu.models.psalm import PSALM


def synthetic_torch_sd(cfg, rng):
    """Emit the reference checkpoint's key set for the tiny config."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    p = cfg.phi
    add("model.embed_tokens.weight", p.vocab_size, p.hidden_size)
    for i in range(p.num_layers):
        pre = f"model.layers.{i}"
        for nm in ["q_proj", "k_proj", "v_proj", "dense"]:
            add(f"{pre}.self_attn.{nm}.weight", p.hidden_size, p.hidden_size)
            add(f"{pre}.self_attn.{nm}.bias", p.hidden_size)
        add(f"{pre}.mlp.fc1.weight", p.intermediate_size, p.hidden_size)
        add(f"{pre}.mlp.fc1.bias", p.intermediate_size)
        add(f"{pre}.mlp.fc2.weight", p.hidden_size, p.intermediate_size)
        add(f"{pre}.mlp.fc2.bias", p.hidden_size)
        add(f"{pre}.input_layernorm.weight", p.hidden_size)
        add(f"{pre}.input_layernorm.bias", p.hidden_size)
    add("model.final_layernorm.weight", p.hidden_size)
    add("model.final_layernorm.bias", p.hidden_size)
    add("lm_head.weight", p.vocab_size, p.hidden_size)

    s = cfg.swin
    add("model.vision_tower.patch_embed.proj.weight", s.embed_dim, 3,
        s.patch_size, s.patch_size)
    add("model.vision_tower.patch_embed.proj.bias", s.embed_dim)
    add("model.vision_tower.patch_embed.norm.weight", s.embed_dim)
    add("model.vision_tower.patch_embed.norm.bias", s.embed_dim)
    dims = s.num_features
    for i, depth in enumerate(s.depths):
        d = dims[i]
        for j in range(depth):
            pre = f"model.vision_tower.layers.{i}.blocks.{j}"
            for nm in ["norm1", "norm2"]:
                add(f"{pre}.{nm}.weight", d)
                add(f"{pre}.{nm}.bias", d)
            add(f"{pre}.attn.qkv.weight", 3 * d, d)
            add(f"{pre}.attn.qkv.bias", 3 * d)
            add(f"{pre}.attn.proj.weight", d, d)
            add(f"{pre}.attn.proj.bias", d)
            add(f"{pre}.attn.relative_position_bias_table",
                (2 * s.window_size - 1) ** 2, s.num_heads[i])
            add(f"{pre}.mlp.fc1.weight", int(d * s.mlp_ratio), d)
            add(f"{pre}.mlp.fc1.bias", int(d * s.mlp_ratio))
            add(f"{pre}.mlp.fc2.weight", d, int(d * s.mlp_ratio))
            add(f"{pre}.mlp.fc2.bias", d)
        if i < len(s.depths) - 1:
            add(f"model.vision_tower.layers.{i}.downsample.norm.weight", 4 * d)
            add(f"model.vision_tower.layers.{i}.downsample.norm.bias", 4 * d)
            add(f"model.vision_tower.layers.{i}.downsample.reduction.weight",
                2 * d, 4 * d)
        add(f"model.vision_tower.norm{i}.weight", d)
        add(f"model.vision_tower.norm{i}.bias", d)

    pj = cfg.projector
    planes = 2 * pj.input_dim
    add("model.mm_projector.layer1.0.conv1.weight", planes, pj.input_dim, 3, 3)
    add("model.mm_projector.layer1.0.conv2.weight", planes, planes, 3, 3)
    add("model.mm_projector.layer1.0.downsample.0.weight", planes, pj.input_dim,
        1, 1)
    for bn in ["bn1", "bn2", "downsample.1"]:
        add(f"model.mm_projector.layer1.0.{bn}.weight", planes)
        add(f"model.mm_projector.layer1.0.{bn}.bias", planes)
        add(f"model.mm_projector.layer1.0.{bn}.running_mean", planes)
        add(f"model.mm_projector.layer1.0.{bn}.running_var", planes)
        sd[f"model.mm_projector.layer1.0.{bn}.running_var"] = np.abs(
            sd[f"model.mm_projector.layer1.0.{bn}.running_var"]) + 1.0
    add("model.mm_projector.fc.weight", pj.out_dim, planes)
    add("model.mm_projector.fc.bias", pj.out_dim)

    pd = cfg.pixel_decoder
    cd = pd.conv_dim
    add("pixel_decoder.transformer.level_embed", pd.num_feature_levels, cd)
    for i, ch in enumerate(reversed(pd.in_channels[1:])):
        add(f"pixel_decoder.input_proj.{i}.0.weight", cd, ch, 1, 1)
        add(f"pixel_decoder.input_proj.{i}.0.bias", cd)
        add(f"pixel_decoder.input_proj.{i}.1.weight", cd)
        add(f"pixel_decoder.input_proj.{i}.1.bias", cd)
    M, L, P = pd.transformer_nheads, pd.num_feature_levels, pd.enc_points
    for i in range(pd.transformer_enc_layers):
        pre = f"pixel_decoder.transformer.encoder.layers.{i}"
        add(f"{pre}.self_attn.sampling_offsets.weight", M * L * P * 2, cd)
        add(f"{pre}.self_attn.sampling_offsets.bias", M * L * P * 2)
        add(f"{pre}.self_attn.attention_weights.weight", M * L * P, cd)
        add(f"{pre}.self_attn.attention_weights.bias", M * L * P)
        add(f"{pre}.self_attn.value_proj.weight", cd, cd)
        add(f"{pre}.self_attn.value_proj.bias", cd)
        add(f"{pre}.self_attn.output_proj.weight", cd, cd)
        add(f"{pre}.self_attn.output_proj.bias", cd)
        for nm in ["norm1", "norm2"]:
            add(f"{pre}.{nm}.weight", cd)
            add(f"{pre}.{nm}.bias", cd)
        add(f"{pre}.linear1.weight", pd.transformer_dim_feedforward, cd)
        add(f"{pre}.linear1.bias", pd.transformer_dim_feedforward)
        add(f"{pre}.linear2.weight", cd, pd.transformer_dim_feedforward)
        add(f"{pre}.linear2.bias", cd)
    add("pixel_decoder.adapter_1.0.weight", cd, pd.in_channels[0], 1, 1)
    add("pixel_decoder.adapter_1.0.bias", cd)
    add("pixel_decoder.adapter_1.1.weight", cd)
    add("pixel_decoder.adapter_1.1.bias", cd)
    add("pixel_decoder.layer_1.0.weight", cd, cd, 3, 3)
    add("pixel_decoder.layer_1.0.bias", cd)
    add("pixel_decoder.layer_1.1.weight", cd)
    add("pixel_decoder.layer_1.1.bias", cd)
    add("pixel_decoder.mask_features.weight", pd.mask_dim, cd, 1, 1)
    add("pixel_decoder.mask_features.bias", pd.mask_dim)

    md = cfg.mask_decoder
    hd = md.hidden_dim
    add("predictor.query_embed.weight", md.num_queries, hd)
    add("predictor.query_feat.weight", md.num_queries, hd)
    add("predictor.SEG_query_embed.weight", md.num_queries + 1, hd)
    add("predictor.level_embed.weight", md.num_feature_levels, hd)
    add("predictor.decoder_norm.weight", hd)
    add("predictor.decoder_norm.bias", hd)
    for i in range(md.dec_layers):
        for grp, sub in [("transformer_cross_attention_layers", "multihead_attn"),
                         ("transformer_self_attention_layers", "self_attn")]:
            add(f"predictor.{grp}.{i}.{sub}.in_proj_weight", 3 * hd, hd)
            add(f"predictor.{grp}.{i}.{sub}.in_proj_bias", 3 * hd)
            add(f"predictor.{grp}.{i}.{sub}.out_proj.weight", hd, hd)
            add(f"predictor.{grp}.{i}.{sub}.out_proj.bias", hd)
            add(f"predictor.{grp}.{i}.norm.weight", hd)
            add(f"predictor.{grp}.{i}.norm.bias", hd)
        add(f"predictor.transformer_ffn_layers.{i}.linear1.weight",
            md.dim_feedforward, hd)
        add(f"predictor.transformer_ffn_layers.{i}.linear1.bias",
            md.dim_feedforward)
        add(f"predictor.transformer_ffn_layers.{i}.linear2.weight", hd,
            md.dim_feedforward)
        add(f"predictor.transformer_ffn_layers.{i}.linear2.bias", hd)
        add(f"predictor.transformer_ffn_layers.{i}.norm.weight", hd)
        add(f"predictor.transformer_ffn_layers.{i}.norm.bias", hd)
    for j in range(3):
        io = md.mask_dim if j == 2 else hd
        add(f"predictor.mask_embed.layers.{j}.weight", io, hd)
        add(f"predictor.mask_embed.layers.{j}.bias", io)
    for proj in ["SEG_proj", "CLASS_proj", "REGION_proj"]:
        for j in range(2):
            add(f"predictor.{proj}.layers.{j}.weight", hd, hd)
            add(f"predictor.{proj}.layers.{j}.bias", hd)

    add("seg_query", md.num_queries, p.hidden_size)
    for proj in ["seg_query_projector", "SEG_token_projector",
                 "class_name_projector", "region_projector"]:
        add(f"{proj}.weight", hd, p.hidden_size)
        add(f"{proj}.bias", hd)
    return sd


def _paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(getattr(k, "key", str(k)) for k in kp): v.shape
            for kp, v in flat}


def test_convert_matches_init_structure():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    sd = synthetic_torch_sd(cfg, rng)
    variables = convert_psalm_checkpoint(sd, cfg)

    import __graft_entry__ as ge
    K = 3
    batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
    # activate every conditioning path so lazy linen init creates all heads
    batch["region_points"] = jnp.zeros((1, 2, 4, 2)) + 0.5
    batch["region_valid"] = jnp.ones((1, 2), bool)
    model = PSALM(cfg)
    init_vars = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K, use_seg_embedding=True,
        use_regions=True, max_regions=2))(jax.random.PRNGKey(0), batch)

    want = _paths(jax.tree.map(np.asarray, init_vars))
    got = _paths(variables)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"converter missing leaves: {sorted(missing)[:10]}"
    assert not extra, f"converter extra leaves: {sorted(extra)[:10]}"
    for k in want:
        assert want[k] == got[k], (k, want[k], got[k])

    # converted tree must run a forward pass
    variables = jax.tree.map(jnp.asarray, variables)
    out = jax.jit(lambda v, b: model.apply(v, b, use_class_names=True,
                                           num_class_names=K))(variables, batch)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
