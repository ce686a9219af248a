"""Checkpoint conversion: released PSALM (HF torch) weights -> psalm_tpu.

The released checkpoint (HF EnmingZhang/PSALM, referenced at
/root/reference/README.md:31-32) is a PhiForCausalLM-derived state dict with:
  model.embed_tokens / model.layers.N.* / model.final_layernorm   (Phi-1.5)
  model.vision_tower.*                                            (Swin-B)
  model.mm_projector.*                                            (ResNetSwin)
  lm_head.weight, seg_query, pixel_decoder.*, predictor.*,
  seg_query_projector/SEG_token_projector/class_name_projector/
  region_projector.{weight,bias}

This module maps those names/layouts to the psalm_tpu flax tree. Also
supports the three initialization checkpoints the reference trains from
(SURVEY.md §5.4): an HF Phi dir, a Mask2Former Swin-B ``.pkl`` (with the key
surgery of llava_phi.py:195-219 / swin_trans.py:571-606), and a projector
``.bin``.

Layout conventions converted:
  torch Linear weight [out, in]      -> flax Dense kernel [in, out]
  torch Conv2d weight [O, I, kH, kW] -> flax Conv kernel [kH, kW, I, O]
  torch MultiheadAttention packed in_proj [3D, D] -> split q/k/v kernels
  BatchNorm running stats -> flax batch_stats collection
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np


def _t(w):  # torch tensor / numpy -> numpy
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _dense(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _gn(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}
    stats = {"mean": _t(sd[prefix + ".running_mean"]),
             "var": _t(sd[prefix + ".running_var"])}
    return params, stats


def _mha(sd, prefix):
    """torch nn.MultiheadAttention -> q/k/v/out dense."""
    w = _t(sd[prefix + ".in_proj_weight"])
    b = _t(sd[prefix + ".in_proj_bias"])
    D = w.shape[1]
    return {
        "q_proj": {"kernel": w[:D].T, "bias": b[:D]},
        "k_proj": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
        "v_proj": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
        "out_proj": _dense(sd, prefix + ".out_proj"),
    }


# ---------------------------------------------------------------------------
# per-module converters (state dict keys relative to the module)


def convert_phi(sd: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Keys: embed_tokens.weight, layers.N.*, final_layernorm.*"""
    tree = {
        "embed_tokens": {"embedding": _t(sd["embed_tokens.weight"])},
        "final_layernorm": _ln(sd, "final_layernorm"),
    }
    for i in range(num_layers):
        p = f"layers.{i}"
        tree[f"layers_{i}"] = {
            "input_layernorm": _ln(sd, f"{p}.input_layernorm"),
            "self_attn": {
                "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
                "dense": _dense(sd, f"{p}.self_attn.dense"),
            },
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        }
    return tree


def convert_swin(sd: Dict[str, Any], depths: Tuple[int, ...]) -> Dict[str, Any]:
    """Keys per swin_trans.py: patch_embed.*, layers.i.blocks.j.*,
    layers.i.downsample.*, norm{0..3}.*"""
    tree: Dict[str, Any] = {
        "patch_embed_proj": _conv(sd, "patch_embed.proj"),
        "patch_embed_norm": _ln(sd, "patch_embed.norm"),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            tree[f"layers_{i}_blocks_{j}"] = {
                "norm1": _ln(sd, f"{p}.norm1"),
                "norm2": _ln(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{p}.attn.qkv"),
                    "proj": _dense(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table":
                        _t(sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "mlp_fc1": _dense(sd, f"{p}.mlp.fc1"),
                "mlp_fc2": _dense(sd, f"{p}.mlp.fc2"),
            }
        if f"layers.{i}.downsample.norm.weight" in sd:
            tree[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _t(sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
        if f"norm{i}.weight" in sd:
            tree[f"norm{i}"] = _ln(sd, f"norm{i}")
    return tree


def convert_projector(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """ResNetSwin keys: layer1.0.{conv1,bn1,conv2,bn2,downsample.0,
    downsample.1}, fc."""
    bn1_p, bn1_s = _bn(sd, "layer1.0.bn1")
    bn2_p, bn2_s = _bn(sd, "layer1.0.bn2")
    dbn_p, dbn_s = _bn(sd, "layer1.0.downsample.1")
    params = {
        "conv1": _conv(sd, "layer1.0.conv1"),
        "bn1": bn1_p,
        "conv2": _conv(sd, "layer1.0.conv2"),
        "bn2": bn2_p,
        "downsample_conv": _conv(sd, "layer1.0.downsample.0"),
        "downsample_bn": dbn_p,
        "fc": _dense(sd, "fc"),
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s, "downsample_bn": dbn_s}
    return params, stats


def convert_pixel_decoder(sd: Dict[str, Any], enc_layers: int,
                          num_levels: int = 3) -> Dict[str, Any]:
    """Keys per msdeformattn.py (after the adapter_1/layer_1 key surgery of
    llava_phi.py:206-211 for .pkl initialization; the released checkpoint
    already uses the .0/.1 form)."""
    tree: Dict[str, Any] = {
        "level_embed": _t(sd["transformer.level_embed"]),
        "mask_features": _conv(sd, "mask_features"),
        "adapter_1_conv": _conv(sd, "adapter_1.0"),
        "adapter_1_norm": _gn(sd, "adapter_1.1"),
        "layer_1_conv": _conv(sd, "layer_1.0"),
        "layer_1_norm": _gn(sd, "layer_1.1"),
    }
    for i in range(num_levels):
        tree[f"input_proj_{i}_conv"] = _conv(sd, f"input_proj.{i}.0")
        tree[f"input_proj_{i}_norm"] = _gn(sd, f"input_proj.{i}.1")
    for i in range(enc_layers):
        p = f"transformer.encoder.layers.{i}"
        tree[f"encoder_layer_{i}"] = {
            "self_attn": {
                "sampling_offsets": _dense(sd, f"{p}.self_attn.sampling_offsets"),
                "attention_weights": _dense(sd, f"{p}.self_attn.attention_weights"),
                "value_proj": _dense(sd, f"{p}.self_attn.value_proj"),
                "output_proj": _dense(sd, f"{p}.self_attn.output_proj"),
            },
            "norm1": _ln(sd, f"{p}.norm1"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
    return tree


def _mlp(sd, prefix, n):
    return {f"layers_{i}": _dense(sd, f"{prefix}.layers.{i}") for i in range(n)}


def convert_predictor(sd: Dict[str, Any], dec_layers: int) -> Dict[str, Any]:
    """Keys per MultiScaleMaskedTransformerDecoderForOPTPreTrain."""
    tree: Dict[str, Any] = {
        "query_embed": _t(sd["query_embed.weight"]),
        "query_feat": _t(sd["query_feat.weight"]),
        "SEG_query_embed": _t(sd["SEG_query_embed.weight"]),
        "level_embed": _t(sd["level_embed.weight"]),
        "decoder_norm": _ln(sd, "decoder_norm"),
        "mask_embed": _mlp(sd, "mask_embed", 3),
        "SEG_proj": _mlp(sd, "SEG_proj", 2),
        "CLASS_proj": _mlp(sd, "CLASS_proj", 2),
        "REGION_proj": _mlp(sd, "REGION_proj", 2),
    }
    for i in range(dec_layers):
        tree[f"cross_{i}"] = {
            "multihead_attn": _mha(sd, f"transformer_cross_attention_layers.{i}.multihead_attn"),
            "norm": _ln(sd, f"transformer_cross_attention_layers.{i}.norm"),
        }
        tree[f"self_{i}"] = {
            "self_attn": _mha(sd, f"transformer_self_attention_layers.{i}.self_attn"),
            "norm": _ln(sd, f"transformer_self_attention_layers.{i}.norm"),
        }
        tree[f"ffn_{i}"] = {
            "linear1": _dense(sd, f"transformer_ffn_layers.{i}.linear1"),
            "linear2": _dense(sd, f"transformer_ffn_layers.{i}.linear2"),
            "norm": _ln(sd, f"transformer_ffn_layers.{i}.norm"),
        }
    return tree


# ---------------------------------------------------------------------------
# top-level


def _sub(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_psalm_checkpoint(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Full PSALM torch state dict -> flax variables {'params', 'batch_stats'}."""
    phi_sd = {k: v for k, v in _sub(sd, "model.").items()
              if re.match(r"(embed_tokens|layers\.\d+\.|final_layernorm)", k)}
    proj_params, proj_stats = convert_projector(_sub(sd, "model.mm_projector."))
    params = {
        "phi": {
            "model": convert_phi(phi_sd, cfg.phi.num_layers),
            "lm_head": {"kernel": _t(sd["lm_head.weight"]).T},
        },
        "vision_tower": convert_swin(_sub(sd, "model.vision_tower."),
                                     cfg.swin.depths),
        "mm_projector": proj_params,
        "pixel_decoder": convert_pixel_decoder(
            _sub(sd, "pixel_decoder."), cfg.pixel_decoder.transformer_enc_layers),
        "predictor": convert_predictor(_sub(sd, "predictor."),
                                       cfg.mask_decoder.dec_layers),
        "seg_query": _t(sd["seg_query"]),
        "seg_query_projector": _dense(sd, "seg_query_projector"),
        "SEG_token_projector": _dense(sd, "SEG_token_projector"),
        "class_name_projector": _dense(sd, "class_name_projector"),
        "region_projector": _dense(sd, "region_projector"),
    }
    batch_stats = {"mm_projector": proj_stats}
    return {"params": params, "batch_stats": batch_stats}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load an HF model dir (safetensors shards or pytorch bins) or a single
    file into one flat numpy state dict."""
    sd: Dict[str, Any] = {}
    if os.path.isdir(path):
        files = sorted(os.listdir(path))
        st = [f for f in files if f.endswith(".safetensors")]
        bins = [f for f in files if re.match(r"pytorch_model.*\.bin$", f)]
        if st:
            from safetensors.numpy import load_file
            for f in st:
                sd.update(load_file(os.path.join(path, f)))
        elif bins:
            import torch
            for f in bins:
                sd.update({k: _t(v) for k, v in torch.load(
                    os.path.join(path, f), map_location="cpu").items()})
        else:
            raise FileNotFoundError(f"no weights found in {path}")
    elif path.endswith(".pkl"):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        sd = {k: np.asarray(v) for k, v in ckpt["model"].items()}
    else:
        import torch
        obj = torch.load(path, map_location="cpu")
        if isinstance(obj, dict) and "model" in obj:
            obj = obj["model"]
        sd = {k: _t(v) for k, v in obj.items()}
    return sd


# -- initialization-checkpoint paths (training-from-scratch parity) ----------


def convert_mask2former_pkl(path: str, cfg) -> Dict[str, Any]:
    """Mask2Former .pkl -> (swin params, pixel_decoder params, predictor
    params) with the reference's key surgery (llava_phi.py:195-219)."""
    sd = load_torch_state_dict(path)
    swin_sd = _sub(sd, "backbone.")
    pd_sd = _sub(sd, "sem_seg_head.pixel_decoder.")
    pred_sd = _sub(sd, "sem_seg_head.predictor.")
    # key surgery: adapter_1/layer_1 fused-conv names -> .0/.1 form
    for old, new in [("adapter_1.weight", "adapter_1.0.weight"),
                     ("adapter_1.norm.weight", "adapter_1.1.weight"),
                     ("adapter_1.norm.bias", "adapter_1.1.bias"),
                     ("layer_1.weight", "layer_1.0.weight"),
                     ("layer_1.norm.weight", "layer_1.1.weight"),
                     ("layer_1.norm.bias", "layer_1.1.bias")]:
        if old in pd_sd:
            pd_sd[new] = pd_sd.pop(old)
    if "static_query.weight" in pred_sd:
        pred_sd["query_feat.weight"] = pred_sd.pop("static_query.weight")
    if "query_embed.weight" in pred_sd and pred_sd["query_embed.weight"].shape[0] == 200:
        pred_sd["query_embed.weight"] = pred_sd["query_embed.weight"][:100]
    out = {"vision_tower": convert_swin(swin_sd, cfg.swin.depths)}
    try:
        out["pixel_decoder"] = convert_pixel_decoder(
            pd_sd, cfg.pixel_decoder.transformer_enc_layers)
    except KeyError:
        pass
    return out


def save_orbax(variables: Dict[str, Any], path: str) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


_TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "vocab.json", "merges.txt",
    "special_tokens_map.json", "added_tokens.json", "tokenizer.model",
)


def main(argv=None) -> None:
    """CLI: convert the released torch HF checkpoint dir to an orbax dir the
    eval/serve CLIs consume directly (weights-day runbook step 1,
    scripts/weights_day.sh). Writes the psalm_tpu config JSON and copies the
    tokenizer files alongside so --model_path <out> is self-contained."""
    import argparse
    import shutil

    from psalm_tpu.config import (PSALMConfig, config_from_json,
                                  config_to_json, tiny_test_config)

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--torch_dir", required=True,
                   help="HF checkpoint dir (safetensors or pytorch_model*.bin)")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--config_json", default=None,
                   help="psalm_tpu config JSON file; default = flagship "
                        "PSALMConfig (matches the released checkpoint)")
    p.add_argument("--tiny", action="store_true",
                   help="use tiny_test_config() (synthetic-checkpoint tests)")
    args = p.parse_args(argv)

    if args.config_json:
        with open(args.config_json) as f:
            cfg = config_from_json(f.read())
    elif args.tiny:
        cfg = tiny_test_config()
    else:
        cfg = PSALMConfig()

    sd = load_torch_state_dict(args.torch_dir)
    print(f"loaded {len(sd)} tensors from {args.torch_dir}")
    variables = convert_psalm_checkpoint(sd, cfg)
    save_orbax(variables, args.out)
    with open(os.path.join(args.out, "psalm_tpu_config.json"), "w") as f:
        f.write(config_to_json(cfg))
    copied = []
    for name in _TOKENIZER_FILES:
        src = os.path.join(args.torch_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, name))
            copied.append(name)
    print(f"saved orbax checkpoint + config to {args.out}"
          + (f" (tokenizer files: {', '.join(copied)})" if copied else ""))


if __name__ == "__main__":
    main()
