"""End-to-end forward test of the full PSALM spine on the tiny config, and a
check that device-side conditioning extraction matches the reference
semantics (segment means, ordered mask gathers)."""

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.config import tiny_test_config
from psalm_tpu.data.constants import (CLS_TOKEN_INDEX, IMAGE_TOKEN_INDEX,
                                      REGION_TOKEN_INDEX, SEG_TOKEN_INDEX)
from psalm_tpu.data.splicer import splice, stack_samples
from psalm_tpu.models.psalm import PSALM, positions_of_mask, segment_mean


def test_positions_of_mask_ordered():
    mask = jnp.array([[0, 1, 0, 1, 1], [1, 1, 1, 0, 0]], jnp.float32)
    pos = positions_of_mask(mask, 3)
    np.testing.assert_array_equal(np.asarray(pos), [[1, 3, 4], [0, 1, 2]])


def test_segment_mean_matches_loop():
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((2, 7, 4)).astype(np.float32)
    seg = np.array([[0, 1, 1, 2, 0, 2, 0], [1, 0, 0, 0, 0, 0, 3]])
    means, valid = segment_mean(jnp.asarray(hidden), jnp.asarray(seg), 3)
    want01 = hidden[0, 1:3].mean(0)
    np.testing.assert_allclose(np.asarray(means)[0, 0], want01, rtol=1e-6)
    want02 = hidden[0, [3, 5]].mean(0)
    np.testing.assert_allclose(np.asarray(means)[0, 1], want02, rtol=1e-6)
    assert np.asarray(valid).tolist() == [[True, True, False],
                                          [True, False, True]]


def _panoptic_batch(cfg, B=2):
    s = cfg.image_size
    n_img = (s // 64) ** 2  # projector tokens: res5(s/32) stride2 -> s/64
    nq = cfg.mask_decoder.num_queries
    K = 3
    ids = [7, IMAGE_TOKEN_INDEX, 8] + [CLS_TOKEN_INDEX] * K + [9, SEG_TOKEN_INDEX]
    cls_ids = np.array([10, 11, 12, 13, 14])
    cls_idx = np.array([0, 0, 1, 2, 2])
    samples = [splice(ids, None, num_image_tokens=n_img, num_seg_queries=nq,
                      pad_len=n_img + nq + 16, class_name_ids=cls_ids,
                      cls_indices=cls_idx) for _ in range(B)]
    batch = {k: jnp.asarray(v) for k, v in stack_samples(samples).items()}
    batch["images"] = jax.random.normal(jax.random.PRNGKey(0), (B, s, s, 3))
    return batch, K


def test_psalm_forward_panoptic():
    cfg = tiny_test_config()
    batch, K = _panoptic_batch(cfg)
    model = PSALM(cfg)
    params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                             num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda p, b: model.apply(p, b, use_class_names=True,
                                           num_class_names=K))(params, batch)
    B, s = 2, cfg.image_size
    nq = cfg.mask_decoder.num_queries
    assert out["pred_masks"].shape == (B, nq, s // 4, s // 4)
    assert out["pred_class_name_logits"].shape == (B, nq, K)
    assert out["pred_SEG_logits"] is None
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
    assert len(out["aux_outputs"]) == cfg.mask_decoder.dec_layers


def test_psalm_forward_region():
    cfg = tiny_test_config()
    s = cfg.image_size
    n_img = (s // 64) ** 2
    nq = cfg.mask_decoder.num_queries
    R = 2
    ids = [7, IMAGE_TOKEN_INDEX] + [REGION_TOKEN_INDEX] * R + [SEG_TOKEN_INDEX]
    samples = [splice(ids, None, num_image_tokens=n_img, num_seg_queries=nq,
                      pad_len=n_img + nq + 8, num_regions=R)]
    batch = {k: jnp.asarray(v) for k, v in stack_samples(samples).items()}
    batch["images"] = jax.random.normal(jax.random.PRNGKey(0), (1, s, s, 3))
    batch["region_points"] = jax.random.uniform(jax.random.PRNGKey(1),
                                                (1, R, 16, 2))
    batch["region_valid"] = jnp.ones((1, R), bool)

    model = PSALM(cfg)
    params = jax.jit(lambda r, b: model.init(r, b, use_class_names=False,
                                             use_regions=True, max_regions=R))(
        jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda p, b: model.apply(p, b, use_class_names=False,
                                           use_regions=True, max_regions=R))(
        params, batch)
    assert out["pred_region_logits"].shape == (1, R, nq)
    assert out["pred_class_name_logits"] is None
    assert np.isfinite(np.asarray(out["pred_region_logits"])).all()


def test_pixel_decoder_window_mode_matches_deformable_at_init():
    """Same params, two attention modes: at init the offset head emits only
    its bias (zero kernel), whose magnitude is <= n_points < window_radius,
    so the windowed MXU formulation must reproduce 'deformable' exactly."""
    import dataclasses
    from psalm_tpu.config import PixelDecoderConfig
    from psalm_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    rng = np.random.default_rng(0)
    base = PixelDecoderConfig(conv_dim=32, mask_dim=32,
                              transformer_enc_layers=2, transformer_nheads=4,
                              transformer_dim_feedforward=64,
                              in_channels=(8, 8, 8, 8), window_radius=6.0,
                              window_tile=8)
    feats = [jnp.asarray(rng.standard_normal((1, hw, hw, 8)), jnp.float32)
             for hw in (16, 8, 4, 2)]  # res2..res5

    outs = {}
    for mode in ("deformable", "window"):
        cfg = dataclasses.replace(base, attention_mode=mode)
        mod = MSDeformAttnPixelDecoder(cfg)
        vars_ = mod.init(jax.random.PRNGKey(0), feats)
        outs[mode] = mod.apply(vars_, feats)

    for a, b in zip(jax.tree_util.tree_leaves(outs["deformable"]),
                    jax.tree_util.tree_leaves(outs["window"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_projector_variants():
    """build_vision_projector parity (builder.py:405-433): linear and
    mlpNx_gelu variants beside the PSALM-default swin_conv."""
    from psalm_tpu.config import ProjectorConfig
    from psalm_tpu.models.projector import build_projector

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 16)),
                    jnp.float32)
    for t, n_tokens in (("linear", 16), ("mlp3x_gelu", 16), ("swin_conv", 4)):
        cfg = ProjectorConfig(projector_type=t, input_dim=16, out_dim=8)
        m = build_projector(cfg)
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (1, n_tokens, 8)
    import pytest
    with pytest.raises(ValueError, match="unknown projector_type"):
        build_projector(ProjectorConfig(projector_type="conv9"))


def test_seq_bucket_padding_is_inert():
    """collate(seq_bucket=...) trims the uniform right-padding; model outputs
    must be identical to the fully padded batch (padding is masked keys +
    IGNORE labels + position-gathered heads — eval CLIs default to
    seq_bucket=128 for the real 2048-cap datasets)."""
    from psalm_tpu.data.datasets import collate as _collate

    cfg = tiny_test_config()
    s = cfg.image_size
    n_img = (s // 64) ** 2
    nq = cfg.mask_decoder.num_queries
    K = 3
    ids = [7, IMAGE_TOKEN_INDEX, 8] + [CLS_TOKEN_INDEX] * K + \
          [9, SEG_TOKEN_INDEX]
    cls_ids = np.array([10, 11, 12, 13, 14])
    cls_idx = np.array([0, 0, 1, 2, 2])
    real_len = n_img + nq + len(ids) + len(cls_ids) - 1 - K
    pad_len = real_len + 37  # deliberately sloppy fixed pad
    rng = np.random.default_rng(3)
    samples = []
    for b in range(2):
        sp = splice(ids, None, num_image_tokens=n_img, num_seg_queries=nq,
                    pad_len=pad_len, class_name_ids=cls_ids,
                    cls_indices=cls_idx)
        d = sp.as_dict()
        d["dataset_type"] = "panoptic"
        d["images"] = rng.standard_normal((s, s, 3)).astype(np.float32)
        samples.append(d)

    full = _collate(samples)
    bucketed = _collate(samples, seq_bucket=8)
    Lb = bucketed["attention_mask"].shape[-1]
    assert Lb % 8 == 0 and real_len <= Lb < pad_len

    model = PSALM(cfg)
    jb = {k: jnp.asarray(np.stack([s_["images"] for s_ in samples]))
          if k == "images" else jnp.asarray(v)
          for k, v in full.items() if k != "dataset_type"}
    params = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                             num_class_names=K))(
        jax.random.PRNGKey(0), jb)
    apply = jax.jit(lambda p, b: model.apply(p, b, use_class_names=True,
                                             num_class_names=K)["pred_masks"])
    want = np.asarray(apply(params, jb))
    jbb = {k: jnp.asarray(v) for k, v in bucketed.items()
           if k != "dataset_type"}
    got = np.asarray(apply(params, jbb))
    # not bit-equal: XLA picks different matmul tilings per sequence length,
    # reordering f32 accumulation (observed max rel diff ~6e-5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
