"""Shape/behavior tests for the pixel decoder and mask decoder."""

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from psalm_tpu.models.mask_decoder import MaskDecoder
from psalm_tpu.models.layers import position_embedding_sine


def test_position_embedding_matches_torch_reference_math():
    import torch
    import math
    H, W, npf = 5, 7, 8
    # independent torch recomputation of the normalized sine embedding
    mask = torch.zeros((1, H, W), dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), 4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), 4).flatten(3)
    want = torch.cat((pos_y, pos_x), dim=3)[0].numpy()  # [H, W, 2*npf]

    got = np.asarray(position_embedding_sine(H, W, npf))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _features(cfg, B=2):
    key = jax.random.PRNGKey(0)
    s = cfg.image_size
    chans = cfg.pixel_decoder.in_channels
    return [jax.random.normal(jax.random.PRNGKey(i), (B, s // (4 * 2 ** i),
                                                      s // (4 * 2 ** i), chans[i]))
            for i in range(4)]


def test_pixel_decoder_shapes():
    cfg = tiny_test_config()
    feats = _features(cfg)
    pd = MSDeformAttnPixelDecoder(cfg.pixel_decoder)
    params = jax.jit(pd.init)(jax.random.PRNGKey(0), feats)
    mask_feat, enc_feat, ms = jax.jit(pd.apply)(params, feats)
    B, s = 2, cfg.image_size
    assert mask_feat.shape == (B, s // 4, s // 4, cfg.pixel_decoder.mask_dim)
    assert enc_feat.shape == (B, s // 32, s // 32, cfg.pixel_decoder.conv_dim)
    assert [m.shape[1] for m in ms] == [s // 32, s // 16, s // 8]
    assert np.isfinite(np.asarray(mask_feat)).all()


def test_mask_decoder_outputs():
    cfg = tiny_test_config()
    mc = cfg.mask_decoder
    B, Q, K, R = 2, mc.num_queries, 6, 3
    s = cfg.image_size
    key = jax.random.PRNGKey(1)
    ms = [jax.random.normal(key, (B, s // st, s // st, mc.hidden_dim))
          for st in (32, 16, 8)]
    mask_features = jax.random.normal(key, (B, s // 4, s // 4, mc.mask_dim))
    seg_query = jax.random.normal(key, (B, Q, mc.hidden_dim))
    SEG_emb = jax.random.normal(key, (B, 1, mc.hidden_dim))
    cls_emb = jax.random.normal(key, (B, K, mc.hidden_dim))
    cls_valid = jnp.array([[True] * K, [True] * 4 + [False] * 2])
    reg_emb = jax.random.normal(key, (B, R, mc.hidden_dim))
    reg_valid = jnp.ones((B, R), bool)

    md = MaskDecoder(mc)
    params = jax.jit(md.init)(jax.random.PRNGKey(2), ms, mask_features,
                              seg_query, SEG_emb, cls_emb, cls_valid, reg_emb,
                              reg_valid)
    out = jax.jit(md.apply)(params, ms, mask_features, seg_query, SEG_emb,
                            cls_emb, cls_valid, reg_emb, reg_valid)
    assert out["pred_masks"].shape == (B, Q, s // 4, s // 4)
    assert out["pred_SEG_logits"].shape == (B, Q, 1)
    assert out["pred_class_name_logits"].shape == (B, Q, K)
    assert out["pred_region_logits"].shape == (B, R, Q)
    assert len(out["aux_outputs"]) == mc.dec_layers
    # invalid class columns must be masked to NEG_INF
    assert np.asarray(out["pred_class_name_logits"])[1, :, 4:].max() < -1e8
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_mask_decoder_concat_path():
    cfg = tiny_test_config()
    mc = cfg.mask_decoder
    import dataclasses
    mc = dataclasses.replace(mc, seg_concat=True)
    B, Q = 1, mc.num_queries
    s = cfg.image_size
    key = jax.random.PRNGKey(1)
    ms = [jax.random.normal(key, (B, s // st, s // st, mc.hidden_dim))
          for st in (32, 16, 8)]
    mask_features = jax.random.normal(key, (B, s // 4, s // 4, mc.mask_dim))
    seg_query = jax.random.normal(key, (B, Q, mc.hidden_dim))
    SEG_emb = jax.random.normal(key, (B, 1, mc.hidden_dim))

    md = MaskDecoder(mc)
    params = jax.jit(md.init)(jax.random.PRNGKey(2), ms, mask_features,
                              seg_query, SEG_emb)
    out = jax.jit(md.apply)(params, ms, mask_features, seg_query, SEG_emb)
    assert out["pred_masks"].shape == (B, Q, s // 4, s // 4)
    assert out["pred_SEG_logits"].shape == (B, Q, 1)


def test_pixel_decoder_dense_mode():
    import dataclasses
    cfg = tiny_test_config()
    pdc = dataclasses.replace(cfg.pixel_decoder, attention_mode="dense")
    feats = _features(cfg)
    pd = MSDeformAttnPixelDecoder(pdc)
    params = jax.jit(pd.init)(jax.random.PRNGKey(0), feats)
    mask_feat, _, ms = jax.jit(pd.apply)(params, feats)
    assert mask_feat.shape[1] == cfg.image_size // 4
    assert np.isfinite(np.asarray(mask_feat)).all()
