"""PSALM mask decoder (Mask2Former-style masked-attention transformer).

Behavioral spec: MultiScaleMaskedTransformerDecoderForOPTPreTrain
(mask2former_transformer_decoder.py:394-781). PSALM instantiates it with
seg_concat=False (llava_phi.py:466) so the runtime path is forward_woconcat
(:596-693): 9 layers of masked cross-attention -> self-attention -> FFN
round-robining over the 3 multi-scale levels, queries = the 100 LLM-emitted
seg-query hidden states, with per-layer prediction heads producing
pred_masks / pred_SEG_logits / pred_class_name_logits / pred_region_logits
and an attention mask thresholded at sigmoid<0.5 (:754-760). The concat path
(forward_concat, :494-594, 101-query layers with the [SEG] embedding
prepended) is also implemented behind ``seg_concat=True``.

TPU-first notes: the layer loop is a static unroll (9 layers, distinct
weights); attn-mask interpolation and thresholding run in f32 islands; all
variable-size conditioning (class names, regions) is padded to static shapes
with validity masks — invalid columns get -1e9 logits so downstream softmax /
topk semantics match the reference's ragged tensors.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import MaskDecoderConfig
from psalm_tpu.models.layers import MLP, MultiheadAttention, position_embedding_sine
from psalm_tpu.ops.sampling import resize_bilinear

NEG_INF = -1e9


class CrossAttentionLayer(nn.Module):
    """post-norm cross-attn (mask2former_transformer_decoder.py:70-130)."""

    dim: int
    nheads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, attn_bias, pos, query_pos):
        out = MultiheadAttention(self.dim, self.nheads, dtype=self.dtype,
                                 name="multihead_attn")(
            tgt + query_pos, memory + pos, memory, attn_bias)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(tgt + out)


class SelfAttentionLayer(nn.Module):
    dim: int
    nheads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos):
        out = MultiheadAttention(self.dim, self.nheads, dtype=self.dtype,
                                 name="self_attn")(
            tgt + query_pos, tgt + query_pos, tgt, None)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(tgt + out)


class FFNLayer(nn.Module):
    dim: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt):
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        x = nn.relu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(tgt + x)


class MaskDecoder(nn.Module):
    cfg: MaskDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                      (c.num_queries, c.hidden_dim))
        self.seg_query_embed = self.param("SEG_query_embed",
                                          nn.initializers.normal(1.0),
                                          (c.num_queries + 1, c.hidden_dim))
        self.query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                     (c.num_queries, c.hidden_dim))
        self.level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                      (c.num_feature_levels, c.hidden_dim))
        self.cross_layers = [CrossAttentionLayer(c.hidden_dim, c.nheads,
                                                 dtype=self.dtype,
                                                 name=f"cross_{i}")
                             for i in range(c.dec_layers)]
        self.self_layers = [SelfAttentionLayer(c.hidden_dim, c.nheads,
                                               dtype=self.dtype,
                                               name=f"self_{i}")
                            for i in range(c.dec_layers)]
        self.ffn_layers = [FFNLayer(c.hidden_dim, c.dim_feedforward,
                                    dtype=self.dtype, name=f"ffn_{i}")
                           for i in range(c.dec_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.mask_embed = MLP(c.hidden_dim, c.mask_dim, 3, dtype=self.dtype,
                              name="mask_embed")
        self.SEG_proj = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype,
                            name="SEG_proj")
        self.CLASS_proj = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype,
                              name="CLASS_proj")
        self.REGION_proj = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype,
                               name="REGION_proj")

    def _prediction_heads(self, output, mask_features, attn_size,
                          SEG_embedding, class_name_embedding, class_name_valid,
                          region_embedding, region_valid):
        """forward_prediction_heads (mask2former_transformer_decoder.py:695-762).

        output: [B, Q, D]; mask_features: [B, H, W, Dm].
        class_name_embedding: [B, K, D] padded, class_name_valid: [B, K] bool.
        region_embedding: [B, R, D] padded, region_valid: [B, R] bool.
        """
        dec = self.decoder_norm(output.astype(jnp.float32)).astype(output.dtype)

        SEG_class = None
        if SEG_embedding is not None:
            dec_seg = self.SEG_proj(dec)
            SEG_class = jnp.einsum("bld,bcd->blc", dec_seg, SEG_embedding)

        class_name_class = None
        if class_name_embedding is not None:
            dec_cls = self.CLASS_proj(dec)
            logits = jnp.einsum("bld,bcd->blc", dec_cls, class_name_embedding)
            if class_name_valid is not None:
                logits = jnp.where(class_name_valid[:, None, :], logits, NEG_INF)
            class_name_class = logits

        region_class = None
        if region_embedding is not None:
            dec_reg = self.REGION_proj(dec)
            # [B, R, Q] — per-sample einsum('kd,ld->kl') batched (:744)
            logits = jnp.einsum("brd,bld->brl", region_embedding, dec_reg)
            if region_valid is not None:
                logits = jnp.where(region_valid[:, :, None], logits, NEG_INF)
            region_class = logits

        mask_embed = self.mask_embed(dec)
        outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)

        # attn mask: f32 island, bilinear to the next level size, block where
        # sigmoid < 0.5, un-block fully-masked rows (:754-760, :647).
        m = outputs_mask.astype(jnp.float32)
        B, Q = m.shape[:2]
        m = resize_bilinear(m[..., None].reshape(B * Q, *m.shape[2:], 1),
                            attn_size).reshape(B, Q, attn_size[0] * attn_size[1])
        blocked = jax.nn.sigmoid(m) < 0.5
        all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
        blocked = jnp.where(all_blocked, False, blocked)
        attn_bias = jnp.where(blocked, NEG_INF, 0.0)[:, None]  # [B, 1, Q, S]

        return SEG_class, class_name_class, outputs_mask, attn_bias, region_class

    def __call__(self, x: Sequence[jnp.ndarray], mask_features: jnp.ndarray,
                 seg_query: jnp.ndarray,
                 SEG_embedding: Optional[jnp.ndarray] = None,
                 class_name_embedding: Optional[jnp.ndarray] = None,
                 class_name_valid: Optional[jnp.ndarray] = None,
                 region_embedding: Optional[jnp.ndarray] = None,
                 region_valid: Optional[jnp.ndarray] = None):
        """x: 3 NHWC multi-scale features (res5-, res4-, res3-scale);
        mask_features: [B, H/4, W/4, Dm]; seg_query: [B, Q, D].

        Returns dict with final + aux predictions (lists over layers).
        """
        c = self.cfg
        assert len(x) == c.num_feature_levels
        B = x[0].shape[0]

        src, pos, sizes = [], [], []
        for i, xi in enumerate(x):
            _, H, W, _ = xi.shape
            pe = position_embedding_sine(H, W, c.hidden_dim // 2)
            pos.append(jnp.broadcast_to(pe.reshape(1, H * W, -1),
                                        (B, H * W, c.hidden_dim)).astype(xi.dtype))
            # in_channels == hidden_dim -> input_proj is identity (:474-479)
            src.append(xi.reshape(B, H * W, -1) + self.level_embed[i][None, None])
            sizes.append((H, W))

        if self.cfg.seg_concat:
            return self._forward_concat(src, pos, sizes, mask_features, seg_query,
                                        SEG_embedding, class_name_embedding,
                                        class_name_valid, region_embedding,
                                        region_valid)
        return self._forward_woconcat(src, pos, sizes, mask_features, seg_query,
                                      SEG_embedding, class_name_embedding,
                                      class_name_valid, region_embedding,
                                      region_valid)

    def _forward_woconcat(self, src, pos, sizes, mask_features, seg_query,
                          SEG_embedding, class_name_embedding, class_name_valid,
                          region_embedding, region_valid):
        c = self.cfg
        B = seg_query.shape[0]
        query_pos = jnp.broadcast_to(self.query_embed[None],
                                     (B, c.num_queries, c.hidden_dim)).astype(seg_query.dtype)
        output = seg_query

        heads = lambda out, lvl: self._prediction_heads(
            out, mask_features, sizes[lvl], SEG_embedding, class_name_embedding,
            class_name_valid, region_embedding, region_valid)

        preds = []
        SEG_cls, name_cls, masks, attn_bias, region_cls = heads(output, 0)
        preds.append((SEG_cls, name_cls, masks, region_cls))

        for i in range(c.dec_layers):
            lvl = i % c.num_feature_levels
            output = self.cross_layers[i](output, src[lvl], attn_bias, pos[lvl],
                                          query_pos)
            output = self.self_layers[i](output, query_pos)
            output = self.ffn_layers[i](output)
            SEG_cls, name_cls, masks, attn_bias, region_cls = heads(
                output, (i + 1) % c.num_feature_levels)
            preds.append((SEG_cls, name_cls, masks, region_cls))

        return self._pack(preds)

    def _forward_concat(self, src, pos, sizes, mask_features, seg_query,
                        SEG_embedding, class_name_embedding, class_name_valid,
                        region_embedding, region_valid):
        """forward_concat (:494-594): each layer runs 101 queries with the
        [SEG] embedding prepended, then strips it and refreshes it from the
        first output row."""
        c = self.cfg
        B = seg_query.shape[0]
        query_pos = jnp.broadcast_to(self.seg_query_embed[None],
                                     (B, c.num_queries + 1, c.hidden_dim)).astype(seg_query.dtype)
        output = seg_query
        seg_emb = SEG_embedding

        heads = lambda out, lvl, se: self._prediction_heads(
            out, mask_features, sizes[lvl], se, class_name_embedding,
            class_name_valid, region_embedding, region_valid)

        preds = []
        SEG_cls, name_cls, masks, attn_bias, region_cls = heads(output, 0, seg_emb)
        preds.append((SEG_cls, name_cls, masks, region_cls))

        for i in range(c.dec_layers):
            lvl = i % c.num_feature_levels
            ext = jnp.concatenate([seg_emb, output], axis=1)  # [B, Q+1, D]
            # [SEG] row attends everywhere (:542-544)
            seg_row = jnp.zeros_like(attn_bias[:, :, :1])
            bias = jnp.concatenate([seg_row, attn_bias], axis=2)
            ext = self.cross_layers[i](ext, src[lvl], bias, pos[lvl], query_pos)
            ext = self.self_layers[i](ext, query_pos)
            ext = self.ffn_layers[i](ext)
            output = ext[:, 1:]
            # reference quirk (:568-569): after stripping the [SEG] row the
            # refreshed SEG_embedding is output[0] — the FIRST QUERY row of
            # the stripped tensor, not the [SEG] row. Kept for parity.
            seg_emb = output[:, :1]
            SEG_cls, name_cls, masks, attn_bias, region_cls = heads(
                output, (i + 1) % c.num_feature_levels, seg_emb)
            preds.append((SEG_cls, name_cls, masks, region_cls))

        return self._pack(preds)

    @staticmethod
    def _pack(preds):
        SEG_cls, name_cls, masks, region_cls = preds[-1]
        return {
            "pred_SEG_logits": SEG_cls,
            "pred_class_name_logits": name_cls,
            "pred_masks": masks,
            "pred_region_logits": region_cls,
            "aux_outputs": [
                {"pred_SEG_logits": a, "pred_class_name_logits": b,
                 "pred_masks": m, "pred_region_logits": r}
                for (a, b, m, r) in preds[:-1]
            ],
        }
