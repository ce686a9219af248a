"""PSALM top-level model: Swin tower + projector + Phi LLM + mask head.

Behavioral spec: the PSALM class (llava_phi.py:146-1475). The LLM's hidden
states condition the mask decoder four ways (llava_phi.py:1040-1093):
  (a) 100 learned seg-query tokens run *through the LLM* become the
      Mask2Former object queries (get_seg_query :1299, projector :1077);
  (b) class-name embeddings = mean-pooled hidden states of each category
      name token span (get_class_name_embedding :552);
  (c) a [SEG]/refer embedding = mean-pooled hidden states of the referring
      tokens (get_SEG_embedding :972);
  (d) region embeddings = visual-prompt tokens' hidden states
      (get_region_embedding :302).

TPU-first redesign: no per-sample Python chunk loop. The host pipeline emits
static aligned index arrays (data/splicer.py); on device the spliced sequence
is assembled with vectorized gathers (assemble_embeddings), and the four
conditioning extractions are segment means via one-hot matmuls plus a stable
argsort gather — all static shapes, all fusable by XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import PSALMConfig
from psalm_tpu.data.constants import SRC_IMAGE, SRC_REGION, SRC_SEG_QUERY, SRC_TEXT
from psalm_tpu.models.mask_decoder import MaskDecoder
from psalm_tpu.models.phi import PhiForCausalLM
from psalm_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from psalm_tpu.models.projector import build_projector
from psalm_tpu.models.swin import SwinTransformer
from psalm_tpu.ops.sampling import point_sample_mmgrad


def positions_of_mask(mask: jnp.ndarray, count: int) -> jnp.ndarray:
    """First ``count`` positions where mask!=0, in order — static shape.

    mask: [B, L] -> [B, count] int32. Relies on stable argsort: zeros of
    (mask==0) sort first, preserving original order.
    """
    order = jnp.argsort((mask == 0).astype(jnp.int32), axis=-1, stable=True)
    return order[:, :count]


def segment_mean(hidden: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int):
    """Mean of hidden states per segment id 1..num_segments.

    hidden: [B, L, D]; seg_ids: [B, L] with 0 = no segment.
    Returns (means [B, num_segments, D], valid [B, num_segments]).
    """
    onehot = jax.nn.one_hot(seg_ids, num_segments + 1, dtype=hidden.dtype)
    onehot = onehot[..., 1:]  # drop background
    sums = jnp.einsum("blk,bld->bkd", onehot, hidden)
    counts = jnp.sum(onehot, axis=1)  # [B, K]
    means = sums / jnp.maximum(counts, 1.0)[..., None]
    return means, counts > 0


class PSALM(nn.Module):
    cfg: PSALMConfig
    dtype: Any = jnp.float32
    remat: bool = False
    # pixel-decoder remat override (None = follow ``remat``). With the
    # window op's manual VJP (config window_custom_vjp) only the op INPUTS
    # are saved (~100 MB/encoder-layer at B=1 1024^2), so rematerializing
    # the encoder layers buys little memory while costing a full encoder
    # forward recompute in the backward — False skips it (VERDICT r4 #2).
    remat_pixel: Any = None
    train_backbone: bool = False
    use_flash: bool = False

    def setup(self):
        c = self.cfg
        self.vision_tower = SwinTransformer(c.swin, dtype=self.dtype)
        self.mm_projector = build_projector(c.projector, dtype=self.dtype,
                                            name=None)
        self.phi = PhiForCausalLM(c.phi, dtype=self.dtype, remat=self.remat,
                                  use_flash=self.use_flash)
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            c.pixel_decoder, dtype=self.dtype,
            remat=(self.remat if self.remat_pixel is None
                   else self.remat_pixel))
        self.predictor = MaskDecoder(c.mask_decoder, dtype=self.dtype)
        hd = c.mask_decoder.hidden_dim
        self.seg_query = self.param("seg_query", nn.initializers.zeros,
                                    (c.mask_decoder.num_queries, c.phi.hidden_size))
        self.seg_query_projector = nn.Dense(hd, dtype=self.dtype)
        self.SEG_token_projector = nn.Dense(hd, dtype=self.dtype)
        self.class_name_projector = nn.Dense(hd, dtype=self.dtype)
        self.region_projector = nn.Dense(hd, dtype=self.dtype)

    # ------------------------------------------------------------------
    # vision

    def encode_images(self, images: jnp.ndarray, train: bool = False):
        """images: [B, H, W, 3] -> (features tuple res2..res5,
        image tokens [B, N, D_llm]).

        The vision tower is frozen in the reference's shipped recipe
        (train.py:416-442, frozen unless --train_backbone), so drop-path only
        activates when the caller explicitly trains the backbone (pass a
        'dropout' rng through apply in that case)."""
        if images.dtype == jnp.uint8:
            # device-side ImageNet normalization: the mapper may ship raw
            # uint8 canvases (4x less host->device traffic than normalized
            # f32); identical math to data/mappers.py PIXEL_MEAN/STD
            mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
            std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)
            images = (images.astype(jnp.float32) - mean) / std
        feats = self.vision_tower(images, deterministic=not (
            train and self.train_backbone))
        if train and not self.train_backbone:
            # frozen tower (reference default): cut the graph so backward
            # never materializes Swin activations — the dominant train-time
            # memory cost at 1024^2
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        tokens = self.mm_projector(feats[-1], train=False)
        return feats, tokens

    def sample_regions(self, image_tokens: jnp.ndarray,
                       region_points: jnp.ndarray) -> jnp.ndarray:
        """Visual-prompt region features (region_pooling,
        context_cluster.py:333-410): bilinearly sample the token map at
        pre-sampled in-mask points (host-sampled, 256/region), average-pool.

        image_tokens: [B, N, D] with N = n*n; region_points: [B, R, P, 2]
        (x, y) in [0,1]. Returns [B, R, D].
        """
        B, N, D = image_tokens.shape
        n = int(round(N ** 0.5))
        fmap = image_tokens.reshape(B, n, n, D)
        R, P = region_points.shape[1:3]
        pts = region_points.reshape(B, R * P, 2)
        sampled = point_sample_mmgrad(fmap, pts, align_corners=True)
        return sampled.reshape(B, R, P, D).mean(axis=2)

    # ------------------------------------------------------------------
    # sequence assembly (replaces llava_phi.py:581-766)

    def assemble_embeddings(self, tok_ids, src_type, src_idx, image_tokens,
                            region_tokens=None, trainable_token_ids=None):
        """Build the spliced input embedding sequence.

        tok_ids/src_type/src_idx: [B, L]; image_tokens: [B, N, D];
        region_tokens: [B, R, D] or None. Returns [B, L, D].

        trainable_token_ids: the legacy adapter-pretrain mode
        (tune_mm_mlp_adapter + mm_use_im_start_end, llava_arch.py:106-135):
        text embeddings are DETACHED except the listed token ids (the
        <im_start>/<im_end> rows), so only those embedding rows train.
        """
        text = self.phi.embed(tok_ids)
        if trainable_token_ids:
            keep = jnp.zeros(tok_ids.shape, bool)
            for t in trainable_token_ids:
                keep = keep | (tok_ids == t)
            text = jnp.where(keep[..., None], text,
                             jax.lax.stop_gradient(text))
        idx = src_idx[..., None]
        img = jnp.take_along_axis(image_tokens, jnp.clip(idx, 0, image_tokens.shape[1] - 1), axis=1)
        segq = self.seg_query.astype(text.dtype)[jnp.clip(src_idx, 0, self.seg_query.shape[0] - 1)]
        seq = jnp.where((src_type == SRC_IMAGE)[..., None], img, text)
        seq = jnp.where((src_type == SRC_SEG_QUERY)[..., None], segq, seq)
        if region_tokens is not None:
            reg = jnp.take_along_axis(
                region_tokens, jnp.clip(idx, 0, region_tokens.shape[1] - 1), axis=1)
            seq = jnp.where((src_type == SRC_REGION)[..., None], reg, seq)
        return seq

    # ------------------------------------------------------------------
    # main forward

    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 use_class_names: bool = True,
                 use_seg_embedding: bool = False,
                 use_regions: bool = False,
                 train: bool = False,
                 max_regions: int = 0,
                 num_class_names: Optional[int] = None,
                 compute_logits: bool = True,
                 trainable_token_ids=None) -> Dict[str, jnp.ndarray]:
        """Run the full spine: vision -> LLM -> pixel decoder -> predictor.

        batch keys (from data/splicer.py + collator):
          images [B, H, W, 3], tok_ids, src_type, src_idx, attention_mask,
          seg_query_mask, class_name_embedding_indices,
          refer_embedding_indices, region_embedding_mask,
          optionally region_points [B, R, P, 2], region_valid [B, R],
          random_idx [B, K] (training class-name shuffle), num_classes info
          is static via cfg.
        Returns dict with llm logits/hidden and the mask-decoder outputs.
        """
        c = self.cfg
        feats, image_tokens = self.encode_images(batch["images"], train=train)

        region_tokens = None
        if use_regions:
            # DAVIS video path: visual-prompt features come from the PREVIOUS
            # frame (vp_images), PSALMForDAVISEval (llava_phi.py:1639-1844);
            # otherwise from the current image.
            if "vp_images" in batch:
                _, vp_tokens = self.encode_images(batch["vp_images"],
                                                  train=False)
            else:
                vp_tokens = image_tokens
            region_tokens = self.sample_regions(vp_tokens,
                                                batch["region_points"])

        seq = self.assemble_embeddings(batch["tok_ids"], batch["src_type"],
                                       batch["src_idx"], image_tokens,
                                       region_tokens,
                                       trainable_token_ids=trainable_token_ids)
        if compute_logits:
            logits, hidden, _ = self.phi(seq,
                                         attention_mask=batch["attention_mask"])
        else:
            # eval_seg never reads the LM logits; skip the [B, L, vocab]
            # materialization (~290 GFLOP + 280 MB at full size)
            hidden, _ = self.phi.model(seq,
                                       attention_mask=batch["attention_mask"])
            logits = None

        # (a) seg queries
        nq = c.mask_decoder.num_queries
        seg_pos = positions_of_mask(batch["seg_query_mask"], nq)
        seg_hidden = jnp.take_along_axis(hidden, seg_pos[..., None], axis=1)
        seg_query = self.seg_query_projector(seg_hidden)

        # (b) class-name embeddings (+ optional training shuffle gather,
        # llava_phi.py:1049-1050)
        class_name_embedding = None
        class_valid = None
        if use_class_names:
            K = num_class_names or c.num_classes + 1
            means, valid = segment_mean(hidden,
                                        batch["class_name_embedding_indices"], K)
            class_name_embedding = self.class_name_projector(means)
            class_valid = valid
            if "random_idx" in batch and batch["random_idx"] is not None:
                ridx = batch["random_idx"]
                class_name_embedding = jnp.take_along_axis(
                    class_name_embedding, ridx[..., None], axis=1)
                class_valid = jnp.take_along_axis(class_valid, ridx, axis=1)

        # (c) [SEG]/refer embedding
        SEG_embedding = None
        if use_seg_embedding:
            means, _ = segment_mean(hidden, batch["refer_embedding_indices"], 1)
            SEG_embedding = self.SEG_token_projector(means)

        # (d) region embeddings
        region_embedding = None
        region_valid = None
        if use_regions:
            R = max_regions or batch["region_points"].shape[1]
            reg_pos = positions_of_mask(batch["region_embedding_mask"], R)
            reg_hidden = jnp.take_along_axis(hidden, reg_pos[..., None], axis=1)
            region_embedding = self.region_projector(reg_hidden)
            region_valid = batch.get("region_valid")

        # pixel decoder + predictor
        mask_features, _, multi_scale = self.pixel_decoder(feats)
        mask_out = self.predictor(
            multi_scale, mask_features, seg_query,
            SEG_embedding=SEG_embedding,
            class_name_embedding=class_name_embedding,
            class_name_valid=class_valid,
            region_embedding=region_embedding,
            region_valid=region_valid,
        )
        return {
            "logits": logits,
            "hidden": hidden,
            **mask_out,
        }
