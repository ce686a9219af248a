"""Weight utilities: delta checkpoints and consolidation.

Reference spec: psalm/model/make_delta.py / apply_delta.py / consolidate.py —
LLaVA-style delta = target minus base over shared keys (embedding rows beyond
the base vocab kept verbatim), applied in reverse to reconstruct.
Operates on flax param pytrees saved with orbax.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax


def _zip_trees(a, b, fn):
    return jax.tree.map(fn, a, b)


def make_delta(base_params: Any, target_params: Any) -> Any:
    """delta = target - base, except leaves whose shapes differ (e.g. resized
    vocab embeddings): kept as the raw target values (make_delta.py:15)."""
    def leaf(b, t):
        b, t = np.asarray(b), np.asarray(t)
        if b.shape == t.shape:
            return t - b
        return t

    return _zip_trees(base_params, target_params, leaf)


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    def leaf(b, d):
        b, d = np.asarray(b), np.asarray(d)
        if b.shape == d.shape:
            return b + d
        return d

    return _zip_trees(base_params, delta_params, leaf)


def consolidate(variables: Dict[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """Cast every leaf to one dtype for release (consolidate.py:13)."""
    return jax.tree.map(lambda x: np.asarray(x, dtype), variables)


def initialize_vision_tokenizer(variables: Dict[str, Any], tokenizer,
                                mm_use_im_patch_token: bool = False,
                                mm_use_im_start_end: bool = False,
                                pretrain_adapter_sd: Dict[str, Any] = None
                                ) -> Dict[str, Any]:
    """Legacy LLaVA vision-tokenizer setup (llava_arch.py:181-223).

    Adds <im_patch> and/or <im_start>/<im_end> to the tokenizer, grows the
    Phi embedding table and lm_head to the new vocab with MEAN-of-existing
    initialization for the new rows, and (mm_use_im_start_end +
    pretrain_adapter_sd) grafts the adapter checkpoint's embed_tokens rows —
    the checkpoint-surface behavior the released weights' tokenizer layout
    depends on. Returns the updated variables tree.
    """
    from psalm_tpu.data.constants import (DEFAULT_IM_END_TOKEN,
                                          DEFAULT_IM_START_TOKEN,
                                          DEFAULT_IMAGE_PATCH_TOKEN)

    num_new = 0
    if mm_use_im_patch_token:
        num_new += tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN],
                                        special_tokens=True)
    start_end_new = 0
    if mm_use_im_start_end:
        start_end_new = tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
            special_tokens=True)
        num_new += start_end_new
    if num_new == 0:
        return variables

    params = variables["params"]
    phi = params["phi"]
    # copy=True: the grow==0 path below writes emb[-start_end_new:] in
    # place; np.asarray would alias the caller's leaves and mutate the
    # input tree, breaking this function's pure return-value contract
    emb = np.array(phi["model"]["embed_tokens"]["embedding"], copy=True)
    head = np.array(phi["lm_head"]["kernel"], copy=True)  # [D, V]
    new_vocab = len(tokenizer)
    grow = new_vocab - emb.shape[0]
    assert grow >= 0
    if grow > 0:
        emb_avg = emb.mean(axis=0, keepdims=True)
        head_avg = head.mean(axis=1, keepdims=True)
        emb = np.concatenate(
            [emb, np.repeat(emb_avg, grow, axis=0)], axis=0)
        head = np.concatenate(
            [head, np.repeat(head_avg, grow, axis=1)], axis=1)

    if mm_use_im_start_end and pretrain_adapter_sd is not None:
        w = pretrain_adapter_sd.get("model.embed_tokens.weight")
        if w is not None:
            w = np.asarray(w)
            assert start_end_new == 2, start_end_new
            if w.shape == emb.shape:
                emb[-start_end_new:] = w[-start_end_new:]
            elif w.shape[0] == start_end_new:
                emb[-start_end_new:] = w
            else:
                raise ValueError(
                    f"Unexpected embed_tokens shape {w.shape} for embedding "
                    f"{emb.shape} with {start_end_new} new tokens")

    phi = dict(phi)
    phi["model"] = dict(phi["model"],
                        embed_tokens={"embedding": emb})
    phi["lm_head"] = dict(phi["lm_head"], kernel=head)
    return {**variables, "params": {**params, "phi": phi}}
