"""Round-1 VERDICT missing #4/#5/#6: legacy mm_use_im_start_end variants,
the serving moderation hook, and packed-int4 quantized load."""

import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.data.constants import (DEFAULT_IM_END_TOKEN,
                                      DEFAULT_IM_START_TOKEN,
                                      IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                      SEG_TOKEN_INDEX)
from psalm_tpu.data.splicer import splice


# ---------------------------------------------------------------------------
# legacy im_start/im_end splicer + vision-tokenizer init


def test_legacy_im_start_end_label_shift():
    # <t> <im_start> <image> <im_end> <t> ; labels 10..14
    ids = [5, 6, IMAGE_TOKEN_INDEX, 7, 8, SEG_TOKEN_INDEX]
    labels = [10, 11, 12, 13, 14, -100]
    s = splice(ids, labels, num_image_tokens=3, num_seg_queries=2,
               pad_len=32, legacy_im_start_end=True)
    # layout: t(5) t(6) [img x3] t(7) t(8) [seg x2]
    lab = s.labels[:s.length].tolist()
    assert lab[:2] == [10, 11]
    assert lab[2:5] == [IGNORE_INDEX] * 3
    # the <im_end> row (token 7) carries the label from the <image> position
    # (llava_arch.py:112-114), token 8 keeps its own
    assert lab[5] == 12
    assert lab[6] == 14

    # default mode: index-aligned labels, no shift
    s2 = splice(ids, labels, num_image_tokens=3, num_seg_queries=2,
                pad_len=32)
    assert s2.labels[:s2.length].tolist()[5] == 13


class _Tok:
    """Minimal HF-like tokenizer for add_tokens/len."""

    def __init__(self, vocab=32):
        self.n = vocab
        self.added = []

    def add_tokens(self, toks, special_tokens=True):
        new = [t for t in toks if t not in self.added]
        self.added += new
        self.n += len(new)
        return len(new)

    def __len__(self):
        return self.n


def test_initialize_vision_tokenizer_mean_init_and_graft():
    from psalm_tpu.checkpoint.weight_tools import initialize_vision_tokenizer
    rng = np.random.default_rng(0)
    V, D = 32, 8
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head = rng.standard_normal((D, V)).astype(np.float32)
    variables = {"params": {"phi": {
        "model": {"embed_tokens": {"embedding": emb.copy()}},
        "lm_head": {"kernel": head.copy()},
    }}}
    tok = _Tok(V)

    out = initialize_vision_tokenizer(variables, tok,
                                      mm_use_im_start_end=True)
    assert tok.added == [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN]
    new_emb = out["params"]["phi"]["model"]["embed_tokens"]["embedding"]
    new_head = out["params"]["phi"]["lm_head"]["kernel"]
    assert new_emb.shape == (V + 2, D) and new_head.shape == (D, V + 2)
    np.testing.assert_allclose(new_emb[-1], emb.mean(0), rtol=1e-6)
    np.testing.assert_allclose(new_head[:, -1], head.mean(1), rtol=1e-6)

    # adapter graft (llava_arch.py:203-216): rows from the pretrain ckpt
    graft = rng.standard_normal((2, D)).astype(np.float32)
    tok2 = _Tok(V)
    out2 = initialize_vision_tokenizer(
        {"params": {"phi": {
            "model": {"embed_tokens": {"embedding": emb.copy()}},
            "lm_head": {"kernel": head.copy()}}}},
        tok2, mm_use_im_start_end=True,
        pretrain_adapter_sd={"model.embed_tokens.weight": graft})
    np.testing.assert_allclose(
        out2["params"]["phi"]["model"]["embed_tokens"]["embedding"][-2:],
        graft)


def test_adapter_pretrain_gradient_masking():
    """trainable_token_ids: only the listed embedding rows receive grads
    through the spliced sequence (llava_arch.py:106-135 detach semantics)."""
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.psalm import PSALM
    import __graft_entry__ as ge

    cfg = tiny_test_config()
    K = 3
    model = PSALM(cfg)
    batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
    params = model.init(jax.random.PRNGKey(0), batch, use_class_names=True,
                        num_class_names=K)
    tid = int(np.asarray(batch["tok_ids"])[0, 0])  # a real text token

    def loss(p, trainable):
        out = model.apply(p, batch, use_class_names=True, num_class_names=K,
                          trainable_token_ids=trainable)
        return jnp.sum(out["logits"] ** 2) * 1e-6

    g = jax.grad(loss)(params, (tid,))
    emb_g = np.asarray(
        g["params"]["phi"]["model"]["embed_tokens"]["embedding"])
    rows = np.where(np.abs(emb_g).sum(-1) > 0)[0]
    # all flowing embedding grads confined to the trainable id (lm_head ties
    # don't exist: separate kernel)
    assert set(rows) <= {tid}, rows


# ---------------------------------------------------------------------------
# moderation hook


def test_moderation_fails_open_without_key(monkeypatch):
    from psalm_tpu.serve.moderation import violates_moderation
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert violates_moderation("anything") is False


def test_moderation_flagged(monkeypatch):
    import http.server
    import socketserver
    from psalm_tpu.serve import moderation

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.dumps({"results": [{"flagged": True}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        monkeypatch.setenv("OPENAI_API_KEY", "test")
        real = moderation.urllib.request.urlopen
        port = srv.server_address[1]

        def fake_urlopen(req, timeout=None):
            import urllib.request as ur
            return real(ur.Request(
                f"http://127.0.0.1:{port}/", data=req.data,
                headers=dict(req.header_items())), timeout=timeout)

        monkeypatch.setattr(moderation.urllib.request, "urlopen",
                            fake_urlopen)
        assert moderation.violates_moderation("bad text") is True
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# int4 packed quantized load


def test_int4_pack_roundtrip_error_bounded():
    from psalm_tpu.models.quant import quantize_kernel_int4
    rng = np.random.default_rng(1)
    k = rng.standard_normal((128, 24)).astype(np.float32)
    packed, scale = quantize_kernel_int4(k, group=64)
    assert packed.shape == (64, 24) and packed.dtype == np.int8
    assert scale.shape == (2, 24)
    # unpack the same way the module does (half-split: byte i = low nibble
    # row i, high nibble row half+i)
    low = (packed.astype(np.int8) << 4).astype(np.int8) >> 4
    high = packed.astype(np.int8) >> 4
    q = np.concatenate([low, high], axis=0).astype(np.float32)
    deq = q * np.repeat(scale, 64, axis=0)
    err = np.abs(deq - k)
    bound = np.repeat(scale, 64, axis=0) / 2 + 1e-6
    assert (err <= bound).all()


def test_phi_int4_forward_close():
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.phi import PhiModel
    from psalm_tpu.models.quant import quantize_phi_int4
    import dataclasses

    cfg = tiny_test_config().phi
    model = PhiModel(cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, cfg.hidden_size) * 0.5, jnp.float32)
    mask = jnp.ones((1, 12), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), inputs_embeds=x,
                           attention_mask=mask)
    want = model.apply(variables, inputs_embeds=x, attention_mask=mask)[0]

    qcfg = dataclasses.replace(cfg, quant_bits=4)
    qmodel = PhiModel(qcfg)
    qvars = quantize_phi_int4({"params": {"phi": variables["params"]}})
    got = qmodel.apply({"params": qvars["params"]["phi"]}, inputs_embeds=x,
                       attention_mask=mask)[0]
    # int4 is lossy; agreement within a coarse bound proves the packed
    # nibble layout decodes correctly (wrong order would be wildly off)
    rel = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
    assert rel < 0.25, rel
    leaf = qvars["params"]["phi"]["layers_0"]["self_attn"]["q_proj"]
    assert leaf["kernel_q4"].dtype == jnp.int8
    assert leaf["kernel_q4"].shape[0] == cfg.hidden_size // 2
    assert "kernel" not in leaf


def test_builder_load_4bit_flag(tmp_path):
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.builder import load_pretrained_model
    _, model, variables, _ = load_pretrained_model(
        str(tmp_path / "nonexistent"), cfg=tiny_test_config(),
        load_4bit=True)
    assert model.cfg.phi.quant_bits == 4
