"""Synthetic end-to-end exercise of the weights-day runbook (VERDICT r3
next-round #8): a random-weight checkpoint written in the released HF
state-dict layout runs through the REAL script seam —
scripts/weights_day.sh -> checkpoint/convert CLI -> orbax dir (+ config JSON
+ tokenizer files) -> eval CLI subprocesses loading --model_path — so any
path/flag rot is caught now, not on weights day."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_convert import synthetic_torch_sd
from test_data_pipeline import _write_synthetic_coco

from psalm_tpu.config import (config_from_json, config_to_json,
                              tiny_test_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_synthetic_hf_dir(tmp, cfg):
    """Random weights in the released sd layout + a minimal offline fast
    tokenizer (word-level; the datasets only call .encode)."""
    import torch
    hf = os.path.join(tmp, "hf_ckpt")
    os.makedirs(hf, exist_ok=True)
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               os.path.join(hf, "pytorch_model.bin"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    words = ("the a an is of image segmentation please do panoptic this all "
             "candidate categories sure result person sky left on").split()
    vocab = {"<unk>": 0, "<|endoftext|>": 1}
    vocab.update({w: i + 2 for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(hf, "tokenizer.json"))
    with open(os.path.join(hf, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "unk_token": "<unk>", "eos_token": "<|endoftext|>",
                   "model_max_length": cfg.phi.max_position_embeddings}, f)
    return hf


def test_config_json_roundtrip():
    cfg = tiny_test_config()
    back = config_from_json(config_to_json(cfg))
    assert back == cfg


@pytest.mark.slow
def test_weights_day_script_end_to_end(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_test_config()
    hf = _write_synthetic_hf_dir(tmp, cfg)
    coco_root, refer_json = _write_synthetic_coco(tmp)
    cfg_json = os.path.join(tmp, "tiny_cfg.json")
    with open(cfg_json, "w") as f:
        f.write(config_to_json(cfg))
    out = os.path.join(tmp, "wd_out")

    env = dict(os.environ,
               WD_CONFIG_JSON=cfg_json, WD_LIMIT="2", WD_MAX_LEN="512",
               # run the golden-pinning stage through the script seam too
               # (VERDICT r4 #6) — narrowed to one fast golden so the CI
               # invocation stays bounded; weights day runs it unfiltered
               WD_SKIP_GOLDENS="0",
               WD_GOLDEN_ARGS="-k golden_msdeform_oracle",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "weights_day.sh"),
         hf, coco_root, refer_json, out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
    assert proc.returncode == 0
    assert "WEIGHTS_DAY_OK" in proc.stdout
    # step 2 of the runbook ran as a script and emitted its marker
    assert "WD_GOLDENS_OK" in proc.stdout
    # the converted dir is self-contained: orbax + config + tokenizer
    orbax = os.path.join(out, "orbax")
    assert os.path.exists(os.path.join(orbax, "psalm_tpu_config.json"))
    assert os.path.exists(os.path.join(orbax, "tokenizer.json"))
    # the PQ step produced official-format prediction artifacts
    assert os.path.exists(os.path.join(out, "pq.log"))
    assert '"pq"' in open(os.path.join(out, "pq.log")).read()
