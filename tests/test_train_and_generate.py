"""Training-loop smoke (3 steps, loss finite, checkpoint save/resume) and
KV-cache generation through the multimodal prefix."""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tiny_setup(tmp_path):
    from test_data_pipeline import _write_synthetic_coco, StubTokenizer, _cfg
    from psalm_tpu.config import tiny_test_config, SegTask
    from psalm_tpu.data.datasets import PanopticDataset, UnifiedTaskSampler
    from psalm_tpu.models.psalm import PSALM

    root, inst_json = _write_synthetic_coco(str(tmp_path))
    tok = StubTokenizer()
    dcfg = _cfg()
    ds = PanopticDataset(root, tok, dcfg, is_train=False)
    ds.is_train = True  # emit labels
    cfg = tiny_test_config().replace(seg_task=SegTask.PANOPTIC)
    model = PSALM(cfg)
    return root, ds, cfg, model


def test_build_train_config_window_defaults():
    """Pins the arg->config policy for window mode: the manual VJP is the
    measured-best default (-1), 0 opts out, radii/scan/h settings hold."""
    from psalm_tpu.train.train import build_train_config, parse_args

    args = parse_args(["--output_dir", "/tmp/x",
                       "--pixel_decoder_mode", "window"])
    pd = build_train_config(args).pixel_decoder
    assert pd.attention_mode == "window"
    assert pd.window_custom_vjp is True          # measured-best default
    assert pd.window_scan_tiles is False          # AD fallback formulation
    assert pd.window_head_chunk == 1
    assert pd.window_radius == 8.0

    args = parse_args(["--output_dir", "/tmp/x",
                       "--pixel_decoder_mode", "window",
                       "--window_custom_vjp", "0",
                       "--window_point_radii", "2,4,6,8"])
    pd = build_train_config(args).pixel_decoder
    assert pd.window_custom_vjp is False
    assert pd.window_point_radii == (2.0, 4.0, 6.0, 8.0)


def test_trainer_remat_pixel_default(tmp_path):
    """Measured-best remat policy: with the manual VJP at per-chip batch 1,
    the pixel decoder skips gradient checkpointing (full step 382.7 vs
    453.9 ms, BASELINE.md round 5); explicit --remat_pixel_decoder wins."""
    from psalm_tpu.train.train import Trainer, parse_args

    args = parse_args(["--output_dir", str(tmp_path),
                       "--pixel_decoder_mode", "window",
                       "--gradient_checkpointing", "1",
                       "--per_device_train_batch_size", "1"])
    t = Trainer(args)
    assert t.model.remat_pixel is False
    args = parse_args(["--output_dir", str(tmp_path),
                       "--pixel_decoder_mode", "window",
                       "--gradient_checkpointing", "1",
                       "--per_device_train_batch_size", "2"])
    t = Trainer(args)
    assert t.model.remat_pixel is None  # follows remat at larger batches
    args = parse_args(["--output_dir", str(tmp_path),
                       "--pixel_decoder_mode", "window",
                       "--remat_pixel_decoder", "1"])
    t = Trainer(args)
    assert t.model.remat_pixel is True


def test_train_loop_and_resume(tmp_path):
    from psalm_tpu.data.datasets import UnifiedTaskSampler
    from psalm_tpu.train.train import Trainer
    import __graft_entry__ as ge

    root, ds, cfg, model = _tiny_setup(tmp_path)
    out_dir = str(tmp_path / "out")
    args = argparse.Namespace(
        output_dir=out_dir, learning_rate=1e-4, warmup_ratio=0.0,
        weight_decay=0.0, num_train_steps=3, per_device_train_batch_size=2,
        model_max_length=512, save_steps=2, save_total_limit=1,
        logging_steps=1, gradient_checkpointing=False, bf16=False,
        profile_steps=None, seg_task="panoptic", seed=0)

    trainer = Trainer(args, cfg=cfg, model=model)
    K = 4
    batch = ge._panoptic_batch(cfg, B=2, num_classes=K)
    trainer.variables = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch)

    sampler = UnifiedTaskSampler([ds], batch_size=2)
    state = trainer.train(sampler, None)
    assert int(state.step) == 3
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts == ["checkpoint-3"]  # keep-1 pruning
    assert os.path.exists(os.path.join(out_dir, "train_log.jsonl"))

    # resume: a fresh trainer picks up step 3 and continues to 5
    args.num_train_steps = 5
    trainer2 = Trainer(args, cfg=cfg, model=model)
    trainer2.variables = trainer.variables
    state2 = trainer2.train(UnifiedTaskSampler([ds], batch_size=2), None)
    assert int(state2.step) == 5


def test_generation_multimodal_prefix():
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.psalm import PSALM
    from psalm_tpu.models.generation import Generator
    import __graft_entry__ as ge

    cfg = tiny_test_config()
    model = PSALM(cfg)
    K = 3
    batch = ge._panoptic_batch(cfg, B=2, num_classes=K)
    variables = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                                num_class_names=K))(
        jax.random.PRNGKey(0), batch)

    gen = Generator(model, variables, max_len=batch["tok_ids"].shape[1] + 8,
                    cache_dtype=jnp.float32)
    toks = gen.generate(batch, max_new_tokens=4)
    assert toks.shape == (2, 4)
    assert (toks >= 0).all() and (toks < cfg.phi.vocab_size).all()
    # greedy decode is deterministic
    toks2 = gen.generate(batch, max_new_tokens=4)
    np.testing.assert_array_equal(toks, toks2)


def test_generation_batched_eos_handling():
    """B=2 decode with an EOS that fires at different steps per sequence:
    tokens after a sequence's EOS are replaced by eos_id, the other
    sequence keeps decoding, and streaming sees every token column."""
    from psalm_tpu.config import tiny_test_config
    from psalm_tpu.models.psalm import PSALM
    from psalm_tpu.models.generation import Generator
    import __graft_entry__ as ge

    cfg = tiny_test_config()
    model = PSALM(cfg)
    K = 3
    batch = ge._panoptic_batch(cfg, B=2, num_classes=K)
    variables = jax.jit(lambda r, b: model.init(r, b, use_class_names=True,
                                                num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    gen = Generator(model, variables, max_len=batch["tok_ids"].shape[1] + 16,
                    cache_dtype=jnp.float32)

    free = gen.generate(batch, max_new_tokens=6, chunk_size=2)
    # pick an eos that sequence 0 emits strictly before sequence 1 (or that
    # sequence 1 never emits) so the two sequences finish at different steps
    eos_id = None
    for j in range(6):
        tok0 = int(free[0, j])
        later1 = [int(t) for t in free[1, : j + 1]]
        if tok0 not in later1:
            eos_id = tok0
            break
    if eos_id is None:  # both sequences emit identical streams: still
        eos_id = int(free[0, 0])  # exercises simultaneous EOS

    seen = []
    toks = gen.generate(batch, max_new_tokens=6, eos_id=eos_id,
                        stream=lambda t: seen.append(np.array(t)),
                        chunk_size=2)
    B, T = toks.shape
    assert B == 2 and T <= 6
    assert len(seen) == T  # stream got every emitted column
    for b in range(B):
        row = toks[b]
        hit = np.where(row == eos_id)[0]
        if hit.size:  # everything after the first EOS is eos_id padding
            assert (row[hit[0]:] == eos_id).all()
    # pre-EOS tokens match the unconstrained run (EOS only truncates)
    for b in range(B):
        row = toks[b]
        hit = np.where(row == eos_id)[0]
        upto = hit[0] if hit.size else T
        np.testing.assert_array_equal(row[:upto], free[b, :upto])
