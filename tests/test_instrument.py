"""Window-mode exactness instrumentation (VERDICT r1 #4).

The MSDeformAttn layers sow per-layer max |offset| (target-level px) and the
fraction of samples the window clamp would touch; the eval runner validates
the first batch and falls back to the unclamped parity path when the rate
exceeds its threshold.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from psalm_tpu.config import tiny_test_config
from psalm_tpu.eval.instrument import offset_clamp_report, summarize
from psalm_tpu.models.psalm import PSALM


def _setup(attention_mode="window"):
    import __graft_entry__ as ge
    cfg = tiny_test_config()
    cfg = cfg.replace(pixel_decoder=dataclasses.replace(
        cfg.pixel_decoder, attention_mode=attention_mode))
    K = 4
    model = PSALM(cfg)
    batch = ge._panoptic_batch(cfg, B=1, num_classes=K)
    params = model.init(jax.random.PRNGKey(0), batch, use_class_names=True,
                        num_class_names=K)
    return cfg, model, params, batch, K


def test_offset_clamp_report_per_layer():
    cfg, model, params, batch, K = _setup()
    report = offset_clamp_report(model, params, batch, use_class_names=True,
                                 num_class_names=K)
    assert len(report) == cfg.pixel_decoder.transformer_enc_layers
    for layer, stats in report.items():
        assert "encoder_layer_" in layer
        assert set(stats) == {"offset_max", "clamp_frac"}
        # zero-kernel offset head: |offset| == |bias| <= n_points at init
        # (reference ms_deform_attn.py:70-80)
        assert stats["offset_max"] <= cfg.pixel_decoder.enc_points + 1e-5
        assert stats["clamp_frac"] == 0.0
    s = summarize(report)
    assert s["max_clamp_frac"] == 0.0
    assert 0.0 < s["max_offset_px"] <= cfg.pixel_decoder.enc_points + 1e-5


def test_runner_window_radius_adapt_and_fallback(monkeypatch):
    from psalm_tpu.eval.runner import EvalRunner
    cfg, model, params, batch, K = _setup()
    # tiny radius: the init offsets (magnitude up to n_points=4) exceed it;
    # the runner should RAISE the radius to cover them, keeping window mode
    cfg_small = cfg.replace(pixel_decoder=dataclasses.replace(
        cfg.pixel_decoder, window_radius=0.5))
    model_small = dataclasses.replace(model, cfg=cfg_small)
    s = cfg.image_size
    batch = dict(batch, padding_mask=jnp.zeros((1, s, s), bool))
    runner = EvalRunner(model_small, params, cfg_small, num_class_names=K,
                        window_clamp_threshold=1e-3)
    out = runner.infer(batch)
    assert runner.window_stats is not None
    assert runner.window_stats["max_clamp_frac"] > 1e-3
    assert runner.cfg.pixel_decoder.attention_mode == "window"
    assert runner.cfg.pixel_decoder.window_radius >= \
        runner.window_stats["max_offset_px"]
    assert np.isfinite(out["panoptic_seg"]).all()

    # extreme offsets (reported via a patched summarize): parity fallback
    # (the runner imports summarize lazily, so patching the module works)
    import psalm_tpu.eval.instrument as instr
    monkeypatch.setattr(instr, "summarize",
                        lambda rep: {"max_offset_px": 50.0,
                                     "max_clamp_frac": 0.5})
    runner2 = EvalRunner(model_small, params, cfg_small, num_class_names=K,
                         window_clamp_threshold=1e-3)
    runner2.infer(batch)
    assert runner2.cfg.pixel_decoder.attention_mode == "deformable"

    # generous radius: window mode kept as-is
    monkeypatch.undo()
    runner3 = EvalRunner(model, params, cfg, num_class_names=K,
                         window_clamp_threshold=1e-3)
    runner3.infer(batch)
    assert runner3.cfg.pixel_decoder.attention_mode == "window"
    assert runner3.window_stats["max_clamp_frac"] == 0.0
