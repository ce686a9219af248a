"""Data-parallel eval: EvalRunner with a Mesh shards the batch over the
'data' axis and reproduces single-device results exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.config import SegTask, tiny_test_config
from psalm_tpu.eval.runner import EvalRunner
from psalm_tpu.models.psalm import PSALM


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_dp_eval_matches_single_device():
    import __graft_entry__ as ge
    from psalm_tpu.parallel.mesh import make_mesh

    cfg = tiny_test_config()
    K = 4
    model = PSALM(cfg)
    B = 4
    batch = ge._panoptic_batch(cfg, B=B, num_classes=K)
    s = cfg.image_size
    rng = np.random.default_rng(3)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    # non-square geometry, different per image
    batch["padding_mask"] = np.ones((B, s, s), bool)
    rh, oh = [], []
    for b in range(B):
        nh, nw = 40 + 4 * b, 64 - 8 * b
        batch["padding_mask"][b, :nh, :nw] = False
        rh.append((nh, nw))
        oh.append((30 + 10 * b, 50 + 5 * b))
    batch["resized_hw"] = np.asarray(rh)
    batch["original_hw"] = np.asarray(oh)

    variables = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch)

    single = EvalRunner(model, variables, cfg, num_class_names=K,
                        window_clamp_threshold=None, bucket_hw=(96, 96))
    ref = single.infer(batch)

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    dp = EvalRunner(model, variables, cfg, num_class_names=K,
                    window_clamp_threshold=None, bucket_hw=(96, 96),
                    mesh=mesh)
    got = dp.infer(batch)

    for b in range(B):
        np.testing.assert_array_equal(got["panoptic_seg"][b],
                                      ref["panoptic_seg"][b])
        np.testing.assert_array_equal(got["sem_seg"][b], ref["sem_seg"][b])
    for k in ("id", "category", "isthing", "valid"):
        np.testing.assert_array_equal(got["segments"][k], ref["segments"][k])
