"""End-to-end eval CLI tests for the remaining task families (panoptic is
covered in test_metrics): instance AP, referring cIoU/gIoU, interactive
region IoU, gRefCOCO fuse — all on the synthetic COCO tree with a tiny
converted model."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_convert import synthetic_torch_sd
from test_data_pipeline import StubTokenizer, _write_synthetic_coco

from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from psalm_tpu.config import SegTask, tiny_test_config
from psalm_tpu.models.psalm import PSALM


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
    return cfg, variables


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("data"))
    return _write_synthetic_coco(tmp)


def _args(json_path, image_folder, **kw):
    base = dict(model_path="", json_path=json_path, image_folder=image_folder,
                eval_batch_size=1, model_max_length=512, output_dir=None,
                limit=2)
    base.update(kw)
    return argparse.Namespace(**base)


def test_instance_eval_cli(tiny_model, synthetic):
    from psalm_tpu.eval.instance_segmentation import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    import os
    res = evaluation(_args(inst_json, os.path.join(root, "val2017")),
                     cfg=cfg.replace(seg_task=SegTask.INSTANCE),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.INSTANCE)),
                     variables=variables)
    assert np.isfinite(res["instance"]["AP"])


def test_referring_eval_cli(tiny_model, synthetic):
    from psalm_tpu.eval.referring_segmentation import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    import os
    res = evaluation(_args(inst_json, os.path.join(root, "val2017")),
                     cfg=cfg.replace(seg_task=SegTask.REFERRING),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.REFERRING)),
                     variables=variables)
    assert 0 <= res["referring"]["cIoU"] <= 100
    assert 0 <= res["referring"]["gIoU"] <= 100


def test_region_eval_cli(tiny_model, synthetic):
    from psalm_tpu.eval.region_segmentation import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    import os
    res = evaluation(_args(inst_json, os.path.join(root, "val2017"),
                           region_mask_type="point_visual_prompt_mask"),
                     cfg=cfg.replace(seg_task=SegTask.REGION),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.REGION)),
                     variables=variables)
    assert 0 <= res["region"]["cIoU"] <= 100


def test_grefcoco_eval_cli(tiny_model, synthetic):
    from psalm_tpu.eval.eval_grefcoco import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    import os
    res = evaluation(_args(inst_json, os.path.join(root, "val2017"), thr=0.6),
                     cfg=cfg.replace(seg_task=SegTask.REFERRING),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.REFERRING)),
                     variables=variables)
    assert 0 <= res["grefcoco"]["gIoU"] <= 100


def test_cityscapes_instance_eval_cli(tiny_model, synthetic):
    from psalm_tpu.eval.cityscapes_instance import evaluation
    cfg, variables = tiny_model
    root, inst_json = synthetic
    import os
    res = evaluation(_args(inst_json, os.path.join(root, "val2017")),
                     cfg=cfg.replace(seg_task=SegTask.INSTANCE),
                     tokenizer=StubTokenizer(),
                     model=PSALM(cfg.replace(seg_task=SegTask.INSTANCE)),
                     variables=variables)
    assert np.isfinite(res["cityscapes_instance"]["AP"])
