"""Segmentation-over-HTTP: SegmentService (panoptic / semantic / referring)
with a tiny converted model, plus the /worker_segment endpoint contract —
a capability the reference's serving stack does not expose (chat only,
psalm/serve/model_worker.py)."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_convert import synthetic_torch_sd
from test_data_pipeline import StubTokenizer

from psalm_tpu.checkpoint.convert import convert_psalm_checkpoint
from psalm_tpu.config import tiny_test_config
from psalm_tpu.data import coco_rle
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.serve.segmentation import SegmentService


@pytest.fixture(scope="module")
def service():
    cfg = tiny_test_config()
    sd = synthetic_torch_sd(cfg, np.random.default_rng(0))
    variables = jax.tree.map(jnp.asarray, convert_psalm_checkpoint(sd, cfg))
    names = [f"class_{i}" for i in range(cfg.num_classes)] + ["background"]
    return SegmentService(PSALM(cfg), variables, StubTokenizer(), cfg,
                          class_names=names, max_length=512)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(1)
    return rng.integers(0, 255, (48, 56, 3), np.uint8)


def test_panoptic_segments_are_valid_rles(service, image):
    out = service.panoptic(image)
    assert (out["height"], out["width"]) == image.shape[:2]
    for seg in out["segments"]:
        m = coco_rle.decode({"size": seg["rle"]["size"],
                             "counts": seg["rle"]["counts"]})
        assert m.shape == image.shape[:2]
        assert m.any()
        assert seg["category"] == f"class_{seg['category_id']}" or \
            seg["category_id"] < len(service.class_names)


def test_semantic_covers_image(service, image):
    out = service.semantic(image)
    total = np.zeros(image.shape[:2], np.int64)
    for c in out["classes"]:
        m = coco_rle.decode({"size": c["rle"]["size"],
                             "counts": c["rle"]["counts"]})
        total += m.astype(np.int64)
    # argmax map: every pixel belongs to at most one class; classes listed
    # are only the in-vocabulary ones so coverage can be partial
    assert total.max() <= 1


def test_referring_returns_one_mask(service, image):
    out = service.referring(image, "the thing on the left")
    m = coco_rle.decode({"size": out["rle"]["size"],
                         "counts": out["rle"]["counts"]})
    assert m.shape == image.shape[:2]
    assert 0.0 <= out["score"] <= 1.0


def test_unknown_task_raises(service, image):
    with pytest.raises(ValueError, match="unknown segmentation task"):
        service.segment(image, "detection")
    with pytest.raises(ValueError, match="requires 'expression'"):
        service.segment(image, "referring")


def test_worker_segment_endpoint(service, image):
    """Drive the real handler + a worker exposing the loaded service."""
    from psalm_tpu.serve.model_worker import ModelWorker, make_handler

    worker = ModelWorker.__new__(ModelWorker)
    worker.semaphore = threading.Semaphore(1)
    worker.queue_length = 0
    worker._segmenter = service

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="PNG")
        payload = {"image": base64.b64encode(buf.getvalue()).decode(),
                   "task": "panoptic"}
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/worker_segment",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["error_code"] == 0
        assert (out["height"], out["width"]) == image.shape[:2]

        # missing image -> structured error, not a 500
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/worker_segment",
            data=json.dumps({"task": "panoptic"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["error_code"] == 1
    finally:
        srv.shutdown()
