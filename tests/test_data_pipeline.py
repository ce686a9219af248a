"""Data pipeline tests with synthetic COCO-format data and a stub tokenizer:
RLE codec roundtrips, mapper geometry, dataset -> collate -> model-ready
batch, and the batch-homogeneity invariant of the task sampler."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from psalm_tpu.data import coco_rle
from psalm_tpu.data.datasets import (DataConfig, InstanceDataset,
                                     InteractiveDataset, PanopticDataset,
                                     ReferringDataset, UnifiedTaskSampler,
                                     collate)
from psalm_tpu.data.mappers import ImageMapper, resize_shortest_edge_shape


class StubTokenizer:
    """Deterministic word-level tokenizer for tests."""

    def encode(self, text, add_special_tokens=False):
        return [3 + (hash(w) % 500) for w in text.replace("\n", " \n ").split(" ")
                if w]


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(37, 23)) > 0.6).astype(np.uint8)
    rle = coco_rle.encode(mask)
    assert isinstance(rle["counts"], bytes)
    np.testing.assert_array_equal(coco_rle.decode(rle), mask)
    assert coco_rle.area(rle) == mask.sum()
    # iou identity
    assert coco_rle.iou(rle, rle) == 1.0


def test_rgb2id_roundtrip():
    ids = np.array([[0, 1], [256, 70000]], np.uint32)
    rgb = coco_rle.id2rgb(ids)
    np.testing.assert_array_equal(coco_rle.rgb2id(rgb), ids)


def test_resize_shortest_edge_semantics():
    # 480x640 with short=max=1024: short-edge scale overshoots, so the long
    # side is clamped to 1024 (the reference's effective behavior)
    assert resize_shortest_edge_shape(480, 640, 1024, 1024) == (768, 1024)
    assert resize_shortest_edge_shape(640, 480, 1024, 1024) == (1024, 768)
    assert resize_shortest_edge_shape(100, 100, 1024, 1024) == (1024, 1024)


def test_mapper_padding():
    mapper = ImageMapper(64)
    img = np.full((30, 60, 3), 200, np.uint8)
    proc = mapper.transform_image(img)
    assert proc.image.shape == (64, 64, 3)
    assert proc.resized_hw == (32, 64)
    # padded area below resized content; image pad value is 128 (pre-norm)
    assert proc.padding_mask[40:, :].all()
    assert not proc.padding_mask[:32, :].any()


def _write_synthetic_coco(tmp):
    """Minimal panoptic + instance data trees."""
    root = os.path.join(tmp, "coco")
    os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "panoptic_val2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    rng = np.random.default_rng(0)
    annotations = []
    for i in range(3):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "val2017", f"{i:012d}.jpg"))
        pan_id = np.zeros((48, 64), np.uint32)
        pan_id[:24] = 1
        pan_id[24:, :32] = 2
        Image.fromarray(coco_rle.id2rgb(pan_id)).save(
            os.path.join(root, "panoptic_val2017", f"{i:012d}.png"))
        annotations.append({
            "image_id": i, "file_name": f"{i:012d}.png",
            "segments_info": [
                {"id": 1, "category_id": 1, "iscrowd": 0},
                {"id": 2, "category_id": 7, "iscrowd": 0},
            ]})
    meta = {"annotations": annotations,
            "categories": [{"id": 1, "name": "person", "isthing": 1},
                           {"id": 7, "name": "sky", "isthing": 0}]}
    with open(os.path.join(root, "annotations/panoptic_val2017.json"), "w") as f:
        json.dump(meta, f)

    # instance/interactive/referring json
    inst = []
    for i in range(3):
        mask = np.zeros((48, 64), np.uint8)
        mask[10:30, 10:40] = 1
        rle = coco_rle.encode(mask)
        rle["counts"] = rle["counts"].decode()
        inst.append({
            "image": f"{i:012d}.jpg", "new_img_id": i,
            "image_info": {"height": 48, "width": 64,
                           "file_name": f"{i:012d}.jpg"},
            "instruction": [{"sent": "the person on the left"}],
            "anns": [{
                "category_id": 1, "bbox": [10, 10, 40, 30], "iscrowd": 0,
                "segmentation": dict(rle),
                "point_visual_prompt_mask": dict(rle),
            }]})
    with open(os.path.join(tmp, "instance.json"), "w") as f:
        json.dump(inst, f)
    return root, os.path.join(tmp, "instance.json")


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("data"))
    return _write_synthetic_coco(tmp)


def _cfg():
    return DataConfig(image_size=64, num_image_tokens=4, num_seg_queries=10,
                      pad_len=512, max_gt_masks=8, max_regions=4,
                      num_region_points=16)


def test_panoptic_dataset(synthetic):
    root, _ = synthetic
    ds = PanopticDataset(root, StubTokenizer(), _cfg(), is_train=False)
    s = ds[0]
    assert s["images"].shape == (64, 64, 3)
    assert s["gt_masks"].shape == (8, 64, 64)
    assert s["gt_valid"].sum() == 2
    assert s["num_class_names"] == 3  # person, sky, background
    assert s["seg_query_mask"].sum() == 10
    assert (s["class_name_embedding_indices"].max()) == 3
    batch = collate([ds[0], ds[1]])
    assert batch["tok_ids"].shape == (2, 512)


def test_interactive_and_referring(synthetic):
    root, inst_json = synthetic
    img_dir = os.path.join(root, "val2017")
    tok = StubTokenizer()
    inter = InteractiveDataset(inst_json, img_dir, tok, _cfg())
    s = inter[0]
    assert s["region_points"].shape == (4, 16, 2)
    assert s["region_valid"].tolist() == [True, False, False, False]
    assert s["region_embedding_mask"].sum() == 1
    assert s["gt_valid"].sum() == 1

    ref = ReferringDataset(inst_json, img_dir, tok, _cfg())
    r = ref[0]
    assert r["refer_embedding_indices"].sum() > 0
    assert r["dataset_type"] == "referring_coco"


def test_unified_sampler_homogeneous_batches(synthetic):
    root, inst_json = synthetic
    img_dir = os.path.join(root, "val2017")
    tok = StubTokenizer()
    pan = PanopticDataset(root, tok, _cfg(), is_train=False)
    inst = InstanceDataset(inst_json, img_dir, tok, _cfg())
    sampler = UnifiedTaskSampler([pan, inst], batch_size=2)
    types = []
    for _ in range(4):
        batch = sampler.next_batch()
        kinds = {s["dataset_type"] for s in batch}
        assert len(kinds) == 1
        types.append(kinds.pop())
    assert types == ["panoptic_coco", "instance_coco"] * 2


def test_native_rle_matches_numpy():
    from psalm_tpu import native
    from psalm_tpu.data.coco_rle import (_leb_encode, decode_uncompressed,
                                         encode_uncompressed)
    lib = native.get_lib()
    assert lib is not None, "native librle.so failed to build"
    rng = np.random.default_rng(3)
    for shape in [(37, 23), (64, 64), (5, 1)]:
        mask = (rng.uniform(size=shape) > 0.5).astype(np.uint8)
        slow = encode_uncompressed(mask)
        slow_bytes = _leb_encode(slow["counts"])
        fast = native.encode(mask)
        assert fast["counts"] == slow_bytes
        np.testing.assert_array_equal(native.decode(fast), mask)
    # crowd IoA parity with the numpy path
    from psalm_tpu.eval.metrics import mask_iou_matrix
    a = (rng.uniform(size=(3, 16, 16)) > 0.5)
    b = (rng.uniform(size=(2, 16, 16)) > 0.5)
    crowd = np.array([0, 1], np.uint8)
    fast = native.mask_iou_matrix(a.astype(np.uint8), b.astype(np.uint8), crowd)
    pa = a.reshape(3, -1).astype(np.float64)
    ga = b.reshape(2, -1).astype(np.float64)
    inter = pa @ ga.T
    union = pa.sum(1)[:, None] + ga.sum(1)[None, :] - inter
    union[:, 1] = pa.sum(1)
    want = inter / union
    np.testing.assert_allclose(fast, want, rtol=1e-9)


def test_native_rle_corrupt_raises():
    import pytest
    from psalm_tpu.data import coco_rle
    with pytest.raises(ValueError):
        coco_rle.decode({"size": [48, 64], "counts": "!!!corrupt"})


def test_semantic_dataset(tmp_path):
    import json
    from PIL import Image as PILImage
    from psalm_tpu.data.datasets import SemanticDataset
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "img"
    lbl_dir = tmp_path / "lbl"
    img_dir.mkdir()
    lbl_dir.mkdir()
    PILImage.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(
        img_dir / "a.jpg")
    lbl = np.full((48, 64), 255, np.uint8)
    lbl[:20] = 0
    lbl[20:40] = 2
    PILImage.fromarray(lbl).save(lbl_dir / "a.png")
    with open(tmp_path / "list.json", "w") as f:
        json.dump([{"image": "a.jpg", "label": "a.png"}], f)

    ds = SemanticDataset(str(tmp_path / "list.json"), str(img_dir),
                         str(lbl_dir), StubTokenizer(), _cfg(),
                         class_names=["sky", "sea", "rock", "background"])
    s = ds[0]
    assert s["gt_valid"].sum() == 2
    assert sorted(s["gt_labels"][:2].tolist()) == [0, 2]
    assert s["num_class_names"] == 4
    assert s["gt_masks"][:2].sum() > 0


class _ToySet:
    """Minimal dataset for sampler-sharding tests."""

    def __init__(self, name, n):
        self.name = name
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"dataset_type": self.name, "idx": i}


def test_sampler_host_shards_are_disjoint_and_schedule_synced():
    """Multi-host loading: same seed => identical task schedule on every
    host (jit signatures must agree globally); disjoint sample streams;
    reshuffles stay host-synchronized across epochs even when
    len % num_shards != 0 (the tail is dropped)."""
    mk = lambda: [_ToySet("a", 13), _ToySet("b", 7)]  # noqa: E731
    N = 4
    samplers = [UnifiedTaskSampler(mk(), batch_size=2, seed=3,
                                   shard_index=h, num_shards=N)
                for h in range(N)]
    # 3 epochs worth of draws from the bigger dataset
    steps = 24
    seen = [[s.next_batch() for _ in range(steps)] for s in samplers]
    for t in range(steps):
        kinds = {tuple(x["dataset_type"] for x in seen[h][t])
                 for h in range(N)}
        assert len(kinds) == 1  # schedule identical across hosts
    # within any single epoch pass of a dataset, shard streams are disjoint
    for name, size in (("a", 13), ("b", 7)):
        eff = (size // N) * N
        per_host = [
            [x["idx"] for batch in host for x in batch
             if x["dataset_type"] == name]
            for host in seen
        ]
        epoch_len = eff // N
        for e in range(2):
            chunk = [set(p[e * epoch_len:(e + 1) * epoch_len])
                     for p in per_host]
            union = set().union(*chunk)
            assert len(union) == sum(len(c) for c in chunk), \
                f"overlap within epoch {e} of {name}"


def test_sampler_tiny_dataset_smaller_than_hosts():
    s = UnifiedTaskSampler([_ToySet("a", 2)], batch_size=1, seed=0,
                           shard_index=3, num_shards=4)
    idxs = [next(s)["idx"] for _ in range(6)]
    assert all(0 <= i < 2 for i in idxs)


def test_make_global_batch_shards_batch_axis():
    import jax
    from jax.sharding import PartitionSpec as P
    from psalm_tpu.parallel.mesh import make_global_batch, make_mesh
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device CPU mesh")
    mesh = make_mesh(data=len(jax.devices()), model=1)
    local = {"images": np.zeros((8, 4, 4, 3), np.float32),
             "dataset_type": "panoptic_coco",
             "gt_valid": np.ones((8, 5), bool)}
    out = make_global_batch(mesh, local)
    assert out["dataset_type"] == "panoptic_coco"
    assert out["images"].sharding.spec == P("data")
    assert out["images"].shape == (8, 4, 4, 3)
