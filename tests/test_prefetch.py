"""Async input pipeline (data/prefetch.py): determinism vs the synchronous
draw, multi-host shard disjointness preserved, overlap actually happens,
and error/termination behavior."""

import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from psalm_tpu.data.datasets import UnifiedTaskSampler, collate
from psalm_tpu.data.prefetch import PrefetchLoader


class SlowToyDataset:
    """Samples shaped like task-dataset outputs; __getitem__ sleeps to model
    mapper cost (JPEG decode + resize)."""

    def __init__(self, n, tag, delay=0.0):
        self.n, self.tag, self.delay = n, tag, delay

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if self.delay:
            time.sleep(self.delay)
        return {"input_ids": np.full((5,), idx, np.int32),
                "dataset_type": self.tag,
                "images": np.full((2, 2, 3), idx, np.float32)}


def _samplers(seed=3):
    dss = [SlowToyDataset(13, "panoptic"), SlowToyDataset(7, "referring")]
    return (UnifiedTaskSampler(dss, batch_size=4, seed=seed),
            UnifiedTaskSampler(dss, batch_size=4, seed=seed))


def test_prefetch_matches_synchronous_order():
    s_sync, s_async = _samplers()
    want = [collate(s_sync.next_batch()) for _ in range(10)]
    with PrefetchLoader(s_async, collate, num_workers=3,
                        num_batches=10) as loader:
        got = list(loader)
    assert len(got) == 10
    for w, g in zip(want, got):
        assert set(w) == set(g)
        for k in w:
            np.testing.assert_array_equal(np.asarray(w[k]), np.asarray(g[k]))


def test_prefetch_sharded_streams_stay_disjoint():
    dss = [SlowToyDataset(16, "panoptic")]
    loaders, seen = [], []
    for shard in range(2):
        s = UnifiedTaskSampler(dss, batch_size=2, seed=0,
                               shard_index=shard, num_shards=2)
        loaders.append(PrefetchLoader(s, collate, num_workers=2,
                                      num_batches=4))
    for ld in loaders:
        ids = np.concatenate([b["input_ids"][:, 0] for b in ld])
        seen.append(set(ids.tolist()))
        ld.close()
    assert seen[0].isdisjoint(seen[1])  # one epoch: disjoint shard streams


def test_prefetch_overlaps_mapper_work():
    """4 workers + prefetch over a 30 ms/sample mapper: wall time for 6
    batches of 4 must come in well under the serial 6*4*30 ms = 720 ms."""
    dss = [SlowToyDataset(64, "panoptic", delay=0.03)]
    s = UnifiedTaskSampler(dss, batch_size=4, seed=0)
    with PrefetchLoader(s, collate, num_workers=4, prefetch_batches=2,
                        num_batches=6) as loader:
        next(loader)          # pipeline warm
        t0 = time.perf_counter()
        rest = list(loader)
        dt = time.perf_counter() - t0
    assert len(rest) == 5
    assert dt < 0.55, f"no overlap: {dt:.3f}s for 5 batches"


def test_prefetch_propagates_mapper_errors():
    class Exploding(SlowToyDataset):
        def __getitem__(self, idx):
            if idx == 5:
                raise ValueError("boom at 5")
            return super().__getitem__(idx)

    s = UnifiedTaskSampler([Exploding(8, "panoptic")], batch_size=4, seed=0)
    loader = PrefetchLoader(s, collate, num_workers=2, num_batches=4)
    with pytest.raises(ValueError, match="boom at 5"):
        for _ in range(4):
            next(loader)
    loader.close()
