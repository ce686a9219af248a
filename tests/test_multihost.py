"""Real multi-process distributed test (VERDICT r1 component #53).

Spawns TWO OS processes that rendezvous through jax.distributed.initialize
(the framework's replacement for the reference's PDSH/MPI/Slurm runners,
deepspeed/launcher/multinode_runner.py), each exposing 4 virtual CPU
devices, and proves the multi-host data path end-to-end:

  * an 8-device global ('data','model') mesh spanning both processes
  * UnifiedTaskSampler host sharding: each process reads a disjoint stream
  * make_global_batch assembles per-host local arrays into one globally
    sharded jax.Array (jax.make_array_from_process_local_data)
  * a jitted psum-style reduction over the global batch returns the same
    value on every host, equal to the all-hosts sum
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from psalm_tpu.parallel.mesh import (host_shard_info, make_global_batch,
                                     make_mesh)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())
shard, nshards = host_shard_info()
assert (shard, nshards) == (pid, nproc), (shard, nshards)

mesh = make_mesh(data=4 * nproc, model=1)

# per-host local batch: host i contributes rows [i*4, i*4+4)
local = np.arange(4, dtype=np.float32)[:, None] + 4.0 * pid + np.zeros((4, 8))
batch = make_global_batch(mesh, {"x": local})
assert batch["x"].shape == (4 * nproc, 8), batch["x"].shape

@jax.jit
def total(x):
    return jnp.sum(x)

got = float(total(batch["x"]))
want = float(sum(range(4 * nproc)) * 8)
assert got == want, (got, want)

# disjoint host streams: UnifiedTaskSampler with shard info
from psalm_tpu.data.datasets import UnifiedTaskSampler

class _DS:
    dataset_type = "panoptic_coco"
    def __len__(self):
        return 32
    def __getitem__(self, i):
        return {"idx": i, "dataset_type": self.dataset_type}

sampler = UnifiedTaskSampler([_DS()], batch_size=2, shard_index=pid,
                             num_shards=nproc, seed=7)
seen = [s["idx"] for _ in range(4) for s in sampler.next_batch()]
print(f"OK {pid} {sorted(set(seen))}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("PSALM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_rendezvous_and_global_batch(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + os.environ.get("PYTHONPATH", "").split(os.pathsep)),
    )
    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(i), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"OK {i} " in out, out[-2000:]

    # the two hosts consumed DISJOINT sample streams
    import re
    streams = [set(map(int, re.search(r"OK %d \[([0-9, ]+)\]" % i,
                                      outs[i]).group(1).split(",")))
               for i in range(2)]
    assert streams[0].isdisjoint(streams[1]), streams
