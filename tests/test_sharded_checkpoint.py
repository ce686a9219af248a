"""Orbax checkpoint save/restore with a SHARDED TrainState on the 8-device
mesh: dp+tp params and ZeRO-sharded moments must survive the roundtrip with
their shardings and values intact (multi-chip training resume)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from psalm_tpu.config import tiny_test_config
from psalm_tpu.models.psalm import PSALM
from psalm_tpu.parallel.mesh import make_mesh, param_shardings
from psalm_tpu.train.train_step import init_state, make_optimizer, TrainState


def test_sharded_state_orbax_roundtrip(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device simulated mesh")
    import orbax.checkpoint as ocp
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])

    import __graft_entry__ as ge
    cfg = tiny_test_config()
    cfg = cfg.replace(pixel_decoder=dataclasses.replace(
        cfg.pixel_decoder, attention_mode="window"))
    K = 4
    model = PSALM(cfg)
    batch = ge._panoptic_batch(cfg, B=4, num_classes=K)
    params = jax.jit(lambda r, b: model.init(
        r, b, use_class_names=True, num_class_names=K))(
        jax.random.PRNGKey(0), batch)
    p_sh = param_shardings(mesh, params)
    params = jax.device_put(params, p_sh)
    tx = make_optimizer(total_steps=10)
    with mesh:
        state = init_state(params, tx, mesh, param_sh=p_sh)

    path = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": np.asarray(3)})
    ckptr.wait_until_finished()

    # restore against an abstract target carrying the SAME shardings
    target = {"params": jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state.params),
        "opt_state": jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state.opt_state),
        "step": np.asarray(0)}
    restored = ckptr.restore(path, target)

    assert int(restored["step"]) == 3
    # values identical and shardings preserved (incl. TP'd qkv kernels)
    flat_a = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(restored["params"])[0]
    tp_seen = False
    for (kp, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding, kp
        spec = getattr(b.sharding, "spec", P())
        if any(ax == "model" for ax in tuple(spec) if ax is not None):
            tp_seen = True
    assert tp_seen
    # a moment leaf keeps its ZeRO 'data' sharding
    mflat = jax.tree_util.tree_flatten_with_path(restored["opt_state"])[0]
    assert any("data" in jax.tree_util.tree_leaves(tuple(
        getattr(x.sharding, "spec", P())))
        for _, x in mflat if hasattr(x, "sharding"))
