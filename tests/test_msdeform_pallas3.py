"""Parity tests for the fused whole-sampler Pallas kernel (v3).

Oracle: ms_deform_attn_window (itself golden-tested against the reference's
ms_deform_attn_core_pytorch in tests/test_golden_reference.py) at the same
clamp radius — the kernel must reproduce the window-mode semantics exactly,
including border zero-padding and the offset clamp.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
from psalm_tpu.ops.msdeform_window_pallas3 import ms_deform_attn_window_pallas3

SHAPES = ((16, 16), (8, 8), (4, 4))


def _inputs(B=1, M=2, D=8, P=2, off_scale=3.0, seed=0):
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(seed)
    refs = []
    for (H, W) in SHAPES:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    norm = np.array([[w, h] for (h, w) in SHAPES], np.float32)
    off = rng.uniform(-off_scale, off_scale,
                      size=(B, S, M, L, P, 2)).astype(np.float32)
    loc = (ref[None, :, None, None, None, :]
           + off / norm[None, None, None, :, None, :]).astype(np.float32)
    val = rng.randn(B, S, M, D).astype(np.float32)
    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return val, loc, attn


@pytest.mark.parametrize("xstage", ["sum3d", "gmat"])
def test_pallas3_matches_window(xstage):
    val, loc, attn = _inputs()
    base = ms_deform_attn_window(jnp.asarray(val), SHAPES, jnp.asarray(loc),
                                 jnp.asarray(attn), tile=4, radius=8.0)
    out = ms_deform_attn_window_pallas3(
        jnp.asarray(val), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        tile=4, radius=8.0, xstage=xstage, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_pallas3_border_clamp_and_batch():
    # offsets large enough to clamp AND to push bilinear corners off-image:
    # exercises the validity masks and the window-edge index clips
    val, loc, attn = _inputs(B=2, off_scale=12.0, seed=3)
    base = ms_deform_attn_window(jnp.asarray(val), SHAPES, jnp.asarray(loc),
                                 jnp.asarray(attn), tile=4, radius=8.0)
    out = ms_deform_attn_window_pallas3(
        jnp.asarray(val), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        tile=4, radius=8.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_pallas3_axon_fallback(monkeypatch):
    """On the axon backend the kernel degrades gracefully to the XLA window
    formulation with a RuntimeWarning instead of walking into the
    remote-compile-helper crash (VERDICT r4 #8)."""
    import psalm_tpu.ops.msdeform_window_pallas3 as p3
    monkeypatch.setattr(p3.jax, "default_backend", lambda: "axon")
    monkeypatch.delenv("PSALM_PALLAS3_FORCE", raising=False)
    val, loc, attn = _inputs(seed=11)
    want = ms_deform_attn_window(jnp.asarray(val), SHAPES, jnp.asarray(loc),
                                 jnp.asarray(attn), tile=16, radius=8.0)
    with pytest.warns(RuntimeWarning, match="window_pallas3"):
        got = p3.ms_deform_attn_window_pallas3(
            jnp.asarray(val), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
            tile=4, radius=8.0, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas3_bf16():
    val, loc, attn = _inputs(seed=7)
    base = ms_deform_attn_window(
        jnp.asarray(val, jnp.bfloat16), SHAPES, jnp.asarray(loc),
        jnp.asarray(attn, jnp.bfloat16), tile=4, radius=8.0)
    out = ms_deform_attn_window_pallas3(
        jnp.asarray(val, jnp.bfloat16), SHAPES, jnp.asarray(loc),
        jnp.asarray(attn, jnp.bfloat16), tile=4, radius=8.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(base, np.float32),
                               rtol=0.05, atol=0.05)
