"""Parity tests for the TPU-native multi-scale deformable attention op.

The ground truth is torch.nn.functional.grid_sample (the exact primitive the
reference's fallback oracle builds on), driven independently here — the same
slow-reference-vs-fast-kernel pattern the reference uses in its only test
(ops/test.py:35-89).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from psalm_tpu.ops.msdeform import ms_deform_attn_xla
from psalm_tpu.ops.sampling import point_sample


def torch_msda_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent torch implementation of multi-scale deformable attention
    via grid_sample (math per Deformable-DETR paper, eq. 3)."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # [N*M, Lq, P, 2]
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)  # [N*M, D, Lq, P]
        sampled.append(s)
    attn = attention_weights.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn).sum(-1)
    return out.view(N, M * D, Lq).transpose(1, 2).contiguous()


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_matches_torch_grid_sample(seed):
    rng = np.random.default_rng(seed)
    B, M, D = 2, 4, 8
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    Q, P = 7, 4
    L = len(shapes)

    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    # include out-of-range locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, M, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(B, Q, M, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, M, -1).sum(-1)[..., None].reshape(B, Q, M, 1, 1)

    want = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(attn)).numpy()
    got = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_msda_grad_finite():
    B, M, D = 1, 2, 4
    shapes = ((4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    Q, P, L = 5, 2, 2
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (B, S, M, D))
    loc = jax.random.uniform(k2, (B, Q, M, L, P, 2))
    attn = jax.nn.softmax(jax.random.normal(k3, (B, Q, M, L * P)), -1).reshape(
        B, Q, M, L, P)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("align_corners", [False, True])
def test_point_sample_matches_torch(align_corners):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 5, 7, 3
    N = 11
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    coords = rng.uniform(-0.1, 1.1, size=(B, N, 2)).astype(np.float32)

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(2 * coords - 1).unsqueeze(2)  # [B, N, 1, 2]
    want = F.grid_sample(t_feat, t_grid, mode="bilinear", padding_mode="zeros",
                         align_corners=align_corners).squeeze(3).permute(0, 2, 1).numpy()
    got = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(coords),
                                  align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_lanes_matches_oracle(seed):
    from psalm_tpu.ops.msdeform import ms_deform_attn_lanes
    rng = np.random.default_rng(seed)
    B, M, D = 2, 4, 32  # G = 4 heads per lane block
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    Q, P = 9, 4
    L = len(shapes)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, M, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(B, Q, M, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, M, -1).sum(-1)[..., None].reshape(B, Q, M, 1, 1)

    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    got = np.asarray(ms_deform_attn_lanes(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _encoder_case(seed, shapes, max_off, B=2, M=4, D=16, P=4):
    """Random encoder-style inputs: Q == S, locations = static pixel-center
    reference points + offsets bounded by max_off target-level pixels."""
    rng = np.random.default_rng(seed)
    L = len(shapes)
    refs = []
    for (H, W) in shapes:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    S = ref.shape[0]
    norm = np.array([[w, h] for (h, w) in shapes], np.float32)
    off = rng.uniform(-max_off, max_off,
                      size=(B, S, M, L, P, 2)).astype(np.float32)
    loc = (ref[None, :, None, None, None, :]
           + off / norm[None, None, None, :, None, :]).astype(np.float32)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(B, S, M, L, P)).astype(np.float32)
    attn /= attn.reshape(B, S, M, -1).sum(-1).reshape(B, S, M, 1, 1)
    return value, loc, attn


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("shapes", [((8, 8), (16, 16), (32, 32)),
                                    ((6, 10), (12, 20), (24, 40))])
def test_msda_window_matches_oracle_within_radius(shapes, fold):
    """In-radius offsets: the windowed MXU formulation is exact (incl.
    zero-padding at image borders — offsets up to R reach out of image
    at edge tiles)."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    R = 3.0
    value, loc, attn = _encoder_case(0, shapes, max_off=R - 0.25)
    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    got = np.asarray(ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=R, fold_points=fold))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fold", [False, True])
def test_msda_window_grads_match_oracle(fold):
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    shapes = ((4, 4), (8, 8), (16, 16))
    R = 2.0
    value, loc, attn = _encoder_case(1, shapes, max_off=R - 0.25, B=1)

    def loss(fn, v, l, a):
        return jnp.sum(jnp.square(fn(v, shapes, l, a)))

    g_ref = jax.grad(lambda v, l, a: loss(ms_deform_attn_xla, v, l, a),
                     argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_win = jax.grad(
        lambda v, l, a: loss(
            lambda v_, s_, l_, a_: ms_deform_attn_window(
                v_, s_, l_, a_, tile=8, radius=R), v, l, a),
        argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    for a, b in zip(g_ref, g_win):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fold", [False, True])
def test_msda_window_clamps_beyond_radius(fold):
    """Out-of-radius offsets: output is finite and equals the oracle run on
    the clamped locations (clamp = clip offsets to ±R target-level px)."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    shapes = ((4, 4), (8, 8))
    R = 2.0
    value, loc, attn = _encoder_case(2, shapes, max_off=12.0, B=1)
    got = np.asarray(ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=R, fold_points=fold))
    assert np.isfinite(got).all()
    # build the explicitly clamped locations and compare to the oracle
    refs = []
    for (H, W) in shapes:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[w, h] for (h, w) in shapes], np.float32)
    npx = norm[None, None, None, :, None, :]
    off_px = (loc - ref) * npx
    loc_cl = (ref + np.clip(off_px, -R, R) / npx).astype(np.float32)
    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc_cl), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("scan_tiles", [True, False])
def test_msda_window_per_point_radii_exact(fold, scan_tiles):
    """Per-point radii: exact vs the unclamped oracle when each point p's
    offsets stay within its own radius r_p (the init-structure bound:
    |bias_p| = p+1 px, ms_deform_attn.py:66-74). Covers all four
    formulation branches (tile-scan/einsum x folded/unfolded) — each runs
    per point-group under per-point radii (ADVICE r4)."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    radii = (1.0, 2.0, 3.0, 4.0)
    shapes = ((8, 8), (16, 16), (32, 32))
    # build offsets bounded per point: reuse _encoder_case at the max radius
    # then rescale each point's offsets into its own radius
    value, loc, attn = _encoder_case(5, shapes, max_off=1.0)
    refs = []
    for (H, W) in shapes:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    scale = (np.asarray(radii) - 0.25)[None, None, None, None, :, None]
    loc = (ref + (loc - ref) * scale).astype(np.float32)  # off_p < r_p px
    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    got = np.asarray(ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=radii, fold_points=fold, scan_tiles=scan_tiles))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("scan_tiles", [True, False])
def test_msda_window_per_point_radii_clamp_and_grads(fold, scan_tiles):
    """Beyond a point's radius the clamp applies per point; gradients match
    the oracle run on the per-point-clamped locations. Parametrized over
    the folded-stencil and einsum branches (ADVICE r4)."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    radii = (1.0, 2.0, 2.0, 3.0)  # includes an equal-radius group of 2
    shapes = ((4, 4), (8, 8))
    value, loc, attn = _encoder_case(6, shapes, max_off=8.0, B=1)
    got = np.asarray(ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=radii, fold_points=fold, scan_tiles=scan_tiles))
    assert np.isfinite(got).all()
    refs = []
    for (H, W) in shapes:
        ys = (np.arange(H) + 0.5) / H
        xs = (np.arange(W) + 0.5) / W
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[w, h] for (h, w) in shapes], np.float32)
    npx = norm[None, None, None, :, None, :]
    off_px = (loc - ref) * npx
    rvec = np.asarray(radii)[None, None, None, None, :, None]
    loc_cl = (ref + np.clip(off_px, -rvec, rvec) / npx).astype(np.float32)
    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc_cl), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # grads: window(loc) vs oracle(clamped-loc); all offsets IN-radius here
    # so the clamp is the identity and grads must match the plain oracle
    value2, loc2, attn2 = _encoder_case(7, shapes, max_off=0.75, B=1)

    def loss(fn, v, l, a):
        return jnp.sum(jnp.square(fn(v, shapes, l, a)))

    g_ref = jax.grad(lambda v, l, a: loss(ms_deform_attn_xla, v, l, a),
                     argnums=(0, 1, 2))(
        jnp.asarray(value2), jnp.asarray(loc2), jnp.asarray(attn2))
    g_win = jax.grad(
        lambda v, l, a: loss(
            lambda v_, s_, l_, a_: ms_deform_attn_window(
                v_, s_, l_, a_, tile=8, radius=radii, fold_points=fold,
                scan_tiles=scan_tiles), v, l, a),
        argnums=(0, 1, 2))(
        jnp.asarray(value2), jnp.asarray(loc2), jnp.asarray(attn2))
    for a, b in zip(g_ref, g_win):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("radius", [2.0, (1.0, 2.0, 2.0, 3.0)])
@pytest.mark.parametrize("head_chunk", [1, 2])
def test_msda_window_custom_vjp_grads(radius, head_chunk):
    """Manual-VJP core (VERDICT r4 #2): forward and all three input grads
    match the AD einsum path exactly — in-radius (clamp inactive), including
    border zero-padding, flat and per-point radii, chunked heads."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    shapes = ((4, 4), (8, 8), (16, 16))
    rmin = min(radius) if isinstance(radius, tuple) else radius
    value, loc, attn = _encoder_case(13, shapes, max_off=rmin - 0.25, B=2)

    def loss(v, l, a, **kw):
        return jnp.sum(jnp.square(ms_deform_attn_window(
            v, shapes, l, a, tile=8, radius=radius,
            head_chunk=head_chunk, **kw)))

    out_ad = ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=radius, head_chunk=head_chunk, scan_tiles=False)
    out_cv = ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=radius, head_chunk=head_chunk, custom_vjp=True)
    np.testing.assert_allclose(np.asarray(out_cv), np.asarray(out_ad),
                               rtol=1e-5, atol=1e-5)

    g_ad = jax.grad(lambda v, l, a: loss(v, l, a, scan_tiles=False),
                    argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_cv = jax.grad(lambda v, l, a: loss(v, l, a, custom_vjp=True),
                    argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    for a, b in zip(g_ad, g_cv):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_msda_window_custom_vjp_engages():
    """The custom_vjp flag must actually route through _group_sample_cvjp
    (a silent fall-through to the AD path would still pass the parity
    tests while losing the measured backward win)."""
    import psalm_tpu.ops.msdeform_window as mw
    mw._group_sample_cvjp.cache_clear()
    shapes = ((4, 4), (8, 8))
    value, loc, attn = _encoder_case(15, shapes, max_off=1.0, B=1)
    mw.ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=2.0, custom_vjp=True)
    assert mw._group_sample_cvjp.cache_info().currsize > 0
    mw._group_sample_cvjp.cache_clear()
    mw.ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        tile=8, radius=2.0, custom_vjp=False)
    assert mw._group_sample_cvjp.cache_info().currsize == 0


def test_msda_window_custom_vjp_clamped_grads():
    """With out-of-radius offsets the clamp's zero-gradient region matches
    AD (jnp.clip subgradient): location grads vanish exactly where AD's do,
    value/attention grads still match."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    shapes = ((4, 4), (8, 8))
    R = 2.0
    value, loc, attn = _encoder_case(14, shapes, max_off=9.0, B=1)

    def loss(v, l, a, **kw):
        return jnp.sum(jnp.square(ms_deform_attn_window(
            v, shapes, l, a, tile=8, radius=R, **kw)))

    g_ad = jax.grad(lambda v, l, a: loss(v, l, a, scan_tiles=False),
                    argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g_cv = jax.grad(lambda v, l, a: loss(v, l, a, custom_vjp=True),
                    argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    for a, b in zip(g_ad, g_cv):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_msda_window_decoder_fallback():
    """Q != S falls back to the oracle exactly."""
    from psalm_tpu.ops.msdeform_window import ms_deform_attn_window
    rng = np.random.default_rng(3)
    shapes = ((4, 4), (8, 8))
    S = sum(h * w for h, w in shapes)
    B, Q, M, D, L, P = 1, 5, 2, 8, 2, 3
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    loc = rng.uniform(0, 1, size=(B, Q, M, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(B, Q, M, L, P)).astype(np.float32)
    want = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    got = np.asarray(ms_deform_attn_window(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
