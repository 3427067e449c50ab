'''Warp resample method equivalence: exact gather vs two-pass select vs the
Pallas kernel (interpreter mode off-TPU).'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.ops import warp as W


def _smooth_image(size=64):
    yy, xx = np.mgrid[:size, :size]
    img = np.zeros((size, size), np.float32)
    for cy, cx in [(20, 20), (40, 45), (30, 10)]:
        img += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 50.0))
    return img


def test_two_pass_matches_exact_within_tolerance():
    '''On smooth content with realistic spline flows the two-pass resample
    must track the exact gather closely (mean error ~1e-2 of value range).'''
    # production operating point: 100 control points over a 128px image,
    # N(0,2) displacements clipped to +-5 (reference data.py:719 defaults)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 128, (1, 100, 2)).astype(np.float32))
    diff = jnp.asarray(
        np.clip(rng.normal(0, 2.0, (1, 100, 2)), -5, 5).astype(np.float32))
    img = jnp.asarray(_smooth_image(128)[None, :, :, None])
    # clamp_flow on both paths, as the augmentation uses it (the TPS
    # interpolant can overshoot between near-duplicate control points)
    exact = W.sparse_image_warp(img, pts, pts + diff, method='exact',
                                clamp_flow=True)
    fast = W.sparse_image_warp(img, pts, pts + diff, method='two_pass',
                               clamp_flow=True)
    err = np.abs(np.asarray(exact) - np.asarray(fast))
    assert err.mean() < 0.02
    # identity stays exact
    same = W.sparse_image_warp(img, pts, pts, method='two_pass')
    np.testing.assert_allclose(np.asarray(same), np.asarray(img), atol=1e-4)


def test_coarse_flow_grid_matches_dense():
    '''stride-4 coarse flow evaluation + bilinear upsample must track the
    dense per-pixel spline evaluation closely (the TPS length scale is the
    ~13px control spacing at this density, far above the 4px grid).'''
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 128, (2, 100, 2)).astype(np.float32))
    diff = jnp.asarray(
        np.clip(rng.normal(0, 2.0, (2, 100, 2)), -5, 5).astype(np.float32))
    img = jnp.asarray(
        np.stack([_smooth_image(128)] * 2)[..., None])
    dense = W.sparse_image_warp(img, pts, pts + diff, method='two_pass',
                                clamp_flow=True, flow_grid_stride=1)
    coarse = W.sparse_image_warp(img, pts, pts + diff, method='two_pass',
                                 clamp_flow=True, flow_grid_stride=4)
    err = np.abs(np.asarray(dense) - np.asarray(coarse))
    # 100 points over 128px is 2x the production control density (13px
    # spacing vs 25px), so this bounds a harsher case than the real
    # operating point; the max lands on the synthetic bumps' sharpest
    # gradients (sub-pixel flow error x steep intensity slope).
    assert err.mean() < 5e-3, err.mean()
    assert err.max() < 0.25, err.max()


def test_twopass_xla_vs_constant_shift():
    img = np.zeros((1, 32, 32, 1), np.float32)
    img[0, 10:14, 10:14, 0] = 1.0
    flow = np.zeros((1, 32, 32, 2), np.float32)
    flow[..., 0] = 2.0  # out[y] = img[y-2]
    out = np.asarray(W.dense_image_warp_twopass(
        jnp.asarray(img), jnp.asarray(flow), 8))
    np.testing.assert_allclose(out[0, 12:16, 10:14, 0], 1.0, atol=1e-5)


def test_pallas_kernel_interpret_parity():
    '''The Pallas kernel (interpret mode off-TPU) must match the XLA
    two-pass select implementation exactly.'''
    from dnncancerannotator_tpu.ops.pallas.warp_kernel import (
        dense_image_warp_twopass_pallas)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    flow = jnp.asarray(((rng.random((2, 32, 32, 2)) - 0.5) * 8)
                       .astype(np.float32))
    interpret = jax.default_backend() == 'cpu'
    out_p = dense_image_warp_twopass_pallas(img, flow, 6, interpret=interpret)
    out_x = W.dense_image_warp_twopass(img, flow, 6)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)
