'''Golden parity tests for the augmentation ops.

The reference's warp augmentation runs ``tfa.image.sparse_image_warp``
(reference annotator/data.py:718-763). tensorflow_addons is not installable
in this image, so the golden oracle for the warp is an INDEPENDENT float64
numpy implementation of the exact TFA algorithm (polyharmonic order-2 spline
interpolation of control-point displacements + clamped bilinear
``dense_image_warp``), written from the TFA specification:

  flow = interpolate_spline(train_points=dest, values=dest - source,
                            order=2: phi(r) = r^2 log r, reg=0)
  out(y, x) = bilinear(image, (y, x) - flow(y, x))  # queries edge-clamped

For the ops that exist in plain TF (contrast, crop, flip, resize), the
goldens come straight from tf.image on the same inputs.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dnncancerannotator_tpu.ops import image as image_ops
from dnncancerannotator_tpu.ops.warp import sparse_image_warp

tf = pytest.importorskip('tensorflow')


# ---------------------------------------------------------------------------
# numpy float64 oracle for tfa.image.sparse_image_warp
# ---------------------------------------------------------------------------

def _phi2(r2):
    return 0.5 * r2 * np.log(np.maximum(r2, 1e-300))


def _oracle_interpolate_spline(train_pts, train_vals, query_pts):
    '''Order-2 polyharmonic interpolation, float64, pixel coordinates.'''
    n = train_pts.shape[0]
    d2 = np.sum((train_pts[:, None] - train_pts[None, :]) ** 2, -1)
    a = _phi2(d2)
    b = np.concatenate([np.ones((n, 1)), train_pts], 1)
    lhs = np.zeros((n + 3, n + 3))
    lhs[:n, :n] = a
    lhs[:n, n:] = b
    lhs[n:, :n] = b.T
    rhs = np.concatenate([train_vals, np.zeros((3, train_vals.shape[1]))], 0)
    sol = np.linalg.solve(lhs, rhs)
    w, v = sol[:n], sol[n:]
    q2 = np.sum((query_pts[:, None] - train_pts[None, :]) ** 2, -1)
    return _phi2(q2) @ w + \
        np.concatenate([np.ones((query_pts.shape[0], 1)), query_pts], 1) @ v


def _oracle_bilinear(img, qy, qx):
    '''Edge-clamped bilinear sampling (TFA _interpolate_bilinear).'''
    h, w = img.shape[:2]
    qy = np.clip(qy, 0.0, h - 1.0)
    qx = np.clip(qx, 0.0, w - 1.0)
    y0 = np.clip(np.floor(qy).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(qx).astype(int), 0, w - 2)
    ry = (qy - y0)[..., None]
    rx = (qx - x0)[..., None]
    top = img[y0, x0] * (1 - rx) + img[y0, x0 + 1] * rx
    bot = img[y0 + 1, x0] * (1 - rx) + img[y0 + 1, x0 + 1] * rx
    return top * (1 - ry) + bot * ry


def _oracle_sparse_image_warp(image, source, dest):
    '''[H,W,C] single-image TFA sparse_image_warp in float64.'''
    h, w = image.shape[:2]
    flow_vals = (dest - source).astype(np.float64)
    gy, gx = np.mgrid[:h, :w].astype(np.float64)
    grid = np.stack([gy.ravel(), gx.ravel()], -1)
    flow = _oracle_interpolate_spline(
        dest.astype(np.float64), flow_vals, grid).reshape(h, w, 2)
    return _oracle_bilinear(
        image.astype(np.float64), gy - flow[..., 0], gx - flow[..., 1])


# ---------------------------------------------------------------------------
# warp goldens
# ---------------------------------------------------------------------------

def _warp_case(seed, size=48, n_points=12, max_diff=4):
    rng = np.random.default_rng(seed)
    img = rng.random((1, size, size, 2)).astype(np.float32)
    src = rng.uniform(0, size, (1, n_points, 2)).astype(np.float32)
    diff = np.clip(rng.normal(0, 2.0, (1, n_points, 2)), -max_diff,
                   max_diff).astype(np.float32)
    return img, src, src + diff


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_sparse_image_warp_matches_tfa_oracle(seed):
    img, src, dst = _warp_case(seed)
    ours = np.asarray(sparse_image_warp(
        jnp.asarray(img), jnp.asarray(src), jnp.asarray(dst),
        method='exact'))
    gold = _oracle_sparse_image_warp(img[0], src[0], dst[0])
    # f32 solve (normalized coords) vs f64 oracle. Adjudicated on-chip,
    # RESULTS.md round 5: the TPU vector unit builds the r^2 log r kernel
    # matrix ~2e-5 off exact f32 (CPU ~1e-6), and the TPS system's
    # conditioning amplifies that into ~6e-4 relative weight error ->
    # <=0.024 px of flow displacement error (measured per stage; one step
    # of f32 iterative refinement changes nothing, proving the error is
    # matrix construction, not the LU factorization). 0.024 px is 6x below
    # the documented stride-4 flow-grid bound (0.15 px) and noise against
    # the +-4 px random displacements; the reference's own f32
    # pixel-coordinate TFA solve is orders worse at the production
    # operating point (ops/warp.py:216-219). Measured worst seed: TPU
    # mean 8.8e-4 / max 1.3e-2; CPU mean <1e-4 / max 1.9e-3.
    import jax
    if jax.default_backend() == 'tpu':
        np.testing.assert_allclose(ours[0], gold, atol=2e-2)
        assert np.abs(ours[0] - gold).mean() < 2e-3
    else:
        np.testing.assert_allclose(ours[0], gold, atol=5e-3)
        assert np.abs(ours[0] - gold).mean() < 1e-4


# NOTE: the two_pass-vs-exact resample bound is covered on realistic smooth
# content by tests/test_warp_methods.py::test_two_pass_matches_exact_within_
# tolerance; chained with test_sparse_image_warp_matches_tfa_oracle above
# (exact == TFA oracle in f64), that bounds two_pass against the reference.


# ---------------------------------------------------------------------------
# tf.image goldens: contrast / crop / flip / resize
# ---------------------------------------------------------------------------

def test_adjust_contrast_matches_tf():
    rng = np.random.default_rng(0)
    img = rng.random((20, 24, 5)).astype(np.float32)
    for factor in (0.8, 1.0, 1.2):
        gold = tf.image.adjust_contrast(tf.constant(img), factor).numpy()
        ours = np.asarray(image_ops.adjust_contrast(jnp.asarray(img), factor))
        np.testing.assert_allclose(ours, gold, atol=1e-5)
    # channel-restricted variant leaves the label channel untouched
    ours = np.asarray(image_ops.adjust_contrast(
        jnp.asarray(img), 1.2, target_channels=(0, 1, 2, 3)))
    gold_t = tf.image.adjust_contrast(tf.constant(img[..., :4]), 1.2).numpy()
    np.testing.assert_allclose(ours[..., :4], gold_t, atol=1e-5)
    np.testing.assert_array_equal(ours[..., 4], img[..., 4])


def test_crop_to_bounding_box_matches_tf():
    rng = np.random.default_rng(1)
    img = rng.random((40, 40, 3)).astype(np.float32)
    for oy, ox in ((0, 0), (5, 9), (8, 8)):
        gold = tf.image.crop_to_bounding_box(
            tf.constant(img), oy, ox, 24, 24).numpy()
        ours = np.asarray(image_ops.crop_to_bounding_box(
            jnp.asarray(img), oy, ox, 24, 24))
        np.testing.assert_array_equal(ours, gold)


def test_flip_matches_tf():
    rng = np.random.default_rng(2)
    img = rng.random((16, 18, 2)).astype(np.float32)
    gold = tf.image.flip_left_right(tf.constant(img)).numpy()
    np.testing.assert_array_equal(np.asarray(jnp.asarray(img)[:, ::-1, :]),
                                  gold)


def test_resize_bilinear_matches_tf():
    rng = np.random.default_rng(3)
    img = rng.random((1, 32, 32, 2)).astype(np.float32)
    gold = tf.image.resize(tf.constant(img), (16, 16), method='bilinear')
    ours = np.asarray(image_ops.resize_bilinear(jnp.asarray(img), 16, 16))
    np.testing.assert_allclose(ours, gold.numpy(), atol=1e-5)
