'''Pallas fused max-pool(2x2/2) parity — forward AND gradient must match
the strided-slice pairwise-max formulation bit for bit (including the
balanced tie split, which relu zeros exercise constantly).'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.ops import pooling
from dnncancerannotator_tpu.ops.pallas import pool_kernel as PK


@pytest.mark.parametrize('shape', [(2, 16, 16, 128), (1, 8, 32, 256)])
def test_fwd_bwd_parity(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    ref = pooling.max_pool2d(x, 2)
    out = PK.max_pool2x2_nhwc(x, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    dx = jax.grad(lambda x_: jnp.vdot(PK.max_pool2x2_nhwc(x_, True), g))(x)
    dx_ref = jax.grad(lambda x_: jnp.vdot(pooling.max_pool2d(x_, 2), g))(x)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref))


def test_tie_split_parity():
    '''relu-style inputs: lots of exact zeros -> fully/partially tied
    windows; the balanced 0.5 split must match jnp.maximum's VJP.'''
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.maximum(rng.randn(2, 8, 8, 128), 0.0), jnp.float32)
    g = jnp.asarray(rng.randn(2, 4, 4, 128), jnp.float32)
    dx = jax.grad(lambda x_: jnp.vdot(PK.max_pool2x2_nhwc(x_, True), g))(x)
    dx_ref = jax.grad(lambda x_: jnp.vdot(pooling.max_pool2d(x_, 2), g))(x)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref))
    # per-window cotangent mass is preserved (sum of random g is near
    # zero, so compare absolutely at the summed-magnitude scale)
    np.testing.assert_allclose(
        float(jnp.sum(dx)), float(jnp.sum(g)),
        atol=1e-4 * float(jnp.sum(jnp.abs(g))))


def test_gated_dispatch(monkeypatch):
    monkeypatch.setenv('DNNCA_PPOOL', '1')
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 128), jnp.float32)
    out = pooling.max_pool2d(x, 2)
    monkeypatch.delenv('DNNCA_PPOOL')
    ref = pooling.max_pool2d(x, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gate_rejects_ineligible(monkeypatch):
    monkeypatch.setenv('DNNCA_PPOOL', '1')
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    assert not PK.pool_pallas_ok((2, 16, 16, 64), 2, 'NHWC', jnp.float32)
    assert not PK.pool_pallas_ok((2, 16, 16, 128), 3, 'NHWC', jnp.float32)
    assert not PK.pool_pallas_ok((2, 16, 16, 128), 2, 'NCHW', jnp.float32)
    assert not PK.pool_pallas_ok((2, 15, 16, 128), 2, 'NHWC', jnp.float32)
    assert not PK.pool_pallas_ok((2, 16, 16, 128), 2, 'NHWC', jnp.bfloat16)
    monkeypatch.delenv('DNNCA_PPOOL')
    assert not PK.pool_pallas_ok((2, 16, 16, 128), 2, 'NHWC', jnp.float32)
