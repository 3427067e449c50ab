'''max_pool2d: forward/backward parity with flax nn.max_pool autodiff.'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dnncancerannotator_tpu.ops import pooling


@pytest.mark.parametrize('rate', [2, 3])
@pytest.mark.parametrize('shape', [(2, 16, 16, 3), (2, 17, 19, 5)])
def test_forward_matches_flax(rate, shape):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    ref = nn.max_pool(x, (rate, rate), strides=(rate, rate))
    np.testing.assert_array_equal(
        np.asarray(pooling.max_pool2d(x, rate)), np.asarray(ref))


@pytest.mark.parametrize('shape', [(2, 16, 16, 3), (2, 17, 19, 5)])
def test_grad_matches_flax_without_ties(shape):
    '''On distinct values (ties measure-zero under uniform sampling) the
    custom backward must equal SelectAndScatter-based autodiff exactly.'''
    x = jax.random.uniform(jax.random.PRNGKey(1), shape)

    def f_custom(x):
        return jnp.sum(pooling.max_pool2d(x, 2) ** 2)

    def f_ref(x):
        return jnp.sum(nn.max_pool(x, (2, 2), strides=(2, 2)) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x)), np.asarray(jax.grad(f_ref)(x)),
        atol=1e-6)


def test_grad_ties_split_preserving_sum():
    '''Tied in-window maxima split the cotangent (50/50 down the
    pairwise-max tree); per-window sum is exact.'''
    x = jnp.ones((1, 4, 4, 1))
    g = jax.grad(lambda x: jnp.sum(pooling.max_pool2d(x, 2) * 7.0))(x)
    # each fully-tied 2x2 window -> each element gets 7/4
    np.testing.assert_allclose(np.asarray(g), 7.0 / 4.0)
    # cotangent mass per window preserved
    assert abs(float(g.sum()) - 4 * 7.0) < 1e-6


def test_grad_trimmed_edges_are_zero():
    '''Rows/cols dropped by VALID pooling must get zero gradient.'''
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 7, 2))
    g = jax.grad(lambda x: jnp.sum(pooling.max_pool2d(x, 2)))(x)
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g[:, 4:]), 0)
    np.testing.assert_array_equal(np.asarray(g[:, :, 6:]), 0)
