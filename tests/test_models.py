'''Model family tests: registry, shape arithmetic, activation/regularizer
config handling, MulmoUNet structure.'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu import models


def _init_apply(name, options, x):
    model, reg = models.build_model(name, options)
    v = model.init(jax.random.PRNGKey(0), x, training=False)
    return model, v, model.apply(v, x)


def test_registry():
    assert models.get_model('UNetAnnotator') is models.UNetAnnotator
    with pytest.raises(KeyError):
        models.get_model('nope')


def test_unet_same_padding_shapes():
    x = jnp.zeros((2, 64, 64, 5))
    _, v, y = _init_apply('UNetAnnotator', dict(
        n_filters_first=3, n_downsample=3, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same'), x)
    assert y.shape == (2, 64, 64, 1)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


def test_unet_valid_padding_shapes():
    '''valid padding: each level loses 2*(k-1) then pools; decoder mirrors.
    68 -> conv 64 -> pool 32 -> conv 28 -> pool 14 -> up 28 -> conv 24
    -> up 48 -> conv 44.'''
    x = jnp.zeros((1, 68, 68, 3))
    _, _, y = _init_apply('UNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='valid'), x)
    assert y.shape == (1, 44, 44, 1)


def test_unet_bn_mutable():
    x = jnp.zeros((2, 32, 32, 3))
    model, _ = models.build_model('UNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=True, padding='same'))
    v = model.init(jax.random.PRNGKey(0), x, training=False)
    assert 'batch_stats' in v
    y, mut = model.apply(v, x, training=True, mutable=['batch_stats'])
    assert 'batch_stats' in mut


def test_leaky_relu_dict_activation():
    x = jnp.zeros((1, 32, 32, 3))
    _, _, y = _init_apply('UNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same',
        activation={'class_name': 'LeakyReLU', 'config': {'alpha': 0.3}}), x)
    assert y.shape == (1, 32, 32, 1)


def test_kernel_regularizer_popped():
    model, reg = models.build_model('UNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same',
        kernel_regularizer={'class_name': 'L2', 'config': {'l2': 0.01}}))
    assert reg == {'class_name': 'L2', 'config': {'l2': 0.01}}


def test_mulmo_unet_per_channel_encoders():
    x = jnp.zeros((1, 32, 32, 3))
    model, _ = models.build_model('MulmoUNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same'))
    v = model.init(jax.random.PRNGKey(0), x, training=False)
    body = v['params']['mulmo_unet']
    # one encoder per input channel
    assert {'encoder_0', 'encoder_1', 'encoder_2'} <= set(body.keys())
    y = model.apply(v, x)
    assert y.shape == (1, 32, 32, 1)


def test_multiresunet_shapes():
    x = jnp.zeros((1, 32, 32, 5))
    _, _, y = _init_apply('MultiResUnet', dict(
        height=None, width=None, n_channels=5, base_filters=4), x)
    assert y.shape == (1, 32, 32, 1)


def test_logits_match_probs():
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    model, _ = models.build_model('UNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same'))
    v = model.init(jax.random.PRNGKey(0), x, training=False)
    probs = model.apply(v, x)
    logits = model.apply(v, x, return_logits=True)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(logits)), np.asarray(probs), atol=1e-6)
