'''Cross-framework numeric parity for the remaining flagship models:
MulmoUNetAnnotator (per-channel encoders + reference-index skips, with BN)
and MultiResUnet (filter-split blocks + ResPaths).

Methodology follows tests/test_tf_parity.py: build the equivalent Keras
model from the reference topology spec (annotator/models/tf_models/unet.py:
91-191, multiresunet.py:89-223), copy weights layer-for-layer, and compare
forward outputs. BatchNorm layers additionally get RANDOMIZED gamma/beta/
moving statistics copied into both frameworks, so a missing/extra/misplaced
BN shifts the output far beyond tolerance instead of hiding behind the
near-identity default init. A short same-init SGD training trajectory is
checked for MulmoUNet.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip('tensorflow')

from flax.core import unfreeze

from dnncancerannotator_tpu import models
from dnncancerannotator_tpu.train import losses

_ATOL = 1e-5 if jax.default_backend() == 'cpu' else 2e-3


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


class _WeightPlan:
    '''Parallel keras-layer / flax-path lists built in call order.'''

    def __init__(self, rng):
        self.rng = rng
        self.items = []

    def conv(self, layer, path, tconv=False):
        self.items.append(('tconv' if tconv else 'conv', layer, path))

    def bn(self, layer, path, scale=True):
        self.items.append(('bn' if scale else 'bn_noscale', layer, path))

    def apply(self, params, batch_stats):
        '''Copy flax conv weights -> keras; randomize BN on both sides.'''
        for kind, layer, path in self.items:
            if kind in ('conv', 'tconv'):
                fl = _get(params, path)
                kernel = np.asarray(fl['kernel'])
                if kind == 'tconv':
                    # keras tconv kernels are [kh, kw, out, in] and spatially
                    # flipped relative to lax.conv_transpose
                    kernel = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
                weights = [kernel]
                if 'bias' in fl:
                    weights.append(np.asarray(fl['bias']))
                layer.set_weights(weights)
            else:
                fl = _get(params, path)
                st = _get(batch_stats, path)
                c = np.asarray(st['mean']).shape[0]
                beta = self.rng.normal(size=c).astype(np.float32) * 0.1
                mean = self.rng.normal(size=c).astype(np.float32) * 0.1
                var = self.rng.uniform(0.5, 1.5, size=c).astype(np.float32)
                st['mean'], st['var'] = jnp.asarray(mean), jnp.asarray(var)
                fl['bias'] = jnp.asarray(beta)
                if kind == 'bn':
                    gamma = self.rng.uniform(0.8, 1.2, size=c).astype(
                        np.float32)
                    fl['scale'] = jnp.asarray(gamma)
                    layer.set_weights([gamma, beta, mean, var])
                else:
                    layer.set_weights([beta, mean, var])


# ---------------------------------------------------------------------------
# MulmoUNet: one encoder per channel, concat bottlenecks, decoder fed the
# reference-index encoder's skips (reference unet.py:91-191).
# ---------------------------------------------------------------------------

def _keras_mulmo(plan, n_filters_first=2, n_down=2, rate=2, k=3, channels=3,
                 bn=True, reference_index=1):
    L = tf.keras.layers
    inp = tf.keras.Input((None, None, channels))
    bottlenecks, skips_per_channel = [], []
    for c in range(channels):
        x = inp[:, :, :, c:c + 1]
        skips = []
        f = n_filters_first
        for lvl in range(n_down):
            base = ('mulmo_unet', f'encoder_{c}', f'down_{lvl}')
            for i in range(2):
                conv = L.Conv2D(f, k, padding='same', activation='relu')
                x = conv(x)
                plan.conv(conv, base + ('convchain', f'conv_{i}'))
                if bn:
                    bnl = L.BatchNormalization()
                    x = bnl(x)
                    plan.bn(bnl, base + ('convchain', f'bn_{i}'))
            skips.append(x)
            x = L.MaxPool2D(rate)(x)
            if bn:
                bnl = L.BatchNormalization()
                x = bnl(x)
                plan.bn(bnl, base + ('pool_bn',))
            f = int(rate * f)
        skips_per_channel.append(skips)
        bottlenecks.append(x)
    x = L.Concatenate()(bottlenecks)
    for lvl, skip in enumerate(reversed(skips_per_channel[reference_index])):
        base = ('mulmo_unet', 'decoder', f'up_{lvl}')
        f = skip.shape[-1]
        tconv = L.Conv2DTranspose(f, rate, strides=rate, padding='same')
        x = tconv(x)
        plan.conv(tconv, base + ('tconv',), tconv=True)
        if bn:
            bnl = L.BatchNormalization()
            x = bnl(x)
            plan.bn(bnl, base + ('tconv_bn',))
        x = L.Concatenate()([x, skip])
        for i in range(2):
            conv = L.Conv2D(f, k, padding='same', activation='relu')
            x = conv(x)
            plan.conv(conv, base + ('convchain', f'conv_{i}'))
            if bn:
                bnl = L.BatchNormalization()
                x = bnl(x)
                plan.bn(bnl, base + ('convchain', f'bn_{i}'))
    head = L.Conv2D(1, 1, activation='sigmoid')
    out = head(x)
    plan.conv(head, ('last_conv',))
    return tf.keras.Model(inp, out)


def test_mulmo_unet_forward_matches_keras():
    '''MulmoUNetAnnotator (bn=True, non-default reference_index): same
    weights AND same randomized BN statistics -> same probabilities.'''
    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)

    model, _ = models.build_model('MulmoUNetAnnotator', dict(
        n_filters_first=2, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=True, padding='same', reference_index=1))
    variables = unfreeze(model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), training=False))

    plan = _WeightPlan(np.random.default_rng(7))
    keras_model = _keras_mulmo(plan)
    keras_model(x)  # build
    plan.apply(variables['params'], variables['batch_stats'])

    ours = np.asarray(model.apply(variables, jnp.asarray(x), training=False))
    theirs = keras_model(x, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=_ATOL)


def test_mulmo_unet_training_trajectory_matches_keras():
    '''Same init, same data, 5 plain-SGD steps on the weighted BCE: the loss
    trajectories of the Flax and Keras MulmoUNet agree step by step.'''
    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 16, 2)).astype(np.float32)
    y = (rng.random((2, 16, 16)) > 0.7).astype(np.float32)
    lr, weight = 0.05, 2.0

    model, _ = models.build_model('MulmoUNetAnnotator', dict(
        n_filters_first=2, n_downsample=1, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same'))
    variables = unfreeze(model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), training=False))
    params = variables['params']

    # keras twin WITHOUT the head sigmoid: both sides train from logits
    plan = _WeightPlan(np.random.default_rng(0))
    L = tf.keras.layers
    inp = tf.keras.Input((None, None, 2))
    bottlenecks, skips_pc = [], []
    for c in range(2):
        xx = inp[:, :, :, c:c + 1]
        base = ('mulmo_unet', f'encoder_{c}', 'down_0')
        for i in range(2):
            conv = L.Conv2D(2, 3, padding='same', activation='relu')
            xx = conv(xx)
            plan.conv(conv, base + ('convchain', f'conv_{i}'))
        skips_pc.append(xx)
        bottlenecks.append(L.MaxPool2D(2)(xx))
    xx = L.Concatenate()(bottlenecks)
    tconv = L.Conv2DTranspose(2, 2, strides=2, padding='same')
    xx = tconv(xx)
    plan.conv(tconv, ('mulmo_unet', 'decoder', 'up_0', 'tconv'), tconv=True)
    xx = L.Concatenate()([xx, skips_pc[0]])
    for i in range(2):
        conv = L.Conv2D(2, 3, padding='same', activation='relu')
        xx = conv(xx)
        plan.conv(conv, ('mulmo_unet', 'decoder', 'up_0', 'convchain',
                         f'conv_{i}'))
    head = L.Conv2D(1, 1)
    plan.conv(head, ('last_conv',))
    keras_model = tf.keras.Model(inp, head(xx))
    keras_model(x)
    plan.apply(params, {})

    mask = (y * (weight - 1.0) + 1.0)[..., None]
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)

    def jax_loss(p):
        logits = model.apply({'params': p}, jnp.asarray(x), training=True,
                             return_logits=True)
        return jnp.mean(losses.weighted_crossentropy(
            jnp.asarray(y), logits, weight=weight))

    jax_losses, tf_losses = [], []
    grad_fn = jax.jit(jax.value_and_grad(jax_loss))
    for _ in range(5):
        loss, grads = grad_fn(params)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                        params, grads)
        jax_losses.append(float(loss))

        with tf.GradientTape() as tape:
            logits = keras_model(x, training=True)
            tf_loss = bce(y[..., None], logits, sample_weight=mask)
        tvars = keras_model.trainable_variables
        tgrads = tape.gradient(tf_loss, tvars)
        for v, g in zip(tvars, tgrads):
            v.assign_sub(lr * g)
        tf_losses.append(float(tf_loss.numpy()))

    np.testing.assert_allclose(jax_losses, tf_losses, rtol=2e-4, atol=2e-6)


# ---------------------------------------------------------------------------
# MultiResUnet (reference multiresunet.py:89-223)
# ---------------------------------------------------------------------------

def _keras_conv2d_bn(x, plan, path, filters, k, activation='relu'):
    '''conv2d_bn (reference multiresunet.py:31-60): Conv2D(no bias) ->
    BN(scale=False) -> activation.'''
    L = tf.keras.layers
    conv = L.Conv2D(filters, k, padding='same', use_bias=False)
    x = conv(x)
    plan.conv(conv, path + ('conv',))
    bnl = L.BatchNormalization(axis=3, scale=False)
    x = bnl(x)
    plan.bn(bnl, path + ('bn',), scale=False)
    if activation is not None:
        x = L.Activation(activation)(x)
    return x


def _keras_mres_block(x, plan, path, U, alpha=1.67):
    L = tf.keras.layers
    W = alpha * U
    f3, f5, f7 = int(W * 0.167), int(W * 0.333), int(W * 0.5)
    short = _keras_conv2d_bn(x, plan, path + ('shortcut',), f3 + f5 + f7, 1,
                             activation=None)
    c3 = _keras_conv2d_bn(x, plan, path + ('conv3x3',), f3, 3)
    c5 = _keras_conv2d_bn(c3, plan, path + ('conv5x5',), f5, 3)
    c7 = _keras_conv2d_bn(c5, plan, path + ('conv7x7',), f7, 3)
    out = L.Concatenate(axis=3)([c3, c5, c7])
    bnl = L.BatchNormalization(axis=3)
    out = bnl(out)
    plan.bn(bnl, path + ('bn_cat',))
    out = L.add([short, out])
    out = L.Activation('relu')(out)
    bnl = L.BatchNormalization(axis=3)
    out = bnl(out)
    plan.bn(bnl, path + ('bn_out',))
    return out


def _keras_respath(x, plan, path, filters, length):
    L = tf.keras.layers
    for i in range(length):
        short = _keras_conv2d_bn(x, plan, path + (f'shortcut_{i}',), filters,
                                 1, activation=None)
        out = _keras_conv2d_bn(x, plan, path + (f'conv_{i}',), filters, 3)
        out = L.add([short, out])
        out = L.Activation('relu')(out)
        bnl = L.BatchNormalization(axis=3)
        out = bnl(out)
        plan.bn(bnl, path + (f'bn_{i}',))
        x = out
    return x


def _keras_multiresunet(plan, channels, base):
    '''Reference topology (multiresunet.py:167-223) at a reduced base width;
    decoder upsamples are RAW Conv2DTranspose (no BN) exactly as upstream.'''
    L = tf.keras.layers
    inp = tf.keras.Input((None, None, channels))
    m1 = _keras_mres_block(inp, plan, ('mres1',), base)
    p1 = L.MaxPooling2D(2)(m1)
    m1 = _keras_respath(m1, plan, ('respath1',), base, 4)
    m2 = _keras_mres_block(p1, plan, ('mres2',), base * 2)
    p2 = L.MaxPooling2D(2)(m2)
    m2 = _keras_respath(m2, plan, ('respath2',), base * 2, 3)
    m3 = _keras_mres_block(p2, plan, ('mres3',), base * 4)
    p3 = L.MaxPooling2D(2)(m3)
    m3 = _keras_respath(m3, plan, ('respath3',), base * 4, 2)
    m4 = _keras_mres_block(p3, plan, ('mres4',), base * 8)
    p4 = L.MaxPooling2D(2)(m4)
    m4 = _keras_respath(m4, plan, ('respath4',), base * 8, 1)
    m5 = _keras_mres_block(p4, plan, ('mres5',), base * 16)

    x = m5
    for name, U, skip in (('up6', base * 8, m4), ('up7', base * 4, m3),
                          ('up8', base * 2, m2), ('up9', base, m1)):
        tconv = L.Conv2DTranspose(U, 2, strides=2, padding='same')
        up = tconv(x)
        plan.conv(tconv, (name, 'tconv'), tconv=True)
        x = L.Concatenate(axis=3)([up, skip])
        x = _keras_mres_block(x, plan, (f'mres{int(name[2:])}',), U)

    head = L.Conv2D(1, 1, padding='same', use_bias=False)
    logits = head(x)
    plan.conv(head, ('head_conv',))
    bnl = L.BatchNormalization(axis=3, scale=False)
    logits = bnl(logits)
    plan.bn(bnl, ('head_bn',), scale=False)
    out = L.Activation('sigmoid')(logits)
    return tf.keras.Model(inp, out)


def test_multiresunet_forward_matches_keras():
    '''MultiResUnet: same weights and randomized BN params/stats -> same
    probabilities (pins the filter splits int(W*.167/.333/.5), ResPath
    lengths 4/3/2/1, the BN(scale=False) placement, and the decoder's
    raw-ConvTranspose upsample).'''
    rng = np.random.default_rng(2)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)

    model, _ = models.build_model('MultiResUnet', dict(
        height=None, width=None, n_channels=3, base_filters=6))
    variables = unfreeze(model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), training=False))

    plan = _WeightPlan(np.random.default_rng(9))
    keras_model = _keras_multiresunet(plan, channels=3, base=6)
    keras_model(x)  # build
    plan.apply(variables['params'], variables['batch_stats'])

    ours = np.asarray(model.apply(variables, jnp.asarray(x), training=False))
    theirs = keras_model(x, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=_ATOL)
