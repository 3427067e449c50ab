'''Cross-framework numerics parity: our Flax models and loss vs equivalent
TF/Keras constructions with identical weights.

This is the executable form of the north-star claim that evaluation outputs
match the TF reference within float tolerance (BASELINE.md): the forward
conv/pool/tconv/sigmoid stack and the weighted-BCE loss are compared directly
against TensorFlow on the same weights and inputs.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip('tensorflow')

# On TPU the MXU rounds conv operands to bf16 (a precision policy, not a
# semantics difference; the axon backend ignores precision='highest' hints).
# CPU runs get the tight float32 tolerance.
_ATOL = 1e-5 if jax.default_backend() == 'cpu' else 2e-3

from dnncancerannotator_tpu import models
from dnncancerannotator_tpu.train import losses


def _keras_unet(n_filters_first=3, n_down=2, rate=2, k=3, channels=5):
    '''Keras U-Net with the reference topology (annotator/models/tf_models/
    components.py semantics: conv-conv-pool encoder, tconv-concat-conv-conv
    decoder, 1x1 sigmoid head), same-padding variant.'''
    inp = tf.keras.Input((None, None, channels))
    x = inp
    skips = []
    f = n_filters_first
    for _ in range(n_down):
        x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
        x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
        skips.append(x)
        x = tf.keras.layers.MaxPool2D(rate)(x)
        f = int(f * rate)
    for skip in reversed(skips):
        f = skip.shape[-1]
        x = tf.keras.layers.Conv2DTranspose(
            f, rate, strides=rate, padding='same')(x)
        x = tf.keras.layers.Concatenate()([x, skip])
        x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
        x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
    out = tf.keras.layers.Conv2D(1, 1, activation='sigmoid')(x)
    return tf.keras.Model(inp, out)


def test_unet_forward_matches_keras():
    '''Same weights, same input -> same probabilities (1e-5 on CPU;
    bf16-policy bound on TPU).'''
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 32, 5)).astype(np.float32)

    model, _ = models.build_model('UNetAnnotator', dict(
        n_filters_first=3, n_downsample=2, rate=2, kernel_size=3,
        conv_stride=1, bn=False, padding='same'))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables['params']

    keras_model = _keras_unet()
    keras_model(x)  # build

    # copy flax params -> keras weight order (convs in call order)
    unet = params['unet']
    flax_layers = []
    for lvl in range(2):
        down = unet['encoder'][f'down_{lvl}']['convchain']
        flax_layers += [down['conv_0'], down['conv_1']]
    for lvl in range(2):
        up = unet['decoder'][f'up_{lvl}']
        flax_layers += [up['tconv'], up['convchain']['conv_0'],
                        up['convchain']['conv_1']]
    flax_layers += [params['last_conv']]

    weighted = [l for l in keras_model.layers if l.weights]
    assert len(weighted) == len(flax_layers)
    for keras_layer, fl in zip(weighted, flax_layers):
        kernel = np.asarray(fl['kernel'])
        if isinstance(keras_layer, tf.keras.layers.Conv2DTranspose):
            # keras tconv kernels are [kh, kw, out, in] AND spatially flipped
            # relative to lax.conv_transpose (pure layout convention)
            kernel = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
        keras_layer.set_weights([kernel, np.asarray(fl['bias'])])

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    theirs = keras_model(x).numpy()
    np.testing.assert_allclose(ours, theirs, atol=_ATOL)


def test_weighted_bce_matches_tf():
    '''Loss parity with the reference formula (annotator/utils/losses.py:
    17-37): per-pixel BCE * (label*(w-1)+1), mean over pixels.'''
    rng = np.random.default_rng(1)
    y = (rng.random((4, 16, 16)) > 0.8).astype(np.float32)
    logits = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)

    for weight, mul, add in [(4.0, 1.0, 0.0), (None, 3.0, 0.0),
                             (2.0, 3.0, 1.0)]:
        ours = np.asarray(losses.weighted_crossentropy(
            jnp.asarray(y), jnp.asarray(logits), weight=weight,
            weight_mul=mul, weight_add=add))

        w = weight
        if w is None:
            rate = y.sum() / y.size
            w = 1.0 / rate if rate > 0 else 1.0
        w = mul * w + add
        mask = y * (w - 1.0) + 1.0
        bce = tf.keras.losses.BinaryCrossentropy(
            reduction=tf.keras.losses.Reduction.NONE, from_logits=True)
        tf_loss = bce(y[..., None], logits, sample_weight=mask)
        tf_loss = tf.reduce_mean(tf_loss, [1, 2]).numpy()
        np.testing.assert_allclose(ours, tf_loss, rtol=1e-5)


def test_gaussian_label_smoothing_matches_manual():
    '''Label smoothing blur parity: depthwise Gaussian kernel, reflect pad
    (reference losses.py:64-66 via tfa.gaussian_filter2d semantics).'''
    from dnncancerannotator_tpu.ops.filters import gaussian_filter2d
    from scipy import ndimage
    y = np.zeros((1, 16, 16, 1), np.float32)
    y[0, 6:10, 6:10, 0] = 1.0
    out = np.asarray(gaussian_filter2d(jnp.asarray(y), 5, 2.0))[0, :, :, 0]

    # manual truncated-normalized kernel
    xs = np.arange(5) - 2.0
    g = np.exp(-0.5 * (xs / 2.0) ** 2)
    g /= g.sum()
    k2 = np.outer(g, g)
    # TF 'REFLECT' mirrors without repeating the edge = scipy 'mirror'
    ref = ndimage.correlate(y[0, :, :, 0], k2, mode='mirror')
    np.testing.assert_allclose(out, ref, atol=max(_ATOL, 1e-6))
