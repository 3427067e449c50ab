'''Basic image ops (crop / resize / photometric) in JAX.

TPU-native equivalents of the TF image ops used throughout the reference data
pipeline (reference: annotator/data.py:183-206, :594-689; metrics.py:196-204;
callbacks.py:416-420).
'''

import jax
import jax.numpy as jnp
from jax import lax


def crop_to_bounding_box(image, offset_h, offset_w, target_h, target_w):
    '''Crop [..., H, W, C] at a (possibly traced) offset to a static size.

    Equivalent of ``tf.image.crop_to_bounding_box``; uses ``dynamic_slice`` so
    the offsets may be traced values (needed for random crops under jit).
    '''
    ndim = image.ndim
    starts = [0] * ndim
    sizes = list(image.shape)
    h_axis, w_axis = ndim - 3, ndim - 2
    starts[h_axis] = offset_h
    starts[w_axis] = offset_w
    sizes[h_axis] = target_h
    sizes[w_axis] = target_w
    starts = [jnp.asarray(s, jnp.int32) for s in starts]
    return lax.dynamic_slice(image, starts, sizes)


def center_crop(image, target_h, target_w):
    '''Center crop, matching ``(shape - output_size) // 2`` offsets
    (reference data.py:183-190).'''
    h, w = image.shape[-3], image.shape[-2]
    return crop_to_bounding_box(
        image, (h - target_h) // 2, (w - target_w) // 2, target_h, target_w)


def resize_bilinear(image, target_h, target_w):
    '''Bilinear resize with half-pixel centers — exact TF2
    ``tf.image.resize(method='bilinear', antialias=False)`` semantics.

    NOT ``jax.image.resize('linear')``: that applies an antialiasing
    triangle filter when downscaling, whereas TF point-samples at half-pixel
    centers (golden-verified in tests/test_augment_golden.py). Implemented
    as two separable sparse interpolation matmuls — gather-free, lands on
    the MXU.
    '''
    def weights(n_in, n_out):
        scale = n_in / n_out
        q = jnp.clip((jnp.arange(n_out) + 0.5) * scale - 0.5, 0.0,
                     n_in - 1.0)
        lo = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, max(n_in - 2, 0))
        r = (q - lo).astype(jnp.float32)
        rows = jnp.arange(n_out)
        w = jnp.zeros((n_out, n_in), jnp.float32)
        w = w.at[rows, lo].set(1.0 - r)
        if n_in > 1:
            w = w.at[rows, lo + 1].add(r)
        return w

    image = image.astype(jnp.float32)
    h, w = image.shape[-3], image.shape[-2]
    wy = weights(h, target_h)
    wx = weights(w, target_w)
    tmp = jnp.einsum('oh,...hwc->...owc', wy, image)
    return jnp.einsum('pw,...owc->...opc', wx, tmp)


def adjust_contrast(image, factor, target_channels=None):
    '''``tf.image.adjust_contrast`` semantics on selected channels:
    ``(x - mean_c) * factor + mean_c`` with a per-channel spatial mean;
    channels outside ``target_channels`` pass through untouched
    (reference data.py:594-609).

    Args:
        image: [H, W, C].
        factor: scalar contrast factor.
        target_channels: channel index sequence; None adjusts all.
    '''
    means = jnp.mean(image, axis=(0, 1), keepdims=True)  # [1, 1, C]
    adjusted = (image - means) * factor + means
    if target_channels is None:
        return adjusted
    c = image.shape[-1]
    mask = jnp.zeros((c,), bool).at[jnp.asarray(target_channels)].set(True)
    return jnp.where(mask[None, None, :], adjusted, image)


def random_contrast(key, image, lower, upper, target_channels):
    '''Per-image random contrast on selected channels
    (``tf.image.random_contrast``: one uniform factor per image).'''
    factor = jax.random.uniform(key, (), minval=lower, maxval=upper)
    return adjust_contrast(image, factor, target_channels)


def random_flip_left_right(key, image):
    '''Flip the width axis with probability 0.5 ([H, W, C]).'''
    flip = jax.random.bernoulli(key)
    return lax.cond(flip, lambda x: x[:, ::-1, :], lambda x: x, image)
