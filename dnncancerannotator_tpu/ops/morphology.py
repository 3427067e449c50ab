'''Morphological image ops via XLA ``reduce_window``.

The reference's ``morph_open`` uses ``tf.nn.erosion2d`` -> ``tf.nn.dilation2d``
with a zero-valued structuring element (reference: annotator/utils/image.py:
12-26), which degenerates to a min-pool followed by a max-pool over a
``filter_size``-square window with SAME padding. On TPU these lower to single
fused reduce-window kernels.
'''

import jax
import jax.numpy as jnp
from jax import lax


def _same_pads(size):
    # SAME padding for stride-1 windows: total = size - 1, split low/high.
    lo = (size - 1) // 2
    hi = size - 1 - lo
    return (lo, hi)


def erode2d(image, filter_size):
    '''Grayscale erosion (flat structuring element) = windowed min, SAME pad.

    Args:
        image: [..., H, W] array (any leading batch/channel dims as long as
            the last two are spatial).
        filter_size: square window size.
    '''
    ndim = image.ndim
    window = (1,) * (ndim - 2) + (filter_size, filter_size)
    strides = (1,) * ndim
    pads = ((0, 0),) * (ndim - 2) + (_same_pads(filter_size), _same_pads(filter_size))
    init = _max_identity(image.dtype)
    return lax.reduce_window(image, init, lax.min, window, strides, pads)


def dilate2d(image, filter_size):
    '''Grayscale dilation (flat structuring element) = windowed max, SAME pad.'''
    ndim = image.ndim
    window = (1,) * (ndim - 2) + (filter_size, filter_size)
    strides = (1,) * ndim
    pads = ((0, 0),) * (ndim - 2) + (_same_pads(filter_size), _same_pads(filter_size))
    init = _min_identity(image.dtype)
    return lax.reduce_window(image, init, lax.max, window, strides, pads)


def _max_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype)
    if dtype == jnp.bool_:
        return jnp.array(True, dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype)


def _min_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype)
    if dtype == jnp.bool_:
        return jnp.array(False, dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype)


def morph_open(image, filter_size):
    '''Morphological opening (erosion then dilation) over the last two dims.

    Matches reference annotator/utils/image.py:12-26 semantics (SAME padding,
    flat zero structuring element) for any layout whose trailing dims are
    spatial. The reference operates on NHWC; callers here typically pass
    [..., H, W] masks directly.
    '''
    return dilate2d(erode2d(image, filter_size), filter_size)
