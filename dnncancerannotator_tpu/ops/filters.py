'''Separable image filters (depthwise convs on NHWC).

``gaussian_filter2d`` reproduces ``tfa.image.gaussian_filter2d`` (used for
label smoothing at reference annotator/utils/losses.py:64-66): a truncated,
normalized Gaussian kernel applied as a depthwise convolution with REFLECT
padding. Lowered by XLA to TPU conv ops.
'''

import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(size, sigma, dtype=jnp.float32):
    x = jnp.arange(size, dtype=dtype) - (size - 1.0) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / jnp.sum(g)


def gaussian_filter2d(image, filter_shape=3, sigma=1.0):
    '''Gaussian blur an NHWC image (depthwise, REFLECT padding).

    Args:
        image: [B, H, W, C] float array.
        filter_shape: int or (h, w) kernel size (even sizes allowed, matching
            the reference's default label_smoothing_filter_size=6).
        sigma: Gaussian standard deviation (scalar or (sy, sx)).
    '''
    if isinstance(filter_shape, int):
        fh = fw = filter_shape
    else:
        fh, fw = filter_shape
    if isinstance(sigma, (tuple, list)):
        sy, sx = sigma
    else:
        sy = sx = sigma

    dtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    image = image.astype(dtype)
    ky = _gaussian_kernel1d(fh, sy, dtype)
    kx = _gaussian_kernel1d(fw, sx, dtype)
    kernel2d = jnp.outer(ky, kx)  # [fh, fw]

    b, h, w, c = image.shape
    pad_h = ((fh - 1) // 2, fh - 1 - (fh - 1) // 2)
    pad_w = ((fw - 1) // 2, fw - 1 - (fw - 1) // 2)
    padded = jnp.pad(image, ((0, 0), pad_h, pad_w, (0, 0)), mode='reflect')

    # depthwise conv: kernel [fh, fw, 1, C] with feature_group_count=C
    kernel = jnp.broadcast_to(kernel2d[:, :, None, None], (fh, fw, 1, c))
    out = lax.conv_general_dilated(
        padded, kernel,
        window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c,
    )
    return out
