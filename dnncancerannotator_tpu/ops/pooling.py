'''Max pooling with a TPU-friendly backward.

XLA lowers the autodiff backward of ``reduce_window(max)`` to
``SelectAndScatter``, which is scalar-heavy on TPU: measured 1.39 ms for a
single [8, 256, 256, 3] 2x2 pool backward on v5e — a third of the whole
unet.yaml model backward. For the non-overlapping pools these models use
(window == stride, reference components.py:59-61 ``MaxPool2D(rate)``), both
directions are pure reshape/compare/reduce work on the VPU:

- forward: trim to a window multiple, reshape [B, Ho, r, Wo, r, C], max over
  the window axes;
- backward: broadcast the pooled max back over each window, route the cotangent
  to the positions equal to the max.

Tie semantics: the gradient is split equally among tied in-window maxima
(``1/count`` each), whereas TF/XLA route it all to one winner. On
continuous-valued activations ties are measure-zero; the split keeps the
per-window cotangent sum exact either way.
'''

import functools

import jax
import jax.numpy as jnp


def _pool_shapes(x, rate):
    b, h, w, c = x.shape
    return b, h // rate, w // rate, c


def _max_pool_impl(x, rate):
    b, oh, ow, c = _pool_shapes(x, rate)
    xt = x[:, :oh * rate, :ow * rate, :]
    return xt.reshape(b, oh, rate, ow, rate, c).max(axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool2d(x, rate):
    '''Non-overlapping max pool of [B, H, W, C] by ``rate`` (VALID padding:
    trailing rows/cols beyond a window multiple are dropped, matching
    ``nn.max_pool(window=(r, r), strides=(r, r))``).'''
    return _max_pool_impl(x, rate)


def _max_pool_fwd(x, rate):
    out = _max_pool_impl(x, rate)
    return out, (x, out)


def _max_pool_bwd(rate, res, g):
    x, out = res
    b, oh, ow, c = _pool_shapes(x, rate)
    xt = x[:, :oh * rate, :ow * rate, :].reshape(b, oh, rate, ow, rate, c)
    hit = xt == out[:, :, None, :, None, :]
    count = hit.sum(axis=(2, 4), keepdims=True).astype(g.dtype)
    gx = jnp.where(hit, (g[:, :, None, :, None, :] / count), 0)
    gx = gx.reshape(b, oh * rate, ow * rate, c).astype(x.dtype)
    h, w = x.shape[1], x.shape[2]
    if (h, w) != (oh * rate, ow * rate):
        gx = jnp.pad(gx, ((0, 0), (0, h - oh * rate), (0, w - ow * rate),
                          (0, 0)))
    return (gx,)


max_pool2d.defvjp(_max_pool_fwd, _max_pool_bwd)
