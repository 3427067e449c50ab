'''Drop-in BatchNorm with an analytic custom-VJP backward (NHWC).

``BatchNormFast`` keeps flax's parameter/collection tree exactly
(``params/{scale,bias}``, ``batch_stats/{mean,var}`` — checkpoints are
interchangeable with ``nn.BatchNorm``) and the same statistics formula
(f32 mean / E[x^2]-E[x]^2 variance, epsilon inside the rsqrt). It differs
in two deliberate ways:

- the backward is the closed-form BN gradient (one reduce pair + one
  elementwise) via ``jax.custom_vjp`` instead of autodiff through the
  statistics graph, with an ``optimization_barrier`` keeping the
  (dbeta, dgamma) reductions out of the dx elementwise kernel;
- statistics are barriered before the normalize so XLA schedules the
  apply independently of the reduce.

Measured on the 31M-param unet_big train step (RESULTS.md round 3): this
is perf-NEUTRAL vs ``nn.BatchNorm`` — XLA's reduce fusions were already
running at memory speed, and two rewrites that looked faster in isolation
(input-side barriers; ones-matmul statistics on the MXU) measured 15%
and 2.2x SLOWER in-model from forced materializations. The module is
kept for the explicit, predictable backward graph and as the control
point for BN layout/fusion experiments.

Reference parity: tf.keras.layers.BatchNormalization used throughout the
reference models (annotator/models/tf_models/components.py:44-47,
multiresunet.py:31-60); momentum/epsilon come from the call sites.
NHWC only (channel axis -1), matching the reference's channels-last
models; the no-BN UNet runs NCHW and never reaches this module.
'''

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _bn_apply(x, scale, bias, mean, var, eps):
    '''y = (x - mean) * rsqrt(var + eps) [* scale] [+ bias], f32 math.'''
    mul = lax.rsqrt(var + eps)
    if scale is not None:
        mul = mul * scale
    shift = -mean * mul
    if bias is not None:
        shift = shift + bias
    return (x.astype(jnp.float32) * mul + shift).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bn_train(x, scale, bias, mean, var, eps):
    '''Training-mode normalize with batch statistics.

    The VJP implements the standard BN-training backward (the statistics'
    dependence on ``x`` is differentiated analytically); ``mean``/``var``
    inputs receive zero cotangents — callers pass them through
    ``stop_gradient`` anyway.
    '''
    return _bn_apply(x, scale, bias, mean, var, eps)


def _bn_train_fwd(x, scale, bias, mean, var, eps):
    y = _bn_apply(x, scale, bias, mean, var, eps)
    return y, (x, scale, bias, mean, var)


def _bn_train_bwd(eps, res, g):
    x, scale, bias, mean, var = res
    red = tuple(range(x.ndim - 1))
    m_count = 1
    for d in red:
        m_count *= x.shape[d]
    r = lax.rsqrt(var + eps)                      # f32 [C]
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * r                        # recomputed per consumer
    dbeta = jnp.sum(gf, red)
    dgamma = jnp.sum(gf * xhat, red)
    # and keep the reductions out of the dx elementwise kernel
    dbeta_b, dgamma_b = lax.optimization_barrier((dbeta, dgamma))
    gscale = r * scale if scale is not None else r
    dx = (gscale * (gf - dbeta_b / m_count - xhat * (dgamma_b / m_count))
          ).astype(x.dtype)
    dscale = dgamma if scale is not None else None
    dbias = dbeta if bias is not None else None
    return (dx, dscale, dbias, jnp.zeros_like(mean), jnp.zeros_like(var))


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNormFast(nn.Module):
    '''API/param-tree compatible replacement for ``nn.BatchNorm`` (NHWC).'''
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Any] = None
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average,
            use_running_average)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = (self.param('scale', nn.initializers.ones, (c,), jnp.float32)
                 if self.use_scale else None)
        bias = (self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
                if self.use_bias else None)

        if use_ra:
            return _bn_apply(x, scale, bias, ra_mean.value, ra_var.value,
                             self.epsilon)

        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, red)
        mean2 = jnp.mean(xf * xf, red)
        var = mean2 - mean * mean
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        # the barrier keeps the stats reduction out of the apply kernel
        mean, var = lax.optimization_barrier(
            (lax.stop_gradient(mean), lax.stop_gradient(var)))
        return _bn_train(x, scale, bias, mean, var, float(self.epsilon))
