'''U-Net building blocks (Flax linen, NHWC).

Topology parity with the reference blocks (reference:
annotator/models/tf_models/components.py):

- ``Downsample`` (components.py:16-81): n_conv Conv2D (optionally interleaved
  with BatchNorm) -> returns the pre-pool activation as the skip, then
  MaxPool(rate) (optionally followed by BatchNorm).
- ``Upsample`` (components.py:84-166): ConvTranspose(kernel=rate, stride=rate,
  no activation, optional BatchNorm) -> center-crop the skip to the upsampled
  spatial size (components.py:162-163) -> channel concat -> n_conv Conv2D
  (optional BatchNorm interleave).
- ``Encoder`` (components.py:169-247): chain of ``n_downsample`` Downsample
  blocks with filters scaled by ``rate`` per level (``int(rate * filters)``).
- ``Decoder`` (components.py:250-320): mirrored Upsample chain whose filter
  counts come from the skip channels, applied to skips in reverse order.

TPU notes: all convs run in NHWC (the native TPU conv layout); ``dtype``
selects the compute precision (bf16 recommended on TPU) while parameters stay
float32.
'''

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import pooling
from . import fastbn
from . import fastconv
from .fastconv import Conv2DFast, ConvTranspose2DFast


Activation = Callable[[jnp.ndarray], jnp.ndarray]


def solve_activation(identifier) -> Activation:
    '''Resolve an activation spec: callable, name string, or Keras-style dict.

    Parity with reference components.py:323-335; the dict form supports
    ``{'class_name': 'LeakyReLU', 'config': {'alpha': 0.3}}``.
    '''
    if identifier is None:
        return lambda x: x
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        name = identifier.lower()
        table = {
            'relu': nn.relu,
            'sigmoid': nn.sigmoid,
            'tanh': jnp.tanh,
            'gelu': nn.gelu,
            'elu': nn.elu,
            'selu': nn.selu,
            'softplus': nn.softplus,
            'leaky_relu': nn.leaky_relu,
            'leakyrelu': nn.leaky_relu,
            'linear': lambda x: x,
            'none': lambda x: x,
        }
        if name not in table:
            raise ValueError(f'Failed to resolve activation: {identifier}')
        return table[name]
    import collections.abc
    if isinstance(identifier, collections.abc.Mapping):  # incl. FrozenDict
        class_name = identifier.get('class_name')
        config = dict(identifier.get('config', {}) or {})
        if class_name in ('LeakyReLU', 'leaky_relu'):
            alpha = config.get('alpha', config.get('negative_slope', 0.3))
            return lambda x: nn.leaky_relu(x, negative_slope=alpha)
        if class_name in ('ReLU', 'relu'):
            return nn.relu
        if class_name in ('ELU', 'elu'):
            alpha = config.get('alpha', 1.0)
            return lambda x: nn.elu(x, alpha=alpha)
        raise ValueError(f'Failed to resolve activation: {identifier}')
    raise ValueError(f'Failed to resolve activation: {identifier}')


def _canon_padding(padding: str) -> str:
    if isinstance(padding, str):
        return padding.upper()
    return padding


def center_crop_to(x: jnp.ndarray, target_h: int, target_w: int,
                   data_format: str = 'NHWC') -> jnp.ndarray:
    '''Center-crop a batched image tensor spatially to (target_h, target_w).

    Mirrors the skip-alignment crop at reference components.py:162-163.
    Shapes are static under jit so this lowers to a static slice.
    '''
    ay, ax = (2, 3) if data_format == 'NCHW' else (1, 2)
    h, w = x.shape[ay], x.shape[ax]
    top = (h - target_h) // 2
    left = (w - target_w) // 2
    if data_format == 'NCHW':
        return x[:, :, top:top + target_h, left:left + target_w]
    return x[:, top:top + target_h, left:left + target_w, :]


class ConvChain(nn.Module):
    '''``n_conv`` stacked Conv2D layers, optionally interleaved with BatchNorm.

    Matches the Keras ``Sequential([conv, bn?, conv, bn?, ...])`` used in both
    Downsample and Upsample blocks (reference components.py:46-61, :122-134).
    '''
    filters: int
    kernel_size: int
    conv_stride: int
    bn: bool
    n_conv: int = 2
    padding: str = 'VALID'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'

    @nn.compact
    def __call__(self, x, training: bool = False, input_grad: bool = True):
        # ``input_grad=False`` marks a chain consuming raw data (no grads
        # needed w.r.t. x): the fused backward elides the dx stencil.
        # Call-time (not config) so e.g. the Visualizer's input-sensitivity
        # jax.grad (utils/viz.py:118) keeps real input gradients.
        # plain relu is fused into the conv kernel; anything else (leaky,
        # elu, Keras identifier dicts) is applied separately
        fuse_relu = self.activation in ('relu', 'ReLU')
        act = None if fuse_relu else solve_activation(self.activation)
        assert not (self.bn and self.data_format != 'NHWC'), \
            'BatchNorm models run NHWC (flax BN normalizes the last axis)'
        # MXU flatland eligibility, decided up front: decoder-style chains
        # (ci > filters, e.g. the 12->6->6 @128^2 concat chains) measured
        # 2.04x faster through the flat kernel than the scalar stencil on
        # chip (tools/bench_flatchain 2026-08-18), while encoder chains
        # (ci <= filters) favor the stencil (0.92x) — so when both kernels
        # are eligible the channel direction picks the winner.
        flat_ok = (fuse_relu and not self.bn and self.n_conv == 2
                   and self.conv_stride == 1 and self.data_format == 'NCHW'
                   and not isinstance(x, (tuple, list))
                   and isinstance(self.padding, str)
                   and fastconv.flat_chain_ok(
                       x.shape, self.kernel_size, self.filters,
                       _canon_padding(self.padding), self.dtype))
        # ...but only up to 128^2: at 256^2 the stencil beat the flat
        # kernel ~2x (687 vs ~375 us fwd+bwd at 6->3->3) even though flat
        # beats XLA 4.8x there, so 256^2 flat is kept only for chains the
        # stencil rejects.
        prefer_flat = (flat_ok and x.shape[1] > self.filters
                       and x.shape[2] * x.shape[3] <= 128 * 128)
        # whole-cell fusion: both convs + relus in one Pallas kernel per
        # direction (NCHW, SAME, no BN) — param tree identical to the
        # unfused path below
        if (fuse_relu and not self.bn and self.n_conv == 2
                and self.conv_stride == 1 and self.data_format == 'NCHW'
                and not prefer_flat
                and isinstance(self.padding, str)
                and fastconv.chain_pallas_ok(
                    x.shape, self.kernel_size, self.filters,
                    _canon_padding(self.padding))):
            ks = (self.kernel_size, self.kernel_size)
            k1, b1 = fastconv._ConvParams(self.filters, ks,
                                          name='conv_0')(x.shape[1])
            k2, b2 = fastconv._ConvParams(self.filters, ks,
                                          name='conv_1')(self.filters)
            dtype = self.dtype or x.dtype
            pads, _, _ = fastconv._conv_geometry(
                x.shape[2], x.shape[3], self.kernel_size, self.kernel_size,
                (1, 1), _canon_padding(self.padding))
            return fastconv.conv_chain_nchw(
                x.astype(dtype), k1.astype(dtype), b1.astype(dtype),
                k2.astype(dtype), b2.astype(dtype), pads, input_grad)
        # MXU "flatland" chain (ops/pallas/flatchain.py): covers the
        # mid-channel chains the scalar kernel rejects plus the decoder
        # chains routed here by prefer_flat; same param tree
        if flat_ok:
            from ..ops.pallas import flatchain
            from ..parallel import mesh as mesh_lib_
            ks = (self.kernel_size, self.kernel_size)
            k1, b1 = fastconv._ConvParams(self.filters, ks,
                                          name='conv_0')(x.shape[1])
            k2, b2 = fastconv._ConvParams(self.filters, ks,
                                          name='conv_1')(self.filters)
            return flatchain.conv_chain_flat_nchw(
                x.astype(jnp.float32), k1, b1, k2, b2,
                mesh_lib_.pallas_interpret())
        for i in range(self.n_conv):
            x = Conv2DFast(
                features=self.filters,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.conv_stride, self.conv_stride),
                padding=_canon_padding(self.padding),
                dtype=self.dtype,
                activation='relu' if fuse_relu else None,
                data_format=self.data_format,
                name=f'conv_{i}',
            )(x)
            if act is not None:
                x = act(x)
            if self.bn:
                x = fastbn.BatchNormFast(
                    use_running_average=not training,
                    momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                    name=f'bn_{i}',
                )(x)
        return x


class Downsample(nn.Module):
    '''Downsampling block: conv chain -> (skip, max-pooled).'''
    filters: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool
    n_conv: int = 2
    padding: str = 'VALID'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'

    @nn.compact
    def __call__(self, x, training: bool = False, input_grad: bool = True):
        # NOTE: a fused whole-level Pallas kernel (convs + pool in one
        # program) was built and measured NEGATIVE in-model (-21%,
        # fusion-barrier effect at level scale; RESULTS.md round 4) and
        # removed in round 5 — see git history e452fa9 and the Mosaic
        # miscompile repro tools/evidence/mosaic_declevel_repro.py.
        conv = ConvChain(
            filters=self.filters, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, n_conv=self.n_conv,
            padding=self.padding, activation=self.activation, dtype=self.dtype,
            data_format=self.data_format,
            name='convchain',
        )(x, training=training, input_grad=input_grad)
        pooled = pooling.max_pool2d(conv, self.rate,
                                    data_format=self.data_format)
        if self.bn:
            pooled = fastbn.BatchNormFast(
                use_running_average=not training,
                momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                name='pool_bn',
            )(pooled)
        return conv, pooled


class Upsample(nn.Module):
    '''Upsampling block: tconv -> center-crop skip -> concat -> conv chain.'''
    filters: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool
    n_conv: int = 2
    padding: str = 'VALID'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'

    @nn.compact
    def __call__(self, x, reference, training: bool = False):
        up = ConvTranspose2DFast(
            features=self.filters,
            kernel_size=(self.rate, self.rate),
            strides=(self.rate, self.rate),
            padding=_canon_padding(self.padding),
            dtype=self.dtype,
            data_format=self.data_format,
            name='tconv',
        )(x)
        if self.bn:
            up = fastbn.BatchNormFast(
                use_running_average=not training,
                momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                name='tconv_bn',
            )(up)
        nchw = self.data_format == 'NCHW'
        ay, ax = (2, 3) if nchw else (1, 2)
        cropped = center_crop_to(reference, up.shape[ay], up.shape[ax],
                                 data_format=self.data_format)
        if nchw:
            x = jnp.concatenate([up, cropped.astype(up.dtype)], axis=1)
        else:
            # dual-input: the chain's first conv computes
            # conv(concat(up, skip)) as two convs on the unconcatenated
            # operands — identical math/params, no lane-shuffle concat
            # forward and no split backward (see Conv2DFast)
            x = (up, cropped.astype(up.dtype))
        x = ConvChain(
            filters=self.filters, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, n_conv=self.n_conv,
            padding=self.padding, activation=self.activation, dtype=self.dtype,
            data_format=self.data_format,
            name='convchain',
        )(x, training=training)
        return x


class Encoder(nn.Module):
    '''Chain of Downsample blocks; filters scale by ``rate`` per level.

    ``level0_dtype`` (selective precision, BF16_DRIFT.md): overrides
    ``dtype`` for ``down_0`` only — the full-resolution level.
    '''
    filters_first: int
    n_downsample: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool
    n_conv: int = 2
    padding: str = 'VALID'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'
    level0_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False, input_grad: bool = True):
        skips = []
        filters = self.filters_first
        for i in range(self.n_downsample):
            dtype = (self.level0_dtype if i == 0 and
                     self.level0_dtype is not None else self.dtype)
            skip, x = Downsample(
                filters=filters, rate=self.rate, kernel_size=self.kernel_size,
                conv_stride=self.conv_stride, bn=self.bn, n_conv=self.n_conv,
                padding=self.padding, activation=self.activation,
                dtype=dtype, data_format=self.data_format,
                name=f'down_{i}',
            )(x, training=training,
              input_grad=input_grad if i == 0 else True)
            skips.append(skip)
            filters = int(self.rate * filters)
        return skips, x


class Decoder(nn.Module):
    '''Chain of Upsample blocks driven by the reversed skip list.

    Filter counts come from the skip channels (reference components.py:292-306
    builds each Upsample with ``filters=ref_shape[-1]``).
    '''
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool
    n_conv: int = 2
    padding: str = 'VALID'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'
    # selective precision: override dtype for the LAST upsample (the
    # full-resolution level that feeds the head) — see Encoder.level0_dtype
    level0_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skips: Sequence[jnp.ndarray], training: bool = False):
        chan_axis = 1 if self.data_format == 'NCHW' else -1
        last = len(skips) - 1
        for i, skip in enumerate(reversed(skips)):
            dtype = (self.level0_dtype if i == last and
                     self.level0_dtype is not None else self.dtype)
            x = Upsample(
                filters=skip.shape[chan_axis], rate=self.rate,
                kernel_size=self.kernel_size, conv_stride=self.conv_stride,
                bn=self.bn, n_conv=self.n_conv, padding=self.padding,
                activation=self.activation, dtype=dtype,
                data_format=self.data_format, name=f'up_{i}',
            )(x, skip, training=training)
        return x
