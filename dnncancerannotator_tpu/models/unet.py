'''UNet / MulmoUNet annotator models (Flax linen, NHWC).

Parity with reference annotator/models/tf_models/unet.py:

- ``UNet`` (unet.py:19-88): Encoder + Decoder.
- ``MulmoUNet`` (unet.py:91-191): one Encoder per input channel applied to
  that channel alone, bottlenecks concatenated on the channel axis, a single
  Decoder fed the skips of ``encoders[reference_index]`` only.
- ``UNetAnnotator`` / ``MulmoUNetAnnotator`` (unet.py:194-300): the U-Net body
  plus a 1x1 sigmoid conv head producing [B, H, W, 1].

The annotator modules return **logits** when ``return_logits=True`` so the
loss can run a numerically-stable sigmoid-BCE (the reference recovers logits
from the sigmoid output via ``y_pred._keras_logits``, losses.py:61).
'''

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from . import blocks


class UNet(nn.Module):
    '''Plain U-Net body (no head).

    ``f32_level0``: run the outermost level (encoder ``down_0`` and the
    final decoder upsample) in float32 even when ``dtype`` is bfloat16 —
    a selective-precision policy for bf16 training (BF16_DRIFT.md): the
    full-resolution level feeds the head directly, so its rounding error
    is the least averaged-out.
    '''
    filters_first: int
    n_downsample: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool = False
    padding: str = 'valid'
    activation: Any = 'relu'
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'
    f32_level0: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False, input_grad: bool = True):
        level0_dtype = jnp.float32 if self.f32_level0 else None
        skips, x = blocks.Encoder(
            filters_first=self.filters_first, n_downsample=self.n_downsample,
            rate=self.rate, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, padding=self.padding,
            activation=self.activation, dtype=self.dtype,
            level0_dtype=level0_dtype,
            data_format=self.data_format, name='encoder',
        )(x, training=training, input_grad=input_grad)
        x = blocks.Decoder(
            rate=self.rate, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, padding=self.padding,
            activation=self.activation, dtype=self.dtype,
            level0_dtype=level0_dtype,
            data_format=self.data_format, name='decoder',
        )(x, skips, training=training)
        return x


class MulmoUNet(nn.Module):
    '''Multimodal U-Net: per-channel encoders, concat latents, single decoder.

    Skips are taken from the encoder at ``reference_index``
    (reference unet.py:180-191).
    '''
    filters_first: int
    n_downsample: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool = False
    padding: str = 'valid'
    activation: Any = 'relu'
    reference_index: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False, input_grad: bool = True):
        n_channels = x.shape[-1]
        skips_list = []
        bottlenecks = []
        for idx in range(n_channels):
            skips, bottom = blocks.Encoder(
                filters_first=self.filters_first,
                n_downsample=self.n_downsample, rate=self.rate,
                kernel_size=self.kernel_size, conv_stride=self.conv_stride,
                bn=self.bn, padding=self.padding, activation=self.activation,
                dtype=self.dtype, name=f'encoder_{idx}',
            )(x[..., idx:idx + 1], training=training, input_grad=input_grad)
            skips_list.append(skips)
            bottlenecks.append(bottom)
        bottleneck = jnp.concatenate(bottlenecks, axis=-1)
        out = blocks.Decoder(
            rate=self.rate, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, padding=self.padding,
            activation=self.activation, dtype=self.dtype, name='decoder',
        )(bottleneck, skips_list[self.reference_index], training=training)
        return out


class UNetAnnotator(nn.Module):
    '''U-Net + 1x1 sigmoid conv head -> [B, H, W, 1] probabilities.'''
    n_filters_first: int
    n_downsample: int
    rate: int
    kernel_size: int
    conv_stride: int
    bn: bool = False
    padding: str = 'valid'
    activation: Any = 'relu'
    kernel_regularizer: Any = None
    dtype: Optional[Any] = None
    # 'auto': channel-major NCHW internally when BN is off (the TPU-fast
    # layout: W in lanes, no per-conv transposes; flax BatchNorm wants the
    # channel last, so BN models stay NHWC). Parameters are layout-agnostic
    # (HWIO kernels), so checkpoints are interchangeable between layouts.
    data_format: str = 'auto'
    # selective-precision policies for bf16 training (BF16_DRIFT.md):
    # f32_head keeps the 1x1 logits conv in float32; f32_level0 keeps the
    # full-resolution encoder/decoder level in float32. Both are no-ops
    # under f32 compute.
    f32_head: bool = False
    f32_level0: bool = False

    def _resolve_format(self):
        if self.data_format != 'auto':
            return self.data_format
        return 'NHWC' if self.bn else 'NCHW'

    def _body(self, fmt):
        return UNet(
            filters_first=self.n_filters_first, n_downsample=self.n_downsample,
            rate=self.rate, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, padding=self.padding,
            activation=self.activation, dtype=self.dtype, data_format=fmt,
            f32_level0=self.f32_level0,
            name='unet',
        )

    @nn.compact
    def __call__(self, x, training: bool = False, return_logits: bool = False,
                 input_grad: bool = True):
        fmt = self._resolve_format()
        if fmt == 'NCHW':
            x = jnp.transpose(x, (0, 3, 1, 2))
        x = self._body(fmt)(x, training=training, input_grad=input_grad)
        if self.f32_head:
            x = x.astype(jnp.float32)
        logits = blocks.Conv2DFast(
            features=1, kernel_size=(1, 1),
            padding=blocks._canon_padding(self.padding),
            dtype=jnp.float32 if self.f32_head else self.dtype,
            data_format=fmt,
            name='last_conv',
        )(x)
        if fmt == 'NCHW':
            logits = jnp.transpose(logits, (0, 2, 3, 1))
        logits = logits.astype(jnp.float32)
        if return_logits:
            return logits
        return nn.sigmoid(logits)


class MulmoUNetAnnotator(UNetAnnotator):
    '''Annotator head on top of MulmoUNet.'''
    reference_index: int = 0
    # per-channel encoders slice the channel axis NHWC-style
    data_format: str = 'NHWC'

    def _body(self, fmt):
        del fmt
        return MulmoUNet(
            filters_first=self.n_filters_first, n_downsample=self.n_downsample,
            rate=self.rate, kernel_size=self.kernel_size,
            conv_stride=self.conv_stride, bn=self.bn, padding=self.padding,
            activation=self.activation, reference_index=self.reference_index,
            dtype=self.dtype, name='mulmo_unet',
        )
