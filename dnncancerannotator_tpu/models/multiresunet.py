'''MultiResUNet (Flax linen, NHWC).

Topology parity with the reference model (reference:
annotator/models/tf_models/multiresunet.py, itself MIT-licensed work derived
from Zongwei Zhou's MultiResUNet):

- ``conv_bn`` (multiresunet.py:31-60): Conv2D(no bias) -> BatchNorm(scale=False)
  -> optional activation.
- ``MultiResBlock`` (multiresunet.py:89-126): chained 3x3 convs approximating
  3x3/5x5/7x7 receptive fields with filter splits int(W*.167)/int(W*.333)/
  int(W*.5), concatenated, plus a 1x1 shortcut, added, relu, BN.
- ``ResPath`` (multiresunet.py:129-164): length-graded residual refinement on
  the skip connections.
- Fixed 4-level topology with 32 base filters and a 1x1 sigmoid head
  (multiresunet.py:167-223).
'''

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import pooling
from . import fastbn


class ConvBN(nn.Module):
    filters: int
    kernel: int
    activation: Optional[str] = 'relu'
    strides: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            features=self.filters, kernel_size=(self.kernel, self.kernel),
            strides=(self.strides, self.strides), padding='SAME',
            use_bias=False, dtype=self.dtype, name='conv',
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        x = fastbn.BatchNormFast(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            use_scale=False, dtype=self.dtype, name='bn',
        )(x)
        if self.activation == 'relu':
            x = nn.relu(x)
        elif self.activation == 'sigmoid':
            x = nn.sigmoid(x.astype(jnp.float32))
        return x


class UpTconv(nn.Module):
    '''Decoder upsample: a *raw* ConvTranspose(2x2/2) with bias.

    The reference defines ``trans_conv2d_bn`` (multiresunet.py:63-87) but its
    topology never uses it — every decoder upsample is a plain
    ``Conv2DTranspose`` with default bias and NO BatchNorm
    (multiresunet.py:200-218). Round 4 parity work found this implementation
    originally inserted a BN here; the Keras forward-parity test
    (tests/test_tf_parity.py) now pins the corrected structure.
    '''
    filters: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.filters, kernel_size=(2, 2), strides=(2, 2),
            padding='SAME', dtype=self.dtype, name='tconv',
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)


class MultiResBlock(nn.Module):
    U: int
    alpha: float = 1.67
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        W = self.alpha * self.U
        f3 = int(W * 0.167)
        f5 = int(W * 0.333)
        f7 = int(W * 0.5)
        shortcut = ConvBN(f3 + f5 + f7, 1, activation=None, dtype=self.dtype,
                          name='shortcut')(x, training=training)
        c3 = ConvBN(f3, 3, dtype=self.dtype, name='conv3x3')(x, training=training)
        c5 = ConvBN(f5, 3, dtype=self.dtype, name='conv5x5')(c3, training=training)
        c7 = ConvBN(f7, 3, dtype=self.dtype, name='conv7x7')(c5, training=training)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = fastbn.BatchNormFast(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name='bn_cat',
        )(out)
        out = shortcut + out
        out = nn.relu(out)
        out = fastbn.BatchNormFast(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name='bn_out',
        )(out)
        return out


class ResPath(nn.Module):
    filters: int
    length: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i in range(self.length):
            shortcut = ConvBN(self.filters, 1, activation=None,
                              dtype=self.dtype, name=f'shortcut_{i}')(x, training=training)
            out = ConvBN(self.filters, 3, dtype=self.dtype,
                         name=f'conv_{i}')(x, training=training)
            out = shortcut + out
            out = nn.relu(out)
            out = fastbn.BatchNormFast(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f'bn_{i}',
            )(out)
            x = out
        return x


class MultiResUnet(nn.Module):
    '''MultiResUNet segmentation model -> [B, H, W, 1] probabilities.

    ``height``/``width`` are accepted for config parity with the reference
    signature (multiresunet.py:167) but are not needed: shapes are taken from
    the input. ``n_channels`` likewise.
    '''
    height: Optional[int] = None
    width: Optional[int] = None
    n_channels: Optional[int] = None
    base_filters: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training: bool = False, return_logits: bool = False):
        F = self.base_filters
        dt = self.dtype

        m1 = MultiResBlock(F, dtype=dt, name='mres1')(x, training=training)
        p1 = pooling.max_pool2d(m1, 2)
        m1 = ResPath(F, 4, dtype=dt, name='respath1')(m1, training=training)

        m2 = MultiResBlock(F * 2, dtype=dt, name='mres2')(p1, training=training)
        p2 = pooling.max_pool2d(m2, 2)
        m2 = ResPath(F * 2, 3, dtype=dt, name='respath2')(m2, training=training)

        m3 = MultiResBlock(F * 4, dtype=dt, name='mres3')(p2, training=training)
        p3 = pooling.max_pool2d(m3, 2)
        m3 = ResPath(F * 4, 2, dtype=dt, name='respath3')(m3, training=training)

        m4 = MultiResBlock(F * 8, dtype=dt, name='mres4')(p3, training=training)
        p4 = pooling.max_pool2d(m4, 2)
        m4 = ResPath(F * 8, 1, dtype=dt, name='respath4')(m4, training=training)

        m5 = MultiResBlock(F * 16, dtype=dt, name='mres5')(p4, training=training)

        u6 = jnp.concatenate(
            [UpTconv(F * 8, dtype=dt, name='up6')(m5), m4], axis=-1)
        m6 = MultiResBlock(F * 8, dtype=dt, name='mres6')(u6, training=training)

        u7 = jnp.concatenate(
            [UpTconv(F * 4, dtype=dt, name='up7')(m6), m3], axis=-1)
        m7 = MultiResBlock(F * 4, dtype=dt, name='mres7')(u7, training=training)

        u8 = jnp.concatenate(
            [UpTconv(F * 2, dtype=dt, name='up8')(m7), m2], axis=-1)
        m8 = MultiResBlock(F * 2, dtype=dt, name='mres8')(u8, training=training)

        u9 = jnp.concatenate(
            [UpTconv(F, dtype=dt, name='up9')(m8), m1], axis=-1)
        m9 = MultiResBlock(F, dtype=dt, name='mres9')(u9, training=training)

        # 1x1 head: conv (no bias) + BN, logits taken pre-sigmoid
        logits = nn.Conv(
            features=1, kernel_size=(1, 1), padding='SAME', use_bias=False,
            dtype=dt, name='head_conv',
            kernel_init=nn.initializers.glorot_uniform(),
        )(m9)
        logits = fastbn.BatchNormFast(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            use_scale=False, dtype=dt, name='head_bn',
        )(logits)
        logits = logits.astype(jnp.float32)
        if return_logits:
            return logits
        return nn.sigmoid(logits)
