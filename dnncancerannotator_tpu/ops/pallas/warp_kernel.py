'''Pallas TPU kernel: fused bounded-displacement bilinear resample.

The warp augmentation's resample is the hottest non-conv op in the train step
(reference equivalent: tfa ``dense_image_warp`` inside sparse_image_warp,
annotator/data.py:752-756). XLA gathers are slow on TPU, and the select-based
two-pass decomposition (ops/warp.py:dense_image_warp_twopass) round-trips
intermediates through HBM between its ~2*(2D+2) select terms. This kernel
fuses both passes entirely in VMEM: one program per batch image, the
edge-padded image and the mid buffer stay on-chip, and each shift term is a
dynamic row slice + VPU blend.

TPU-shape notes:
- channel-major [C, H, W] layout so vector ops run on full (sublane, lane)
  tiles (NHWC would occupy C=6 of 128 lanes);
- all kernel math is strictly 2D per channel (Mosaic rejects trailing-1
  reshapes);
- dynamic slices are only allowed on the sublane dimension, so the horizontal
  pass runs as a vertical pass on the transposed intermediate.

Semantics match ``dense_image_warp_twopass`` exactly (same shift/blend math,
flow clamped to ±max_displacement, edge-clamped sampling).
'''

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_rows(padded, src_rows, r, shift, n, p, d, c):
    '''Shared pass: resample along axis 0 of each per-channel 2D plane.

    padded: scratch ref [c, n + 2p, m]; src_rows: list of c 2D arrays
    [n, m] to resample; r/shift: [n, m] fractional and integer offsets.
    Returns list of c resampled [n, m] arrays.
    '''
    for ch in range(c):
        padded[ch, p:p + n] = src_rows[ch]
        for i in range(p):  # edge replication, 2D single-row copies
            padded[ch, i:i + 1] = src_rows[ch][0:1]
            padded[ch, p + n + i:p + n + i + 1] = src_rows[ch][n - 1:n]

    # static unroll: Mosaic requires statically-aligned sublane slice offsets
    acc = [jnp.zeros_like(src_rows[0]) for _ in range(c)]
    for s in range(-(d + 1), d + 1):
        for ch in range(c):
            lo = padded[ch, p + s:p + s + n]
            hi = padded[ch, p + s + 1:p + s + 1 + n]
            val = lo * (1.0 - r) + hi * r
            acc[ch] = jnp.where(shift == s, val, acc[ch])
    return acc


def _kernel(img_ref, flow_ref, out_ref, padded_v, padded_h, *, d, c):
    h, w = img_ref.shape[2], img_ref.shape[3]
    p = d + 2
    # tpu.iota only produces integers; cast to float afterwards
    gy = lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    gx = lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    fy = jnp.clip(flow_ref[0, 0], -float(d), float(d))
    fx = jnp.clip(flow_ref[0, 1], -float(d), float(d))

    # vertical pass
    qy = jnp.clip(gy - fy, 0.0, h - 1.0)
    y0 = jnp.floor(qy)
    shift_y = (y0 - gy).astype(jnp.int32)
    mid = _resample_rows(
        padded_v, [img_ref[0, ch] for ch in range(c)],
        qy - y0, shift_y, h, p, d, c)

    # horizontal pass == vertical pass on the transposed planes
    qx = jnp.clip(gx - fx, 0.0, w - 1.0)
    x0 = jnp.floor(qx)
    shift_x = (x0 - gx).astype(jnp.int32)
    out_t = _resample_rows(
        padded_h, [m.T for m in mid],
        (qx - x0).T, shift_x.T, w, p, d, c)

    for ch in range(c):
        out_ref[0, ch] = out_t[ch].T


# VMEM budget: image + 2 padded scratches + out + temporaries, all f32
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def supported(shape, max_displacement):
    '''Whole-image-per-program kernel: check the VMEM footprint.'''
    b, h, w, c = shape
    p = max_displacement + 2
    per_image = 4 * c * (h * w * 3 + (h + 2 * p) * w + (w + 2 * p) * h)
    return per_image < _VMEM_LIMIT_BYTES


@functools.partial(jax.jit, static_argnames=('max_displacement', 'interpret'))
def dense_image_warp_twopass_pallas(image, flow, max_displacement=8,
                                    interpret=False):
    '''Pallas-fused equivalent of ops.warp.dense_image_warp_twopass.

    Args:
        image: [B, H, W, C] float32.
        flow: [B, H, W, 2] float32 displacement.
    '''
    b, h, w, c = image.shape
    d = int(max_displacement)
    p = d + 2
    img_chw = jnp.transpose(image.astype(jnp.float32), (0, 3, 1, 2))
    flow_chw = jnp.transpose(flow.astype(jnp.float32), (0, 3, 1, 2))
    out = pl.pallas_call(
        functools.partial(_kernel, d=d, c=c),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, h + 2 * p, w), jnp.float32),
            pltpu.VMEM((c, w + 2 * p, h), jnp.float32),
        ],
        interpret=interpret,
    )(img_chw, flow_chw)
    return jnp.transpose(out, (0, 2, 3, 1))
