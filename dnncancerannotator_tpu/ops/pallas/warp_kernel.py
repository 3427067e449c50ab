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


def _resample_rows_crop(padded, src_rows, r, shift, base, n_out, n_in, p, d,
                        c):
    '''Crop-fused pass: resample along axis 0 with a per-image integer crop
    offset ``base`` folded into the tap *mask* — output row ``i`` blends
    padded rows ``p + base + i + s`` and ``+1``, realized as static slices
    over the widened range ``s + base in [-(d+1), d + (n_in - n_out)]``.
    (A dynamic slice base would be cheaper taps-wise, but Mosaic requires
    dynamic sublane starts to be provably 8-aligned; per-image jitter
    offsets are not.)

    ``src_rows`` are full uncropped [n_in, m] planes; ``r``/``shift`` are
    [n_out, m] in the *crop* frame, so the blend math is identical to
    ``_resample_rows`` on the materialized crop: a masked-in tap only ever
    reads in-crop rows (the qy clip guarantees it), and the replicated edge
    rows are reached only at weight zero.
    '''
    for ch in range(c):
        padded[ch, p:p + n_in] = src_rows[ch]
        for i in range(p):  # edge replication, 2D single-row copies
            padded[ch, i:i + 1] = src_rows[ch][0:1]
            padded[ch, p + n_in + i:p + n_in + i + 1] = \
                src_rows[ch][n_in - 1:n_in]

    total = shift + base                      # crop offset rides the mask
    span = n_in - n_out
    acc = [jnp.zeros_like(r) for _ in range(c)]
    for s in range(-(d + 1), d + span + 1):
        for ch in range(c):
            lo = padded[ch, p + s:p + s + n_out]
            hi = padded[ch, p + s + 1:p + s + 1 + n_out]
            val = lo * (1.0 - r) + hi * r
            acc[ch] = jnp.where(total == s, val, acc[ch])
    return acc


def _kernel_crop(img_ref, fy_ref, fx_ref, off_ref, out_ref, padded_v,
                 padded_h, *, d, c, h_out, w_out):
    '''Fused jittered-crop + two-pass resample (one program per image).

    img_ref: [1, c, h_in, w_in] uncropped window; fy_ref: [1, 1, h_out, w_in]
    vertical flow in *original-column* frame (fy at crop coords
    ``(i, j - ox)``); fx_ref: [1, 1, h_out, w_out] horizontal flow in crop
    frame; off_ref: [B, 2] int32 (oy, ox) crop offsets (SMEM, full table).
    '''
    h_in, w_in = img_ref.shape[2], img_ref.shape[3]
    p = d + 2
    # off_ref holds the whole [B, 2] table (SMEM blocks must keep the full
    # trailing dims on real TPU); pick this program's row
    i = pl.program_id(0)
    oy = off_ref[i, 0]
    ox = off_ref[i, 1]

    # vertical pass over the full window width; crop rows fold into the
    # dynamic slice base
    gy = lax.broadcasted_iota(jnp.int32, (h_out, w_in), 0).astype(jnp.float32)
    fy = jnp.clip(fy_ref[0, 0], -float(d), float(d))
    qy = jnp.clip(gy - fy, 0.0, h_out - 1.0)
    y0 = jnp.floor(qy)
    shift_y = (y0 - gy).astype(jnp.int32)
    mid = _resample_rows_crop(
        padded_v, [img_ref[0, ch] for ch in range(c)],
        qy - y0, shift_y, oy, h_out, h_in, p, d, c)

    # horizontal pass on the transposed mid; crop columns fold the same way
    gx = lax.broadcasted_iota(jnp.int32, (w_out, h_out), 0).astype(jnp.float32)
    fx_t = jnp.clip(fx_ref[0, 0], -float(d), float(d)).T
    qx = jnp.clip(gx - fx_t, 0.0, w_out - 1.0)
    x0 = jnp.floor(qx)
    shift_x = (x0 - gx).astype(jnp.int32)
    out_t = _resample_rows_crop(
        padded_h, [m.T for m in mid],
        qx - x0, shift_x, ox, w_out, w_in, p, d, c)

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


def supported_crop(in_shape, out_size, max_displacement):
    '''VMEM check for the crop-fused resample (whole window per program).'''
    b, h_in, w_in, c = in_shape
    h_out, w_out = out_size
    if h_out > h_in or w_out > w_in:
        return False
    p = max_displacement + 2
    per_image = 4 * (
        c * (h_in * w_in          # image block
             + h_out * w_out      # out block
             + (h_in + 2 * p) * w_in    # padded_v
             + (w_in + 2 * p) * h_out   # padded_h
             + h_out * w_in)      # mid values
        + h_out * (w_in + w_out))  # flow blocks
    return per_image < _VMEM_LIMIT_BYTES


@functools.partial(
    jax.jit, static_argnames=('out_size', 'max_displacement', 'interpret'))
def dense_image_warp_crop_pallas(image, fy_ext, fx_crop, crop_offset,
                                 out_size, max_displacement=8,
                                 interpret=False):
    '''Crop-fused two-pass resample: [B, h_in, w_in, C] window + per-image
    integer crop offsets -> warped [B, h_out, w_out, C]; the cropped
    intermediate never materializes (the offsets ride the dynamic slice
    base of each tap read).

    Args:
        image: [B, h_in, w_in, C] float32 uncropped window.
        fy_ext: [B, h_out, w_in] vertical flow, original-column frame
            (``fy_ext[b, i, j]`` = fy at crop coords ``(i, j - ox_b)``).
        fx_crop: [B, h_out, w_out] horizontal flow, crop frame.
        crop_offset: [B, 2] int32 (oy, ox), 0 <= off <= in - out.
    '''
    b, h_in, w_in, c = image.shape
    h_out, w_out = out_size
    d = int(max_displacement)
    p = d + 2
    img_chw = jnp.transpose(image.astype(jnp.float32), (0, 3, 1, 2))
    out = pl.pallas_call(
        functools.partial(_kernel_crop, d=d, c=c, h_out=h_out, w_out=w_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h_in, w_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h_out, w_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h_out, w_out), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h_out, w_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h_out, w_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, h_in + 2 * p, w_in), jnp.float32),
            pltpu.VMEM((c, w_in + 2 * p, h_out), jnp.float32),
        ],
        interpret=interpret,
    )(img_chw, fy_ext[:, None].astype(jnp.float32),
      fx_crop[:, None].astype(jnp.float32),
      crop_offset.astype(jnp.int32))
    return jnp.transpose(out, (0, 2, 3, 1))


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
