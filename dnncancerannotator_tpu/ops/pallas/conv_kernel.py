'''Pallas TPU kernel: fused small-channel stencil convolution.

The segmentation models run at 3-6 channels, where a conv lowers (via the
stencil path, models/fastconv.py) to ~25 XLA ops of padding, shifted slices,
tiny dots and layout copies. The whole unet.yaml train graph is ~370 ops
forward / ~1900 backward at ~3-4 us fixed cost per op on v5e — the model is
**op-launch-bound**, not FLOP-bound (reference conv path for comparison:
cuDNN convs inside Keras layers, annotator/models.py). Fusing one whole conv
into a single kernel removes that overhead: per batch image, the padded input
lives in VMEM and every (tap, ci, co) term is a shifted multiply-accumulate
on full (sublane, lane) tiles.

TPU-shape notes (same playbook as warp_kernel.py):
- channel-major [B, C, H, W] layout so the lane dimension is W (256-aligned),
  not the 3-6 channels;
- spatial padding is applied XLA-side (fused into the layout transpose);
  in-kernel slices use static offsets only;
- weights/bias travel as an SMEM vector and are read as scalars.

Used for both directions of the custom VJP: the input gradient is the same
stencil with spatially-flipped, io-transposed weights and complementary pads
(fastconv._stencil_s1_bwd).
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _kernel(w_ref, b_ref, x_ref, out_ref, sh_ref, *, kh, kw, ci, co,
            out_h, out_w, relu):
    '''One batch image: out[0, o] = sum_{i, dy, dx} shift(x[0, i]) * w
    (+ bias, optional fused relu).

    Accumulates in-place into the output block through a single lane-shift
    scratch — value-style accumulation unrolls into hundreds of live
    [out_h, out_w] SSA temporaries that overflow Mosaic's VMEM stack.
    '''
    for o in range(co):
        out_ref[0, o] = jnp.full((out_h, out_w), b_ref[o], jnp.float32)
    for i in range(ci):
        for dx in range(kw):
            sh_ref[:] = x_ref[0, i, :, dx:dx + out_w]
            for dy in range(kh):
                window = sh_ref[dy:dy + out_h]
                for o in range(co):
                    out_ref[0, o] = out_ref[0, o] + window * w_ref[
                        ((dy * kw + dx) * ci + i) * co + o]
    if relu:
        for o in range(co):
            out_ref[0, o] = jnp.maximum(out_ref[0, o], 0.0)


def supported(b, h, w, kh, kw, ci, co):
    '''f32 whole-image-per-program kernel: bound VMEM and unroll size.'''
    if kh * kw * ci * co > 1024:  # unrolled terms; keep compile time sane
        return False
    per_program = 4 * (ci * (h + kh - 1) * (w + kw - 1) + 2 * co * h * w)
    return per_program < _VMEM_LIMIT_BYTES


@functools.partial(jax.jit,
                   static_argnames=('pads', 'relu', 'interpret'))
def stencil_conv2d_pallas(x, w, bias=None, pads=((1, 1), (1, 1)),
                          relu=False, interpret=False):
    '''Fused stride-1 conv (+bias, +optional relu) of NHWC ``x``
    [B, H, W, Ci] with ``w`` [kh, kw, Ci, Co] under explicit spatial
    ``pads``; returns NHWC f32.'''
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    out_h = h + pads[0][0] + pads[0][1] - kh + 1
    out_w = wd + pads[1][0] + pads[1][1] - kw + 1
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), pads[0], pads[1], (0, 0)))
    xp = jnp.transpose(xp, (0, 3, 1, 2))  # [B, Ci, H+ph, W+pw]
    wvec = w.astype(jnp.float32).reshape(-1)
    bvec = (jnp.zeros((co,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, ci=ci, co=co,
                          out_h=out_h, out_w=out_w, relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ci, out_h + kh - 1, out_w + kw - 1),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, out_h, out_w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, co, out_h, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_h + kh - 1, out_w), jnp.float32),
        ],
        interpret=interpret,
    )(wvec, bvec, xp)
    return jnp.transpose(out, (0, 2, 3, 1))


def _bwd_kernel(w_ref, xp_ref, gp_ref, g_ref, dx_ref, dw_ref,
                shg_ref, shx_ref, *, kh, kw, ci, co, h, w, oh, ow):
    '''Fused conv backward for one batch image.

    dx[0, i] = sum_{ey, ex, o} shift(gp[0, o]) * w[kh-1-ey, kw-1-ex, i, o]
    dw[dy, dx, i, o] += sum(shift(xp[0, i]) * g[0, o])   (SMEM, accumulated
    across the sequential batch grid).
    '''
    first = pl.program_id(0) == 0

    dx_init = [False] * ci
    for o in range(co):
        for ex in range(kw):
            shg_ref[:] = gp_ref[0, o, :, ex:ex + w]
            for ey in range(kh):
                window = shg_ref[ey:ey + h]
                for i in range(ci):
                    wv = w_ref[(((kh - 1 - ey) * kw + (kw - 1 - ex)) * ci + i)
                               * co + o]
                    if not dx_init[i]:
                        dx_ref[0, i] = window * wv
                        dx_init[i] = True
                    else:
                        dx_ref[0, i] = dx_ref[0, i] + window * wv

    for i in range(ci):
        for dxx in range(kw):
            shx_ref[:] = xp_ref[0, i, :, dxx:dxx + ow]
            for dy in range(kh):
                window = shx_ref[dy:dy + oh]
                for o in range(co):
                    s = jnp.sum(window * g_ref[0, o])
                    idx = ((dy * kw + dxx) * ci + i) * co + o
                    prev = jnp.where(first, 0.0, dw_ref[idx])
                    dw_ref[idx] = prev + s

    # bias gradient: per-channel cotangent sums, appended after the dw taps
    for o in range(co):
        s = jnp.sum(g_ref[0, o])
        idx = kh * kw * ci * co + o
        prev = jnp.where(first, 0.0, dw_ref[idx])
        dw_ref[idx] = prev + s


@functools.partial(jax.jit, static_argnames=('pads', 'interpret'))
def stencil_conv2d_bwd_pallas(x, g, w, pads=((1, 1), (1, 1)),
                              interpret=False):
    '''Fused backward of the stride-1 stencil conv: returns (dx, dw, db).

    Args:
        x: forward input [B, H, W, Ci] (NHWC); g: cotangent [B, oh, ow, Co];
        w: forward weights [kh, kw, Ci, Co]; pads: the forward pads.
    '''
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    oh, ow = g.shape[1], g.shape[2]
    gpads = ((kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
             (kw - 1 - pads[1][0], kw - 1 - pads[1][1]))
    hp = h + pads[0][0] + pads[0][1]
    wp = wd + pads[1][0] + pads[1][1]
    xp = jnp.transpose(
        jnp.pad(x.astype(jnp.float32), ((0, 0), pads[0], pads[1], (0, 0))),
        (0, 3, 1, 2))
    gf = g.astype(jnp.float32)
    gp = jnp.transpose(jnp.pad(gf, ((0, 0), gpads[0], gpads[1], (0, 0))),
                       (0, 3, 1, 2))
    gc = jnp.transpose(gf, (0, 3, 1, 2))
    wvec = w.astype(jnp.float32).reshape(-1)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, kh=kh, kw=kw, ci=ci, co=co,
                          h=h, w=wd, oh=oh, ow=ow),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ci, hp, wp),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, h + kh - 1, wd + kw - 1),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, oh, ow), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ci, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ci, h, wd), jnp.float32),
            jax.ShapeDtypeStruct((kh * kw * ci * co + co,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + kh - 1, wd), jnp.float32),
            pltpu.VMEM((hp, ow), jnp.float32),
        ],
        interpret=interpret,
    )(wvec, xp, gp, gc)
    return (jnp.transpose(dx, (0, 2, 3, 1)),
            dw[:kh * kw * ci * co].reshape(kh, kw, ci, co),
            dw[kh * kw * ci * co:])
