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


def supported(b, h, w, kh, kw, ci, co, bwd=False):
    '''f32 whole-image-per-program kernel: bound VMEM and unroll size.

    ``bwd`` models the backward kernel, which keeps xp/gp/gc input blocks,
    the dx output block and two shift scratches resident (~2x the forward
    footprint) — gating both directions on the forward bound let shapes
    near the limit pass at trace time and fail at backward compile.
    '''
    if kh * kw * ci * co > 1024:  # unrolled terms; keep compile time sane
        return False
    hp, wp = h + kh - 1, w + kw - 1
    if bwd:
        per_program = 4 * (
            2 * (ci * hp * wp      # xp block (double-buffered)
                 + co * hp * wp    # gp block
                 + co * h * w      # gc block
                 + ci * h * w)     # dx block
            + 2 * hp * w)          # shift scratches
    else:
        per_program = 4 * (ci * hp * wp + 2 * co * h * w)
    return per_program < _VMEM_LIMIT_BYTES


@functools.partial(jax.jit,
                   static_argnames=('pads', 'relu', 'nchw', 'interpret'))
def stencil_conv2d_pallas(x, w, bias=None, pads=((1, 1), (1, 1)),
                          relu=False, nchw=False, interpret=False):
    '''Fused stride-1 conv (+bias, +optional relu) of ``x`` with ``w``
    [kh, kw, Ci, Co] under explicit spatial ``pads``.

    ``nchw=False``: x is [B, H, W, Ci] and the result is NHWC (layout
    transposes around the channel-major kernel). ``nchw=True``: x is
    [B, Ci, H, W] and the result stays NCHW — no layout ops at all, the
    fast path when the whole network runs channel-major.
    '''
    kh, kw, _, co = w.shape
    if nchw:
        b, ci, h, wd = x.shape
        xp = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), (0, 0), pads[0], pads[1]))
    else:
        b, h, wd, ci = x.shape
        xp = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), pads[0], pads[1], (0, 0)))
        xp = jnp.transpose(xp, (0, 3, 1, 2))  # [B, Ci, H+ph, W+pw]
    out_h = h + pads[0][0] + pads[0][1] - kh + 1
    out_w = wd + pads[1][0] + pads[1][1] - kw + 1
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
    return out if nchw else jnp.transpose(out, (0, 2, 3, 1))


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


@functools.partial(jax.jit, static_argnames=('pads', 'nchw', 'interpret'))
def stencil_conv2d_bwd_pallas(x, g, w, pads=((1, 1), (1, 1)), nchw=False,
                              interpret=False):
    '''Fused backward of the stride-1 stencil conv: returns (dx, dw, db).

    Args:
        x: forward input [B, H, W, Ci] (or [B, Ci, H, W] when ``nchw``);
        g: cotangent [B, oh, ow, Co] (or [B, Co, oh, ow]);
        w: forward weights [kh, kw, Ci, Co]; pads: the forward pads.
    '''
    kh, kw, _, co = w.shape
    gpads = ((kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
             (kw - 1 - pads[1][0], kw - 1 - pads[1][1]))
    if nchw:
        b, ci, h, wd = x.shape
        oh, ow = g.shape[2], g.shape[3]
        xp = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), (0, 0), pads[0], pads[1]))
        gc = g.astype(jnp.float32)
        gp = jnp.pad(gc, ((0, 0), (0, 0), gpads[0], gpads[1]))
    else:
        b, h, wd, ci = x.shape
        oh, ow = g.shape[1], g.shape[2]
        xp = jnp.transpose(
            jnp.pad(x.astype(jnp.float32),
                    ((0, 0), pads[0], pads[1], (0, 0))),
            (0, 3, 1, 2))
        gf = g.astype(jnp.float32)
        gp = jnp.transpose(jnp.pad(gf, ((0, 0), gpads[0], gpads[1], (0, 0))),
                           (0, 3, 1, 2))
        gc = jnp.transpose(gf, (0, 3, 1, 2))
    hp = h + pads[0][0] + pads[0][1]
    wp = wd + pads[1][0] + pads[1][1]
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
        # headroom over XLA's default 16 MB scoped VMEM: the bwd kernel's
        # resident set is ~2x the forward's (see supported(bwd=True))
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(wvec, xp, gp, gc)
    return (dx if nchw else jnp.transpose(dx, (0, 2, 3, 1)),
            dw[:kh * kw * ci * co].reshape(kh, kw, ci, co),
            dw[kh * kw * ci * co:])


# ---------------------------------------------------------------------------
# Fused conv chain: conv+bias+relu -> conv+bias+relu in one kernel per
# direction (the ConvChain cell, models/blocks.py). Cuts the XLA op count
# roughly in half again vs per-conv kernels: the intermediate activation
# never leaves VMEM except as the backward residual.
# ---------------------------------------------------------------------------


# unrolled-term cap per stencil phase: a fully-unrolled tap loop with more
# terms than this runs its input-plane loop as a fori_loop instead (Mosaic
# supports dynamic leading-dim VMEM indices and dynamic SMEM reads), keeping
# compile time bounded while the 12-24 channel mid-levels stay fused
_UNROLL_TERMS = 1024


def _tap_loop(nin, kh, kw, h, w, sh_ref, load, emit):
    '''Shared stencil tap loop: for each input plane ``i`` and lane offset
    ``dx``, stage ``load(i, dx)`` into the aligned shift scratch, then for
    each sublane offset ``dy`` hand the aligned window to ``emit``.

    Always python-unrolled: chain_supported caps the term count at
    _UNROLL_TERMS, and a lax.fori_loop variant for the 12-24 channel levels
    measured 3-4x slower than the XLA stencil path (dynamic VMEM plane
    indexing relayouts every iteration) — negative result, round 3.
    '''
    for i in range(nin):
        for dx in range(kw):
            sh_ref[:] = load(i, dx)
            for dy in range(kh):
                emit(i, dy, dx, sh_ref[dy:dy + h])


def _chain_kernel(w_ref, x_ref, c1_ref, c2_ref, sh_ref, c1p_ref, *,
                  kh, kw, ci, cm, co, h, w, p1, p2):
    '''One batch image: c1 = relu(conv(x, w1) + b1); c2 = relu(conv(c1, w2)
    + b2). Layout: everything [C, H, W] per image; x_ref pre-padded with p1.

    SMEM weight vector layout: [w1 | b1 | w2 | b2].
    '''
    n1 = kh * kw * ci * cm
    n2 = kh * kw * cm * co
    # conv1 accumulates in the aligned c1 output block
    for o in range(cm):
        c1_ref[0, o] = jnp.full((h, w), w_ref[n1 + o], jnp.float32)

    def emit1(i, dy, dx, window):
        for o in range(cm):
            wv = w_ref[((dy * kw + dx) * ci + i) * cm + o]
            c1_ref[0, o] = c1_ref[0, o] + window * wv

    _tap_loop(ci, kh, kw, h, w, sh_ref,
              lambda i, dx: x_ref[0, i, :, dx:dx + w], emit1)
    # relu + one padded copy per channel for conv2's stencil reads
    for o in range(cm):
        act = jnp.maximum(c1_ref[0, o], 0.0)
        c1_ref[0, o] = act
        c1p_ref[o] = jnp.zeros((h + p2[0][0] + p2[0][1],
                                w + p2[1][0] + p2[1][1]), jnp.float32)
        c1p_ref[o, p2[0][0]:p2[0][0] + h, p2[1][0]:p2[1][0] + w] = act
    # conv2 from the padded intermediate
    for o in range(co):
        c2_ref[0, o] = jnp.full((h, w), w_ref[n1 + cm + n2 + o], jnp.float32)

    def emit2(i, dy, dx, window):
        for o in range(co):
            wv = w_ref[n1 + cm + ((dy * kw + dx) * cm + i) * co + o]
            c2_ref[0, o] = c2_ref[0, o] + window * wv

    _tap_loop(cm, kh, kw, h, w, sh_ref,
              lambda i, dx: c1p_ref[i, :, dx:dx + w], emit2)
    for o in range(co):
        c2_ref[0, o] = jnp.maximum(c2_ref[0, o], 0.0)


def chain_supported(b, h, w, kh, kw, ci, cm, co):
    '''VMEM bound for the fused chain kernels (same-size conv pair).'''
    # fully-unrolled phases only: the fori_loop variant (_tap_loop
    # unroll=False) compiles fast but measured 3-4x SLOWER than the XLA
    # stencil fallback at 12-24 channels (dynamic VMEM plane indexing
    # relayouts per iteration), and full unroll at those widths is both
    # slow (~270-810 us vs XLA's ~83 us) and minutes to Mosaic-compile.
    # Mid-channel chains belong on the MXU; until a matmul-formulation
    # kernel lands, they take the XLA path.
    if kh * kw * ci * cm > _UNROLL_TERMS or kh * kw * cm * co > _UNROLL_TERMS:
        return False
    hp, wp = h + kh - 1, w + kw - 1
    per_program = 4 * (
        2 * ci * hp * wp            # x block (double-buffered)
        + 2 * (cm + co) * h * w     # c1/c2 (or dx/g) blocks
        + 2 * (cm + co) * hp * wp   # padded scratches
        + hp * wp)                  # lane-shift scratch
    return per_program < _VMEM_LIMIT_BYTES


@functools.partial(jax.jit, static_argnames=('pads', 'interpret'))
def conv_chain_pallas(x, w1, b1, w2, b2, pads=((1, 1), (1, 1)),
                      interpret=False):
    '''Fused NCHW chain: returns (c1, c2), both post-relu.

    Both convs are stride-1 with the same ``pads`` and preserve the spatial
    size (the SAME-padding ConvChain case); w1: [kh, kw, Ci, Cm],
    w2: [kh, kw, Cm, Co].
    '''
    b, ci, h, wd = x.shape
    kh, kw, _, cm = w1.shape
    co = w2.shape[3]
    assert h + pads[0][0] + pads[0][1] - kh + 1 == h, (pads, kh, h)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), pads[0], pads[1]))
    wvec = jnp.concatenate([
        w1.astype(jnp.float32).reshape(-1), b1.astype(jnp.float32),
        w2.astype(jnp.float32).reshape(-1), b2.astype(jnp.float32)])
    hp = h + pads[0][0] + pads[0][1]
    wp = wd + pads[1][0] + pads[1][1]
    c1, c2 = pl.pallas_call(
        functools.partial(_chain_kernel, kh=kh, kw=kw, ci=ci, cm=cm, co=co,
                          h=h, w=wd, p1=pads, p2=pads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ci, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cm, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cm, h, wd), jnp.float32),
            jax.ShapeDtypeStruct((b, co, h, wd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hp, wd), jnp.float32),
            pltpu.VMEM((cm, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(wvec, xp)
    return c1, c2


def _chain_bwd_kernel(w_ref, xp_ref, c1_ref, c2_ref, g_ref, *refs,
                      kh, kw, ci, cm, co, h, w, pads, gpads, need_dx=True):
    '''Whole ConvChain backward for one batch image, dw/db accumulated in
    SMEM across the sequential batch grid.

    SMEM output layout: [dw1 | db1 | dw2 | db2]. With ``need_dx=False``
    (first-layer chains, where d(loss)/d(input) is dead work) the dx
    stencil, its dc1p staging scratch, and the dx output are all elided.
    '''
    if need_dx:
        dx_ref, dw_ref, sh_ref, g2p_ref, c1p_ref, dc1p_ref, aux_ref = refs
    else:
        dw_ref, sh_ref, g2p_ref, c1p_ref, aux_ref = refs
        dx_ref = dc1p_ref = None
    first = pl.program_id(0) == 0
    n1 = kh * kw * ci * cm
    n2 = kh * kw * cm * co
    gy0, gx0 = gpads[0][0], gpads[1][0]
    py0, px0 = pads[0][0], pads[1][0]
    hp = h + pads[0][0] + pads[0][1]
    wp = w + pads[1][0] + pads[1][1]

    def acc(idx, s):
        prev = jnp.where(first, 0.0, dw_ref[idx])
        dw_ref[idx] = prev + s

    # relu-masked cotangent: aligned copy for the reductions, padded copy
    # for the dc1 stencil (interior slices of the padded scratch relayout on
    # every read, so they must never sit inside the unrolled tap loops).
    # aux_ref holds g2 first, then is reused for the dc1 accumulation —
    # their lifetimes are disjoint and the shared scratch keeps the kernel
    # under the 16 MB scoped-VMEM budget.
    for o in range(co):
        g2 = jnp.where(c2_ref[0, o] > 0, g_ref[0, o], 0.0)
        aux_ref[o] = g2
        g2p_ref[o] = jnp.zeros((h + kh - 1, w + kw - 1), jnp.float32)
        g2p_ref[o, gy0:gy0 + h, gx0:gx0 + w] = g2
    for i in range(cm):
        c1p_ref[i] = jnp.zeros((hp, wp), jnp.float32)
        c1p_ref[i, py0:py0 + h, px0:px0 + w] = c1_ref[0, i]

    # dw2 / db2
    def emit_dw2(i, dy, dxx, window):
        for o in range(co):
            s = jnp.sum(window * aux_ref[o])
            acc(n1 + cm + ((dy * kw + dxx) * cm + i) * co + o, s)

    _tap_loop(cm, kh, kw, h, w, sh_ref,
              lambda i, dxx: c1p_ref[i, :, dxx:dxx + w], emit_dw2)
    for o in range(co):
        acc(n1 + cm + n2 + o, jnp.sum(aux_ref[o]))

    # dc1 = stencil(g2p, flip(w2)) masked by relu(c1); aligned accumulate
    # (zero-init instead of first-tap init flags: the plane loop may be a
    # fori_loop, where compile-time init tracking is impossible)
    for i in range(cm):
        aux_ref[i] = jnp.zeros((h, w), jnp.float32)

    def emit_dc1(o, ey, ex, window):
        for i in range(cm):
            wv = w_ref[n1 + cm + (((kh - 1 - ey) * kw
                                   + (kw - 1 - ex)) * cm + i) * co + o]
            aux_ref[i] = aux_ref[i] + window * wv

    _tap_loop(co, kh, kw, h, w, sh_ref,
              lambda o, ex: g2p_ref[o, :, ex:ex + w], emit_dc1)
    for i in range(cm):
        masked = jnp.where(c1_ref[0, i] > 0, aux_ref[i], 0.0)
        aux_ref[i] = masked
        if need_dx:
            dc1p_ref[i] = jnp.zeros((h + kh - 1, w + kw - 1), jnp.float32)
            dc1p_ref[i, gy0:gy0 + h, gx0:gx0 + w] = masked

    # dw1 / db1
    def emit_dw1(i, dy, dxx, window):
        for o in range(cm):
            s = jnp.sum(window * aux_ref[o])
            acc(((dy * kw + dxx) * ci + i) * cm + o, s)

    _tap_loop(ci, kh, kw, h, w, sh_ref,
              lambda i, dxx: xp_ref[0, i, :, dxx:dxx + w], emit_dw1)
    for o in range(cm):
        acc(n1 + o, jnp.sum(aux_ref[o]))

    # dx = stencil(dc1p, flip(w1))
    if need_dx:
        for i in range(ci):
            dx_ref[0, i] = jnp.zeros((h, w), jnp.float32)

        def emit_dx(o, ey, ex, window):
            for i in range(ci):
                wv = w_ref[(((kh - 1 - ey) * kw + (kw - 1 - ex)) * ci + i)
                           * cm + o]
                dx_ref[0, i] = dx_ref[0, i] + window * wv

        _tap_loop(cm, kh, kw, h, w, sh_ref,
                  lambda o, ex: dc1p_ref[o, :, ex:ex + w], emit_dx)


@functools.partial(jax.jit,
                   static_argnames=('pads', 'interpret', 'need_dx'))
def conv_chain_bwd_pallas(x, c1, c2, g, w1, w2, pads=((1, 1), (1, 1)),
                          interpret=False, need_dx=True):
    '''Fused backward of the conv chain: returns (dx, dw1, db1, dw2, db2).

    ``need_dx=False`` (first-layer chains) elides the dx stencil and
    returns zeros for dx.'''
    b, ci, h, wd = x.shape
    kh, kw, _, cm = w1.shape
    co = w2.shape[3]
    gpads = ((kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
             (kw - 1 - pads[1][0], kw - 1 - pads[1][1]))
    hp = h + pads[0][0] + pads[0][1]
    wp = wd + pads[1][0] + pads[1][1]
    n1 = kh * kw * ci * cm
    n2 = kh * kw * cm * co
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), pads[0], pads[1]))
    wvec = jnp.concatenate([
        w1.astype(jnp.float32).reshape(-1),
        jnp.zeros((cm,), jnp.float32),
        w2.astype(jnp.float32).reshape(-1)])
    out_specs = [
        pl.BlockSpec((1, ci, h, wd), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, ci, h, wd), jnp.float32),
        jax.ShapeDtypeStruct((n1 + cm + n2 + co,), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((h + kh - 1, wd), jnp.float32),
        pltpu.VMEM((co, h + kh - 1, wd + kw - 1), jnp.float32),
        pltpu.VMEM((cm, hp, wp), jnp.float32),
        pltpu.VMEM((cm, h + kh - 1, wd + kw - 1), jnp.float32),
        pltpu.VMEM((max(cm, co), h, wd), jnp.float32),
    ]
    if not need_dx:
        out_specs, out_shape = out_specs[1:], out_shape[1:]
        del scratch[3]  # the dc1p staging plane only feeds the dx stencil
    res = pl.pallas_call(
        functools.partial(_chain_bwd_kernel, kh=kh, kw=kw, ci=ci, cm=cm,
                          co=co, h=h, w=wd, pads=pads, gpads=gpads,
                          need_dx=need_dx),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ci, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # the level-0 instance sits just over XLA's default 16 MB scoped
        # VMEM (physical VMEM is far larger); raise the kernel's budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(wvec, xp, c1, c2, g)
    if need_dx:
        dx, dsum = res
    else:
        (dsum,) = res
        dx = jnp.zeros((b, ci, h, wd), jnp.float32)
    return (dx,
            dsum[:n1].reshape(kh, kw, ci, cm),
            dsum[n1:n1 + cm],
            dsum[n1 + cm:n1 + cm + n2].reshape(kh, kw, cm, co),
            dsum[n1 + cm + n2:])
