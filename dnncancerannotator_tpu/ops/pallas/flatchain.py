'''MXU-formulation fused ConvChain kernel ("flatland").

Activations ride as [C, H*W] — spatial flattened into the LANE axis — so
a SAME 3x3 conv is, per tap t at offset s_t = (dy-1)*W + (dx-1):

    acc += W_t^T @ (mask_t * lane_roll(x, -s_t))     # [Cm,Ci] @ [Ci,HW]

nine masked lane-rolls (VPU) + nine channel-contraction dots (MXU), the
whole conv+bias+relu x2 chain in ONE kernel per direction, no relayouts
and no scalar tap loops. This is the formulation targeted at the
12-24-channel levels where the scalar-stencil chain kernel measured
3-10x slower than XLA and the XLA dot path drags ~60 layout copies per
step (RESULTS.md round 3). The backward emits dx and all four
weight/bias grads in one kernel, with [HW]-deep (K=4096) weight-grad
contractions accumulated across the batch grid.

Two kernel strategies, switched by ``DNNCA_FLATCHAIN_IM2COL``:

- ``dots`` (0): nine [Cm,Ci]@[Ci,HW] dots per conv. MXU K-utilization is
  Ci/128 (5-19%% at these widths) — most of the systolic array idles.
- ``im2col`` (1, default): stack the nine masked rolls into a VMEM
  scratch [9*Cp, HW] (channels padded to a multiple of the f32 sublane
  tile so every block write/read is tile-aligned) and contract the whole
  stencil in ONE dot [Cm, 9*Cp]@[9*Cp, HW] per conv — K grows 9x, and
  the weight gradients become single K=HW dots against the same scratch.
  Zero-padded channel rows ride through every product as exact zeros, so
  no in-kernel masking or unaligned interior reads are ever needed.

Numerics: f32 in/out, f32 MXU accumulation; forward matches the XLA
conv chain to ~3e-6, gradients to <1e-6 relative (tests/test_fastconv).
Reference conv pair: annotator/models/tf_models/components.py:46-61.
'''

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(hw, w):
    '''(shift, valid-mask [1, hw]) per 3x3 tap of a flat [*, hw] plane.'''
    col = lax.broadcasted_iota(jnp.int32, (1, hw), 1) % w
    row = lax.broadcasted_iota(jnp.int32, (1, hw), 1) // w
    h = hw // w
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            valid = ((col + dx >= 0) & (col + dx < w)
                     & (row + dy >= 0) & (row + dy < h))
            out.append((dy * w + dx, valid))
    return out


def _roll(v, s, hw, interpret):
    if interpret:
        return jnp.roll(v, -s, axis=-1)
    return pltpu.roll(v, -s % hw, axis=1)


def _fwd_kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, c1_ref, *,
                W, interpret):
    x = x_ref[0]                                     # [Ci, HW]
    hw = x.shape[-1]
    taps = _taps(hw, W)

    c1_ref[0] = jnp.broadcast_to(b1_ref[:, 0:1], c1_ref.shape[1:])
    for t, (s, valid) in enumerate(taps):
        xs = jnp.where(valid, _roll(x, s, hw, interpret), 0.0)
        c1_ref[0] += lax.dot_general(
            w1t_ref[t], xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    c1_ref[0] = jnp.maximum(c1_ref[0], 0.0)

    o_ref[0] = jnp.broadcast_to(b2_ref[:, 0:1], o_ref.shape[1:])
    c1 = c1_ref[0]
    for t, (s, valid) in enumerate(taps):
        cs = jnp.where(valid, _roll(c1, s, hw, interpret), 0.0)
        o_ref[0] += lax.dot_general(
            w2t_ref[t], cs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = jnp.maximum(o_ref[0], 0.0)


def _bwd_kernel(x_ref, w1_ref, w1t_ref, w2_ref, w2t_ref, c1_ref, o_ref,
                g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                W, interpret):
    x = x_ref[0]
    hw = x.shape[-1]
    taps = _taps(hw, W)
    first = pl.program_id(0) == 0
    g2 = jnp.where(o_ref[0] > 0, g_ref[0], 0.0)
    c1 = c1_ref[0]

    dc1 = jnp.zeros(c1.shape, jnp.float32)
    for t, (s, valid) in enumerate(taps):
        cs = jnp.where(valid, _roll(c1, s, hw, interpret), 0.0)
        contrib = lax.dot_general(
            g2, cs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Co, Cm]
        dw2_ref[t] = jnp.where(first, 0.0, dw2_ref[t]) + contrib
        term = lax.dot_general(
            w2_ref[t], g2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Cm, HW]
        dc1 = dc1 + _roll(jnp.where(valid, term, 0.0), -s, hw, interpret)
    db2_ref[:, 0] = (jnp.where(first, 0.0, db2_ref[:, 0])
                     + jnp.sum(g2, axis=1))
    dc1 = jnp.where(c1 > 0, dc1, 0.0)

    acc = jnp.zeros(x.shape, jnp.float32)
    for t, (s, valid) in enumerate(taps):
        xs = jnp.where(valid, _roll(x, s, hw, interpret), 0.0)
        contrib = lax.dot_general(
            dc1, xs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Cm, Ci]
        dw1_ref[t] = jnp.where(first, 0.0, dw1_ref[t]) + contrib
        term = lax.dot_general(
            w1_ref[t], dc1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Ci, HW]
        acc = acc + _roll(jnp.where(valid, term, 0.0), -s, hw, interpret)
    db1_ref[:, 0] = (jnp.where(first, 0.0, db1_ref[:, 0])
                     + jnp.sum(dc1, axis=1))
    dx_ref[0] = acc


def _im2col():
    '''Kernel strategy: im2col-in-VMEM single-dot convs (default) vs the
    original nine-dot formulation (deploy_options.flatchain_im2col /
    DNNCA_FLATCHAIN_IM2COL=0).'''
    from .. import gates
    return gates.enabled('flatchain_im2col')


def _pad8(c):
    '''Round a channel count up to the f32 sublane tile (8 rows) so tap
    blocks in the [9*Cp, HW] im2col scratch are tile-aligned.'''
    return -(-c // 8) * 8


def _use_im2col(ci, cm, hw):
    '''Per-shape strategy: im2col when its two [9*Cp, HW] scratches and
    activation blocks fit the 12 MB working-set budget, nine-dot
    otherwise (no scratches — lets 256^2 planes in under the raised
    vmem_limit).  DNNCA_FLATCHAIN_IM2COL=0 forces nine-dot everywhere.'''
    if not _im2col():
        return False
    cip, cmp_ = _pad8(ci), _pad8(cm)
    return (9 * (cip + cmp_) + 10 * max(ci, cm)) * hw * 4 \
        <= 12 * 1024 * 1024


def _fwd_kernel_im2col(x_ref, w1f_ref, b1_ref, w2f_ref, b2_ref, o_ref,
                       c1_ref, im1_ref, im2_ref, *, W, interpret):
    '''One image: im1/im2 are [9*Cp, HW] scratches; each conv is ONE dot.

    x_ref [1, Cip, HW] (rows >= Ci zero), w1f [Cmp, 9*Cip],
    w2f [Co, 9*Cmp]; c1 is saved padded ([1, Cmp, HW], zero rows) so the
    backward can rebuild its im2col stack with tile-aligned writes only.
    '''
    x = x_ref[0]
    hw = x.shape[-1]
    cip = x.shape[0]
    cmp_ = c1_ref.shape[1]
    taps = _taps(hw, W)

    for t, (s, valid) in enumerate(taps):
        im1_ref[t * cip:(t + 1) * cip] = jnp.where(
            valid, _roll(x, s, hw, interpret), 0.0)
    c1 = lax.dot_general(w1f_ref[:], im1_ref[:], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    c1 = jnp.maximum(c1 + b1_ref[:, 0:1], 0.0)
    c1_ref[0] = c1

    for t, (s, valid) in enumerate(taps):
        im2_ref[t * cmp_:(t + 1) * cmp_] = jnp.where(
            valid, _roll(c1, s, hw, interpret), 0.0)
    out = lax.dot_general(w2f_ref[:], im2_ref[:], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o_ref[0] = jnp.maximum(out + b2_ref[:, 0:1], 0.0)


def _bwd_kernel_im2col(x_ref, w1s_ref, w2s_ref, c1_ref, o_ref,
                       g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                       ima_ref, imb_ref, *, W, interpret):
    '''One image: dx + all four weight/bias grads, single-dot contractions.

    w1s [9*Cip, Cmp] / w2s [9*Cmp, Co] are the tap-stacked (non-transposed)
    weights; their zero-padded rows make every scratch row beyond the true
    channel count an exact zero, so tap blocks are consumed with full-tile
    reads and no masking. Weight grads accumulate across the batch grid.
    '''
    x = x_ref[0]                        # [Cip, HW]
    hw = x.shape[-1]
    cip = x.shape[0]
    cmp_ = c1_ref.shape[1]
    taps = _taps(hw, W)
    first = pl.program_id(0) == 0
    g2 = jnp.where(o_ref[0] > 0, g_ref[0], 0.0)      # [Co, HW]
    c1 = c1_ref[0]                                    # [Cmp, HW] (zero rows)

    # rebuild conv2's im2col stack from c1 -> imb
    for t, (s, valid) in enumerate(taps):
        imb_ref[t * cmp_:(t + 1) * cmp_] = jnp.where(
            valid, _roll(c1, s, hw, interpret), 0.0)
    dw2 = lax.dot_general(g2, imb_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [Co, 9*Cmp]
    dw2_ref[:] = jnp.where(first, 0.0, dw2_ref[:]) + dw2
    db2_ref[:, 0] = (jnp.where(first, 0.0, db2_ref[:, 0])
                     + jnp.sum(g2, axis=1))

    # dc1 = relu'(c1) * sum_t roll^-1(mask_t * (W2_t @ g2)) — one dot
    # produces all nine tap terms stacked; zero rows stay zero.
    imb_ref[:] = lax.dot_general(w2s_ref[:], g2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dc1 = jnp.zeros(c1.shape, jnp.float32)
    for t, (s, valid) in enumerate(taps):
        term = imb_ref[t * cmp_:(t + 1) * cmp_]
        dc1 = dc1 + _roll(jnp.where(valid, term, 0.0), -s, hw, interpret)
    dc1 = jnp.where(c1 > 0, dc1, 0.0)                 # [Cmp, HW]

    # rebuild conv1's im2col stack from x -> ima
    for t, (s, valid) in enumerate(taps):
        ima_ref[t * cip:(t + 1) * cip] = jnp.where(
            valid, _roll(x, s, hw, interpret), 0.0)
    dw1 = lax.dot_general(dc1, ima_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [Cmp, 9*Cip]
    dw1_ref[:] = jnp.where(first, 0.0, dw1_ref[:]) + dw1
    db1_ref[:, 0] = (jnp.where(first, 0.0, db1_ref[:, 0])
                     + jnp.sum(dc1, axis=1))

    # dx = sum_t roll^-1(mask_t * (W1_t @ dc1)) — stacked by one dot
    ima_ref[:] = lax.dot_general(w1s_ref[:], dc1, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    acc = jnp.zeros(x.shape, jnp.float32)
    for t, (s, valid) in enumerate(taps):
        term = ima_ref[t * cip:(t + 1) * cip]
        acc = acc + _roll(jnp.where(valid, term, 0.0), -s, hw, interpret)
    dx_ref[0] = acc


def _im2col_weights(w1, b1, w2, ci, cm):
    '''Pack HWIO weights for the im2col kernels.

    Returns (w1f [Cmp, 9*Cip], b1p [Cmp], w1s [9*Cip, Cmp],
             cip, cmp); rows/cols beyond the true channel counts are zero.
    '''
    cip, cmp_ = _pad8(ci), _pad8(cm)
    w1r = jnp.pad(w1.reshape(9, ci, cm),
                  ((0, 0), (0, cip - ci), (0, cmp_ - cm)))
    w1s = w1r.reshape(9 * cip, cmp_)
    w1f = jnp.transpose(w1s)
    b1p = jnp.pad(b1, (0, cmp_ - cm))
    return w1f, b1p, w1s, cip, cmp_


def _fwd_call_im2col(xf, w1, b1, w2, b2, Wd, interpret):
    b, ci, hw = xf.shape
    cm, co = w1.shape[-1], w2.shape[-1]
    w1f, b1p, _, cip, cmp_ = _im2col_weights(w1, b1, w2, ci, cm)
    w2r = jnp.pad(w2.reshape(9, cm, co), ((0, 0), (0, cmp_ - cm), (0, 0)))
    w2f = jnp.transpose(w2r.reshape(9 * cmp_, co))
    xp = jnp.pad(xf, ((0, 0), (0, cip - ci), (0, 0)))
    out, c1 = pl.pallas_call(
        functools.partial(_fwd_kernel_im2col, W=Wd, interpret=interpret),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cip, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((cmp_, 9 * cip), lambda i: (0, 0)),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0)),
            pl.BlockSpec((co, 9 * cmp_), lambda i: (0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, cmp_, hw), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, co, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, cmp_, hw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9 * cip, hw), jnp.float32),
            pltpu.VMEM((9 * cmp_, hw), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w1f, b1p[:, None], w2f, b2[:, None])
    return out, c1


def _bwd_call_im2col(xf, c1p, out, g, w1, w2, Wd, interpret):
    '''c1p is the padded [B, Cmp, HW] residual saved by the forward.'''
    b, ci, hw = xf.shape
    cm, co = w1.shape[-1], w2.shape[-1]
    _, _, w1s, cip, cmp_ = _im2col_weights(w1, jnp.zeros((cm,), w1.dtype),
                                           w2, ci, cm)
    w2r = jnp.pad(w2.reshape(9, cm, co), ((0, 0), (0, cmp_ - cm), (0, 0)))
    w2s = w2r.reshape(9 * cmp_, co)
    xp = jnp.pad(xf, ((0, 0), (0, cip - ci), (0, 0)))
    dxp, dw1f, db1p, dw2f, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel_im2col, W=Wd, interpret=interpret),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cip, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((9 * cip, cmp_), lambda i: (0, 0)),
            pl.BlockSpec((9 * cmp_, co), lambda i: (0, 0)),
            pl.BlockSpec((1, cmp_, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cip, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((cmp_, 9 * cip), lambda i: (0, 0)),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0)),
            pl.BlockSpec((co, 9 * cmp_), lambda i: (0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cip, hw), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 9 * cip), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 1), jnp.float32),
            jax.ShapeDtypeStruct((co, 9 * cmp_), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9 * cip, hw), jnp.float32),
            pltpu.VMEM((9 * cmp_, hw), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w1s, w2s, c1p, out, g)
    dx = dxp[:, :ci]
    dw1 = jnp.transpose(dw1f).reshape(9, cip, cmp_)[:, :ci, :cm] \
        .reshape(3, 3, ci, cm)
    dw2 = jnp.transpose(dw2f).reshape(9, cmp_, co)[:, :cm] \
        .reshape(3, 3, cm, co)
    return dx, dw1, db1p[:cm, 0], dw2, db2[:, 0]


def _fwd_call(xf, w1, b1, w2, b2, Wd, interpret):
    b, ci, hw = xf.shape
    cm, co = w1.shape[-1], w2.shape[-1]
    w1t = jnp.transpose(w1.reshape(9, ci, cm), (0, 2, 1))
    w2t = jnp.transpose(w2.reshape(9, cm, co), (0, 2, 1))
    out, c1 = pl.pallas_call(
        functools.partial(_fwd_kernel, W=Wd, interpret=interpret),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ci, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, cm, ci), lambda i: (0, 0, 0)),
            pl.BlockSpec((cm, 1), lambda i: (0, 0)),
            pl.BlockSpec((9, co, cm), lambda i: (0, 0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, cm, hw), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, co, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, cm, hw), jnp.float32),
        ],
        # 256^2 planes: several [C, 65536] f32 values live at once
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(xf, w1t, b1[:, None], w2t, b2[:, None])
    return out, c1


def _bwd_call(xf, c1, out, g, w1, w2, Wd, interpret):
    b, ci, hw = xf.shape
    cm, co = w1.shape[-1], w2.shape[-1]
    w1_taps = w1.reshape(9, ci, cm)
    w1t = jnp.transpose(w1_taps, (0, 2, 1))
    w2_taps = w2.reshape(9, cm, co)
    w2t = jnp.transpose(w2_taps, (0, 2, 1))
    dx, dw1t, db1, dw2t, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, W=Wd, interpret=interpret),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ci, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, ci, cm), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, cm, ci), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, cm, co), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, co, cm), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cm, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ci, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, cm, ci), lambda i: (0, 0, 0)),
            pl.BlockSpec((cm, 1), lambda i: (0, 0)),
            pl.BlockSpec((9, co, cm), lambda i: (0, 0, 0)),
            pl.BlockSpec((co, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ci, hw), jnp.float32),
            jax.ShapeDtypeStruct((9, cm, ci), jnp.float32),
            jax.ShapeDtypeStruct((cm, 1), jnp.float32),
            jax.ShapeDtypeStruct((9, co, cm), jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(xf, w1_taps, w1t, w2_taps, w2t, c1, out, g)
    dw1 = jnp.transpose(dw1t, (0, 2, 1)).reshape(3, 3, ci, cm)
    dw2 = jnp.transpose(dw2t, (0, 2, 1)).reshape(3, 3, cm, co)
    return dx, dw1, db1[:, 0], dw2, db2[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def conv_chain_flat_nchw(x, w1, b1, w2, b2, interpret=False):
    '''relu(conv(relu(conv(x, w1)+b1), w2)+b2) for NCHW x, SAME, stride 1.

    One Pallas kernel forward, one backward. f32 only.
    '''
    out, _ = _chain_fwd(x, w1, b1, w2, b2, interpret)
    return out


def _spmd_mesh(b):
    '''The engine-announced data-parallel mesh, if one is active and the
    per-shard batch is even (see fastconv._conv_spmd_mesh).'''
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


def _chain_fwd(x, w1, b1, w2, b2, interpret):
    import jax as _jax
    b, c, h, w = x.shape
    xf = x.reshape(b, c, h * w)
    im2col = _use_im2col(c, w1.shape[-1], h * w)
    fwd = functools.partial(_fwd_call_im2col if im2col else _fwd_call,
                            Wd=w, interpret=interpret)
    mesh = _spmd_mesh(b)
    if mesh is not None and _jax.device_count() != 1:
        from ...models import fastconv
        fwd = fastconv._shard_map_batch(fwd, mesh, n_batch_in=1, n_out=2)
    out, c1 = fwd(xf, w1, b1, w2, b2)
    co = w2.shape[-1]
    return out.reshape(b, co, h, w), (xf, c1, out, w1, w2, (h, w))


def _chain_bwd(interpret, res, g):
    import jax as _jax
    xf, c1, out, w1, w2, (h, w) = res
    b = xf.shape[0]
    co = w2.shape[-1]
    gf = g.reshape(b, co, h * w)
    im2col = _use_im2col(xf.shape[1], w1.shape[-1], h * w)
    bwd = functools.partial(_bwd_call_im2col if im2col else _bwd_call,
                            Wd=w, interpret=interpret)
    mesh = _spmd_mesh(b)
    if mesh is not None and _jax.device_count() != 1:
        from ...models import fastconv
        # dx stays batch-sharded; weight/bias grads psum across shards
        bwd = fastconv._shard_map_batch(bwd, mesh, n_batch_in=4, n_out=5,
                                        reduced_out=(1, 2, 3, 4))
    dx, dw1, db1, dw2, db2 = bwd(xf, c1, out, gf, w1, w2)
    return (dx.reshape(b, xf.shape[1], h, w), dw1, db1, dw2, db2)


conv_chain_flat_nchw.defvjp(_chain_fwd, _chain_bwd)


def flat_chain_ok(xshape, kernel_size, filters, padding, dtype):
    '''Static eligibility: NCHW SAME stride-1 3x3 f32 chains whose VMEM
    working set fits (a handful of [C, HW] f32 planes).'''
    if kernel_size != 3 or padding != 'SAME':
        return False
    if dtype not in (None, jnp.float32, 'float32'):
        return False
    b, ci, h, w = xshape
    hw = h * w
    if hw > 256 * 256 or w % 8 != 0:
        return False
    if _use_im2col(ci, filters, hw):
        return True          # fits the 12 MB budget by construction
    # nine-dot: no scratches; bwd keeps ~8 activation planes resident
    # (x, c1, out, g, dx + roll temps) under the raised 40 MB vmem_limit
    cmax = max(ci, filters)
    return 8 * cmax * hw * 4 <= 20 * 1024 * 1024
