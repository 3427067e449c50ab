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

Numerics: f32 in/out, f32 MXU accumulation; forward matches the XLA
conv chain to ~3e-6, gradients to <1e-6 relative (tests/test_fastconv).
Reference conv pair: annotator/models/tf_models/components.py:46-61.
'''

import functools

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
    fwd = functools.partial(_fwd_call, Wd=w, interpret=interpret)
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
    bwd = functools.partial(_bwd_call, Wd=w, interpret=interpret)
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
    if hw > 128 * 128 or w % 8 != 0:
        return False
    cmax = max(ci, filters)
    # fwd resident: x + c1 + out blocks + 9 weight taps; ~6 planes margin
    if 6 * cmax * hw * 4 > 12 * 1024 * 1024:
        return False
    return True
