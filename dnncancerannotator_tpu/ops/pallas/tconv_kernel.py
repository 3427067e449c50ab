'''Fused Pallas ConvTranspose for the kernel==stride==2 NHWC upsampling
used by every Upsample block (reference
annotator/models/tf_models/components.py:84-166 ``Conv2DTranspose(
kernel=rate, stride=rate)``).

XLA lowers ``lax.conv_transpose`` to an LHS-dilated convolution whose
backward drags de-interleave copies and reduce-combo fusions around the
phase dots (RESULTS.md round 3, unet_big profile); the einsum
reformulations measured slower (round-2 negative result). This kernel
expresses the whole op as two MXU dots per program with ZERO strided
accesses, via two layout identities:

- **x-interleave by packed dot**: for output row phase dy, both column
  phases come from one dot against lane-packed flipped weights
  ``xf @ [w(1-dy,1) | w(1-dy,0)]  ->  [M, 2*Co]``; the row-major reshape
  ``[M, 2*Co] -> [2*M, Co]`` lands exactly the interleaved x' = 2x+dx
  order (a lane-tile-boundary split when Co % 128 == 0).
- **y-interleave by BlockSpec**: the output block [1, 2*hb, 2W, Co] at
  grid row j covers output rows [2*hb*j, 2*hb*(j+1)) — precisely the
  interleaved targets of input rows [hb*j, hb*(j+1)) — so phase rows are
  written with static per-row stores and the row scatter is free (it is
  just where the block lands in HBM).

The backward runs the identities in reverse: g rows 2r+dy gathered with
static reads, the inverse reshape ``[2M, Co] -> [M, 2*Co]`` de-interleaves
x', then dw = xf^T @ gp (K = hb*W, accumulated across the grid) and
dx = gp @ wpack^T as single dots. No interleave/de-interleave copies
ever touch HBM. f32 in/out, f32 MXU accumulation; parity vs
``lax.conv_transpose`` is exact to float roundoff (tests/test_tconv_kernel).
'''

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_hb(H, W, ci, co):
    '''Rows per program: grow M = hb*W toward >=256 while the resident
    blocks stay under ~10 MB of VMEM and hb divides H.'''
    hb = 1

    def vmem(h):
        return 4 * (h * W * ci + 2 * h * 2 * W * co * 2 + 2 * ci * 2 * co)

    while hb < H and (hb * 2) * W <= 2048 and H % (hb * 2) == 0 \
            and vmem(hb * 2) < 10 * 1024 * 1024:
        hb *= 2
        if hb * W >= 256:
            break
    return hb


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref):
    hb, W, _ = x_ref.shape[1:]
    co = o_ref.shape[-1]
    xf = x_ref[0].reshape(hb * W, x_ref.shape[-1])
    for dy in (0, 1):
        p = lax.dot_general(xf, w_ref[dy], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        q = p.reshape(hb * 2 * W, co) + b_ref[0:1]
        for r in range(hb):
            o_ref[0, 2 * r + dy] = q[r * 2 * W:(r + 1) * 2 * W]


def _bwd_kernel(x_ref, g_ref, w_ref, dx_ref, dw_ref, db_ref, g_scr):
    hb, W, ci = x_ref.shape[1:]
    co = g_ref.shape[-1]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    xf = x_ref[0].reshape(hb * W, ci)
    dxf = jnp.zeros((hb * W, ci), jnp.float32)
    db = jnp.zeros((co,), jnp.float32)
    for dy in (0, 1):
        for r in range(hb):
            g_scr[r * 2 * W:(r + 1) * 2 * W] = g_ref[0, 2 * r + dy]
        db = db + jnp.sum(g_scr[:], axis=0)
        gp = g_scr[:].reshape(hb * W, 2 * co)
        contrib = lax.dot_general(
            xf, gp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [ci, 2co]
        dw_ref[dy] = jnp.where(first, 0.0, dw_ref[dy]) + contrib
        dxf = dxf + lax.dot_general(
            gp, w_ref[dy], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [hb*W, ci]
    db_ref[0] = jnp.where(first, 0.0, db_ref[0]) + db
    dx_ref[0] = dxf.reshape(hb, W, ci)


def _pack_w(w):
    '''lax.conv_transpose applies the kernel spatially FLIPPED:
    out[2y+dy, 2x+dx] = sum_ci x[y,x,ci] * w[1-dy, 1-dx, ci, :].
    Pack [2,2,ci,co] -> [2, ci, 2co]: wp[dy] lanes = [w[1-dy,1] | w[1-dy,0]]
    (phase dx=0 | phase dx=1).'''
    wf = w[::-1, ::-1]
    return jnp.concatenate([wf[:, 0], wf[:, 1]], axis=-1)


def _fwd_call(x, w, b, interpret):
    B, H, W, ci = x.shape
    co = w.shape[-1]
    hb = _pick_hb(H, W, ci, co)
    wp = _pack_w(w)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, hb, W, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, ci, 2 * co), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * hb, 2 * W, co),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, co), jnp.float32),
        interpret=interpret,
    )(x, wp, b[None, :])
    return out


def _bwd_call(x, g, w, interpret):
    B, H, W, ci = x.shape
    co = w.shape[-1]
    hb = _pick_hb(H, W, ci, co)
    wp = _pack_w(w)
    dx, dwp, db = pl.pallas_call(
        _bwd_kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, hb, W, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 2 * hb, 2 * W, co), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, ci, 2 * co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, W, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, ci, 2 * co), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, ci), jnp.float32),
            jax.ShapeDtypeStruct((2, ci, 2 * co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((hb * 2 * W, co), jnp.float32)],
        interpret=interpret,
    )(x, g, wp)
    # invert _pack_w: [2, ci, 2co] -> [2, 2, ci, co] flipped back
    co_ = w.shape[-1]
    dw = jnp.stack([dwp[:, :, :co_], dwp[:, :, co_:]], axis=1)[::-1, ::-1]
    return dx, dw, db[0]


def _spmd_mesh(b):
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_transpose2x2_nhwc(x, w, b, interpret=False):
    '''ConvTranspose(kernel=2, stride=2, SAME) + bias for NHWC f32 x.

    One Pallas kernel forward, one backward (dx + dw + db).
    '''
    out, _ = _tconv_fwd(x, w, b, interpret)
    return out


def _tconv_fwd(x, w, b, interpret):
    fwd = functools.partial(_fwd_call, interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        fwd = fastconv._shard_map_batch(
            lambda x_, w_, b_: fwd(x_, w_, b_), mesh, n_batch_in=1, n_out=1)
    return fwd(x, w, b), (x, w)


def _tconv_bwd(interpret, res, g):
    x, w = res
    bwd = functools.partial(_bwd_call, interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        bwd = fastconv._shard_map_batch(
            lambda x_, g_, w_: bwd(x_, g_, w_), mesh, n_batch_in=2, n_out=3,
            reduced_out=(1, 2))
    return bwd(x, g, w)


conv_transpose2x2_nhwc.defvjp(_tconv_fwd, _tconv_bwd)


def tconv_pallas_ok(xshape, kernel_size, strides, features, data_format,
                    dtype):
    '''Static eligibility. Opt-in via DNNCA_PTCONV=1 while the real-chip
    A/B is outstanding (tools/chip_queue2.sh). Requires NHWC f32, the
    2x2/stride-2 geometry, lane-tile-aligned channel counts (the
    [M, 2Co] -> [2M, Co] reshape sits on a lane-tile boundary only when
    Co % 128 == 0; Ci likewise for the backward's inverse), and blocks
    that fit VMEM.'''
    from .. import gates
    if not gates.enabled('pallas_tconv'):
        return False
    if data_format != 'NHWC' or tuple(kernel_size) != (2, 2) \
            or tuple(strides) != (2, 2):
        return False
    if dtype not in (None, jnp.float32, 'float32'):
        return False
    try:
        from ...parallel import mesh as mesh_lib
        interp = mesh_lib.pallas_interpret()
        if jax.default_backend() == 'cpu' and not interp:
            return False
        if jax.device_count() != 1 and not interp \
                and _spmd_mesh(xshape[0]) is None:
            return False
        B, H, W, ci = xshape
        co = features
        if H < 1 or W < 1 or ci % 128 or co % 128:
            return False
        hb = _pick_hb(H, W, ci, co)
        vmem = 4 * (hb * W * ci + 2 * hb * 2 * W * co * 2 + 4 * ci * co)
        return vmem <= 12 * 1024 * 1024
    except Exception:
        return False
