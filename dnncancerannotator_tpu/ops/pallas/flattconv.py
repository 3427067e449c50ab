'''Flatland ConvTranspose(kernel=2, stride=2) for small-channel NCHW.

The small-model decoder upsamples (reference
annotator/models/tf_models/components.py:84-166, ``Conv2DTranspose(
kernel=rate, stride=rate)``) lower through XLA as phase einsums plus a
6D spatial interleave; at 3-6 channels those interleaves materialize as
[B, C, H, 2, W, 2] copies in exotic layouts on both the forward and the
autodiff backward (~0.45 ms of the 3.1 ms unet.yaml step, profile
2026-08-18). This kernel removes every interleave copy by expressing
both interleave directions as structure, not data movement:

- activations ride flat ``[C, H*W]`` (spatial in lanes, like
  ops/pallas/flatchain.py), so the per-phase channel contraction is one
  MXU dot ``wp[dy]^T @ x -> [2*Co, hb*W]`` per output row phase;
- the **x-interleave is a dot against a constant permutation matrix**:
  for a pair of input rows, lanes ``[t0 r0 | t0 r1 | t1 r0 | t1 r1]``
  map to ``[out row 2r0+dy | out row 2r1+dy]`` via a 0/1 matrix
  ``P [4W, 4W]`` — the MXU performs the lane shuffle for free;
- the **y-interleave is just where the rows are stored**: the output
  block is NCHW ``[Co, 2*hb, 2W]`` and the kernel stores row ``2r+dy``
  with a static sublane index, so the row scatter never exists.

The backward runs the same structure in reverse (P^T de-interleaves,
then dx / dw / db are three dots per phase) — one Pallas kernel forward,
one backward, zero strided accesses anywhere. f32, W % 128 == 0 (lane
slices stay tile-aligned). Parity vs ``lax.conv_transpose`` is exact to
float roundoff (tests/test_flattconv.py).
'''

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(c):
    return -(-c // 8) * 8


def _rows_per_group(W):
    '''Rows handled per permutation dot: enough that every lane slice
    (r*W on the input side) sits on a 128-lane tile boundary.'''
    return max(2, 128 // W)


def _perm_matrix(W, r):
    '''P [2rW, 2rW]: cat lanes [t0 rows 0..r-1 | t1 rows 0..r-1] (W per
    row) -> r output rows of 2W lanes, out[k*2W + 2x + p] = t_p[k*W + x].'''
    n = 2 * r * W
    p = np.zeros((n, n), np.float32)
    for m in range(n):
        ph, k, x = m // (r * W), (m % (r * W)) // W, m % W
        p[m, k * 2 * W + 2 * x + ph] = 1.0
    return p


def _pick_hb(H, r):
    '''Row-block size: a multiple of the group size dividing H, sized to
    keep the per-program phase dot large while blocks stay small.'''
    hb = r
    while hb * 2 <= min(H, 16) and H % (hb * 2) == 0:
        hb *= 2
    return hb


def _fwd_kernel(x_ref, wp_ref, b_ref, p_ref, o_ref, *, W, hb, r):
    '''x [1, Cip, hb*W]; wp [2, Cip, 2*Cop]; b [Cop, 1]; p [2rW, 2rW];
    o [1, Cop, 2*hb, 2W].'''
    x = x_ref[0]
    cop = wp_ref.shape[-1] // 2
    for dy in range(2):
        t = lax.dot_general(wp_ref[dy], x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [2Cop,hbW]
        for g in range(hb // r):
            seg = t[:, g * r * W:(g + 1) * r * W]               # [2Cop, rW]
            cat = jnp.concatenate([seg[0:cop], seg[cop:]], axis=1)
            rows = lax.dot_general(cat, p_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            rows = rows + b_ref[:]                              # [Cop, 2rW]
            for k in range(r):
                o_ref[0, :, 2 * (r * g + k) + dy] = \
                    rows[:, k * 2 * W:(k + 1) * 2 * W]


def _bwd_kernel(x_ref, g_ref, wp_ref, p_ref, dx_ref, dwp_ref, db_ref,
                gscr, *, W, hb, r):
    '''x [1, Cip, hb*W]; g [1, Cop, 2*hb, 2W]; wp [2, Cip, 2*Cop];
    dx [1, Cip, hb*W]; dwp [2, Cip, 2*Cop]; db [Cop, 1];
    gscr VMEM [2*Cop, hb*W].'''
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    x = x_ref[0]
    cop = wp_ref.shape[-1] // 2
    dx = jnp.zeros(x.shape, jnp.float32)
    db = jnp.zeros((cop,), jnp.float32)
    for dy in range(2):
        for g in range(hb // r):
            rows = jnp.concatenate(
                [g_ref[0, :, 2 * (r * g + k) + dy] for k in range(r)],
                axis=1)                                         # [Cop, 2rW]
            seg = lax.dot_general(rows, p_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            gscr[0:cop, g * r * W:(g + 1) * r * W] = seg[:, 0:r * W]
            gscr[cop:, g * r * W:(g + 1) * r * W] = seg[:, r * W:2 * r * W]
        gd = gscr[:]                                             # [2Cop,hbW]
        db = db + jnp.sum(gd[0:cop] + gd[cop:], axis=1)
        dx = dx + lax.dot_general(wp_ref[dy], gd, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dwp = lax.dot_general(x, gd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        dwp_ref[dy] = jnp.where(first, 0.0, dwp_ref[dy]) + dwp
    dx_ref[0] = dx
    db_ref[:, 0] = jnp.where(first, 0.0, db_ref[:, 0]) + db


def _pack_w(w, cip, cop):
    '''HWIO [2, 2, Ci, Co] -> wp [2, Cip, 2*Cop], spatially flipped
    (lax.conv_transpose applies the kernel flipped: out[2y+dy, 2x+dx] +=
    x[y, x] @ w[1-dy, 1-dx]); lanes [dx=0 | dx=1], zero-padded rows/cols.'''
    ci, co = w.shape[2], w.shape[3]
    wf = w[::-1, ::-1]
    wf = jnp.pad(wf, ((0, 0), (0, 0), (0, cip - ci), (0, cop - co)))
    return jnp.concatenate([wf[:, 0], wf[:, 1]], axis=-1)


def _fwd_call(x, w, b, interpret):
    B, ci, H, W = x.shape
    co = w.shape[-1]
    cip, cop = _pad8(ci), _pad8(co)
    r = _rows_per_group(W)
    hb = _pick_hb(H, r)
    xf = jnp.pad(x.reshape(B, ci, H * W), ((0, 0), (0, cip - ci), (0, 0)))
    wp = _pack_w(w, cip, cop)
    bp = jnp.pad(b, (0, cop - co))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, hb=hb, r=r),
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, cip, hb * W), lambda i, j: (i, 0, j)),
            pl.BlockSpec((2, cip, 2 * cop), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((cop, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * r * W, 2 * r * W), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cop, 2 * hb, 2 * W),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, cop, 2 * H, 2 * W), jnp.float32),
        interpret=interpret,
    )(xf, wp, bp[:, None], jnp.asarray(_perm_matrix(W, r)))
    return out[:, :co]


def _bwd_call(x, g, w, interpret):
    B, ci, H, W = x.shape
    co = w.shape[-1]
    cip, cop = _pad8(ci), _pad8(co)
    r = _rows_per_group(W)
    hb = _pick_hb(H, r)
    xf = jnp.pad(x.reshape(B, ci, H * W), ((0, 0), (0, cip - ci), (0, 0)))
    wp = _pack_w(w, cip, cop)
    gp = jnp.pad(g, ((0, 0), (0, cop - co), (0, 0), (0, 0)))
    dxf, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, hb=hb, r=r),
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, cip, hb * W), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, cop, 2 * hb, 2 * W), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((2, cip, 2 * cop), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((2 * r * W, 2 * r * W), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cip, hb * W), lambda i, j: (i, 0, j)),
            pl.BlockSpec((2, cip, 2 * cop), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((cop, 1), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cip, H * W), jnp.float32),
            jax.ShapeDtypeStruct((2, cip, 2 * cop), jnp.float32),
            jax.ShapeDtypeStruct((cop, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * cop, hb * W), jnp.float32)],
        interpret=interpret,
    )(xf, gp, wp, jnp.asarray(_perm_matrix(W, r)))
    dx = dxf[:, :ci].reshape(B, ci, H, W)
    # unpack dwp [2, Cip, 2*Cop] -> flipped HWIO, then unflip
    dwf = jnp.stack([dwp[:, :, :cop], dwp[:, :, cop:]], axis=1)
    dw = dwf[::-1, ::-1][:, :, :ci, :co]
    return dx, dw, dbp[:co, 0]


def _spmd_mesh(b):
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_transpose2x2_flat_nchw(x, w, b, interpret=False):
    '''ConvTranspose(kernel=2, stride=2) + bias for NCHW f32 x.

    One Pallas kernel forward, one backward (dx + dw + db); interleaves
    by permutation-matrix dots and block placement, never by copies.
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


conv_transpose2x2_flat_nchw.defvjp(_tconv_fwd, _tconv_bwd)


def tconv_flat_ok(xshape, kernel_size, strides, features, data_format,
                  dtype):
    '''Static eligibility: NCHW f32 kernel==stride==2 with W % 128 == 0
    (tile-aligned lane slices), even H, small channels. Default ON since
    the 2026-08-19 chip A/B measured +10% end-to-end on unet.yaml
    (2454 -> 2703/2709 slices/s); opt out with deploy_options.flat_tconv:
    false (env DNNCA_FLATTCONV overrides).'''
    from .. import gates
    if not gates.enabled('flat_tconv'):
        return False
    if data_format != 'NCHW' or tuple(kernel_size) != (2, 2) \
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
        B, ci, H, W = xshape
        # the r>1-grouped W=32/64 variants are parity-green but measured
        # SLOWER in-model (2475 vs 2703 slices/s with W=128 only,
        # 2026-08-19 chip A/B): at those sizes XLA's einsum+interleave
        # fuses into neighbors and the pallas_call barrier costs more
        # than the copies it removes. Keep the kernel to the 2W=256+
        # rows where the interleave copies dominate.
        if W % 128:
            return False
        r = _rows_per_group(W)
        if H % r or H < r:
            return False
        return max(ci, features) <= 64
    except Exception:
        return False
