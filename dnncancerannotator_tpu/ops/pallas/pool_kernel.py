'''Fused Pallas 2x2/stride-2 max pool (NHWC) with exact pairwise-max
gradient parity.

The strided-slice pairwise-max formulation (ops/pooling.py) is the fast
XLA path, but its autodiff backward materializes pad-interleave copies —
part of the ~3.4 ms/step copy bucket in the unet_big profile (RESULTS.md
round 3). This kernel uses the tconv layout identities in reverse
(ops/pallas/tconv_kernel.py):

- row pairs arrive as static reads ``x_ref[0, 2r] / [0, 2r+1]`` (the
  y-direction pair),
- the x-direction pair is de-interleaved by the lane-tile-boundary
  reshape ``[2W, C] -> [W, 2C]`` (requires C % 128 == 0), so the window
  max is two ``jnp.maximum``s with zero strided accesses,
- the backward redistributes the cotangent through the same two-level
  max tree with JAX's balanced-tie rule (0.5/0.5 at exact ties — relu
  zeros tie often, so parity here is not measure-zero) and re-interleaves
  dx with the inverse reshape + static row writes.

Gradient semantics match ``jax.grad`` of ``ops.pooling.max_pool2d`` bit
for bit (tests/test_pool_kernel.py). Opt-in via DNNCA_PPOOL=1 pending the
real-chip A/B. Reference op: MaxPool2D(rate) at
annotator/models/tf_models/components.py:59-61.
'''

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_hb(H, W, C):
    '''Output rows per program (input block is 2*hb rows), VMEM-bounded.'''
    hb = 1

    def vmem(h):
        return 4 * (2 * h * 2 * W * C) * 3

    while hb < H and H % (hb * 2) == 0 \
            and vmem(hb * 2) < 8 * 1024 * 1024:
        hb *= 2
        if hb * W >= 512:
            break
    return hb


def _balanced(a, ans, b, g):
    '''JAX's lax.max gradient rule: the cotangent splits evenly among the
    inputs that equal the max (both at an exact tie).'''
    ea = (a == ans).astype(jnp.float32)
    eb = (b == ans).astype(jnp.float32)
    return g * ea / (ea + eb)


def _fwd_kernel(x_ref, o_ref):
    hb, W, C = o_ref.shape[1:]
    for r in range(hb):
        za = x_ref[0, 2 * r].reshape(W, 2 * C)
        zb = x_ref[0, 2 * r + 1].reshape(W, 2 * C)
        m = jnp.maximum(za, zb)                      # y-direction pair
        o_ref[0, r] = jnp.maximum(m[:, :C], m[:, C:])  # x-direction pair


def _bwd_kernel(x_ref, g_ref, dx_ref):
    hb, W, C = g_ref.shape[1:]
    for r in range(hb):
        za = x_ref[0, 2 * r].reshape(W, 2 * C)
        zb = x_ref[0, 2 * r + 1].reshape(W, 2 * C)
        m = jnp.maximum(za, zb)
        m0, m1 = m[:, :C], m[:, C:]
        out = jnp.maximum(m0, m1)
        g = g_ref[0, r]
        dm = jnp.concatenate(
            [_balanced(m0, out, m1, g), _balanced(m1, out, m0, g)], axis=-1)
        dx_ref[0, 2 * r] = _balanced(za, m, zb, dm).reshape(2 * W, C)
        dx_ref[0, 2 * r + 1] = _balanced(zb, m, za, dm).reshape(2 * W, C)


def _fwd_call(x, interpret):
    B, H2, W2, C = x.shape
    H, W = H2 // 2, W2 // 2
    hb = _pick_hb(H, W, C)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, H // hb),
        in_specs=[pl.BlockSpec((1, 2 * hb, 2 * W, C),
                               lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, hb, W, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
    )(x)


def _bwd_call(x, g, interpret):
    B, H2, W2, C = x.shape
    H, W = H2 // 2, W2 // 2
    hb = _pick_hb(H, W, C)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, 2 * hb, 2 * W, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, W, C), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * hb, 2 * W, C),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, C), jnp.float32),
        interpret=interpret,
    )(x, g)


def _spmd_mesh(b):
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool2x2_nhwc(x, interpret=False):
    '''2x2/stride-2 max pool of [B, H, W, C] f32, H and W even.'''
    out, _ = _pool_fwd(x, interpret)
    return out


def _pool_fwd(x, interpret):
    fwd = functools.partial(_fwd_call, interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        fwd = fastconv._shard_map_batch(
            lambda x_: fwd(x_), mesh, n_batch_in=1, n_out=1)
    return fwd(x), x


def _pool_bwd(interpret, x, g):
    bwd = functools.partial(_bwd_call, interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        bwd = fastconv._shard_map_batch(
            lambda x_, g_: bwd(x_, g_), mesh, n_batch_in=2, n_out=1)
    return (bwd(x, g),)


max_pool2x2_nhwc.defvjp(_pool_fwd, _pool_bwd)


def pool_pallas_ok(xshape, rate, data_format, dtype):
    '''Static eligibility: NHWC f32 rate-2 pools with lane-tile-aligned
    channels and even spatial dims. Opt-in via DNNCA_PPOOL=1 pending the
    real-chip A/B (tools/chip_queue2.sh).'''
    from .. import gates
    if not gates.enabled('pallas_pool'):
        return False
    if data_format != 'NHWC' or rate != 2:
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
        B, H, W, C = xshape
        return H % 2 == 0 and W % 2 == 0 and C % 128 == 0 and W >= 2
    except Exception:
        return False
