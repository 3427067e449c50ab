'''Prototype: fused Pallas ConvTranspose (kernel==stride==2, NHWC).

Target (ROADMAP #2 / VERDICT r2 #4): unet_big's decoder tconvs. XLA
lowers ``lax.conv_transpose`` to an LHS-dilated conv whose backward drags
de-interleave copies and "reduce combo" fusions (RESULTS.md round 3);
the einsum reformulations measured SLOWER. This kernel avoids every
strided access via two layout identities:

- **x-interleave by packed dot**: for output row phase dy, the two
  column phases come from ONE dot against lane-packed weights
  ``xf @ [w(dy,0) | w(dy,1)]  ->  [M, 2*Co]``, and the row-major
  reshape ``[M, 2*Co] -> [2*M, Co]`` lands exactly the interleaved
  x' = 2x+dx order. When Co is a multiple of 128 the split sits on a
  lane-tile boundary (cheap re-tiling, no packed shuffles).
- **y-interleave by BlockSpec**: the output block [1, 2*hb, 2W, Co] at
  grid row j covers output rows [2*hb*j, 2*hb*(j+1)) — precisely the
  interleaved targets of input rows [hb*j, hb*(j+1)) — so phase rows are
  written with static per-row stores and the scatter is free (it is just
  where the block lands in HBM).

The backward runs the identities in reverse: g rows 2r+dy gathered with
static reads, the inverse reshape ``[2M, Co] -> [M, 2*Co]`` de-interleaves
x', then dw = xf^T @ gp (K = hb*W, accumulated across the grid) and
dx = gp @ wpack^T in single dots. No interleave/de-interleave copies
ever touch HBM.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/proto_tconv.py --interpret
  python tools/proto_tconv.py --bench          # real-chip timing vs XLA
'''

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _pick_hb(H, W, ci, co):
    '''Rows per program: M = hb*W >= 128 if possible, VMEM-bounded.'''
    hb = 1
    def vmem(hb):
        return 4 * (hb * W * ci + 2 * hb * 2 * W * co * 2 + 2 * ci * 2 * co)
    while hb < H and (hb * 2) * W <= 2048 and H % (hb * 2) == 0 \
            and vmem(hb * 2) < 10 * 1024 * 1024:
        hb *= 2
        if hb * W >= 256:
            break
    return hb


def make_fns(interpret):
    """The kernels live in the library now (ops/pallas/tconv_kernel.py);
    this harness benches/checks the production code."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dnncancerannotator_tpu.ops.pallas import tconv_kernel as TK

    def fwd(x, w, b):
        return TK._fwd_call(x, w, b, interpret)

    def bwd(x, g, w):
        return TK._bwd_call(x, g, w, interpret)

    def xla_tconv(x, w, b):
        return lax.conv_transpose(
            x, w, (2, 2), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b

    return fwd, bwd, xla_tconv


def check(args):
    import jax
    import jax.numpy as jnp
    fwd, bwd, xla_tconv = make_fns(args.interpret)
    rng = np.random.RandomState(0)
    shapes = [(2, 8, 8, 128, 128), (1, 4, 4, 256, 128), (2, 8, 16, 128, 256)]
    if args.full:
        shapes += [(8, 16, 16, 512, 512), (8, 32, 32, 512, 256),
                   (8, 64, 64, 256, 128), (8, 128, 128, 128, 64)]
    for (B, H, W, ci, co) in shapes:
        x = jnp.asarray(rng.randn(B, H, W, ci), jnp.float32)
        w = jnp.asarray(rng.randn(2, 2, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        ref = xla_tconv(x, w, b)
        out = fwd(x, w, b)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
        f = lambda x_, w_, b_: jnp.vdot(xla_tconv(x_, w_, b_), g)
        dx_r, dw_r, db_r = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
        dx, dw, db = bwd(x, g, w)
        ex = float(jnp.max(jnp.abs(dx - dx_r)) / jnp.max(jnp.abs(dx_r)))
        ew = float(jnp.max(jnp.abs(dw - dw_r)) / jnp.max(jnp.abs(dw_r)))
        eb = float(jnp.max(jnp.abs(db - db_r)) / jnp.max(jnp.abs(db_r)))
        print(f'shape B{B} H{H} W{W} {ci}->{co}: fwd {err:.2e} '
              f'dx {ex:.2e} dw {ew:.2e} db {eb:.2e}')
        assert max(err, ex, ew, eb) < 5e-5, 'PARITY FAIL'
    print('PARITY OK')


def bench(args):
    import time
    import jax
    import jax.numpy as jnp
    fwd, bwd, xla_tconv = make_fns(False)
    rng = np.random.RandomState(0)
    # unet_big decoder shapes (f32): up_0..up_3
    shapes = [(8, 16, 16, 512, 512), (8, 32, 32, 512, 256),
              (8, 64, 64, 256, 128), (8, 128, 128, 128, 64)]

    def timeit(f, *a):
        r = f(*a)
        jax.tree_util.tree_map(
            lambda t: np.asarray(jax.device_get(t.ravel()[0])), r)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.tree_util.tree_map(
            lambda t: np.asarray(jax.device_get(t.ravel()[0])), r)
        return (time.perf_counter() - t0) / n * 1e3

    for (B, H, W, ci, co) in shapes:
        x = jnp.asarray(rng.randn(B, H, W, ci), jnp.float32)
        w = jnp.asarray(rng.randn(2, 2, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        g = jnp.asarray(rng.randn(B, 2 * H, 2 * W, co), jnp.float32)

        jf = jax.jit(fwd)
        jb = jax.jit(bwd)
        jx = jax.jit(xla_tconv)

        def xla_bwd(x, g, w):
            f = lambda x_, w_, b_: jnp.vdot(xla_tconv(x_, w_, b_), g)
            return jax.grad(f, argnums=(0, 1, 2))(x, w, jnp.zeros_like(b))
        jxb = jax.jit(xla_bwd)

        tf_p = timeit(jf, x, w, b)
        tf_x = timeit(jx, x, w, b)
        tb_p = timeit(jb, x, g, w)
        tb_x = timeit(jxb, x, g, w)
        print(f'B{B} H{H} W{W} {ci}->{co}: fwd pallas {tf_p:.3f} ms '
              f'xla {tf_x:.3f} ms | bwd pallas {tb_p:.3f} ms '
              f'xla {tb_x:.3f} ms', flush=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--interpret', action='store_true')
    ap.add_argument('--bench', action='store_true')
    ap.add_argument('--full', action='store_true')
    args = ap.parse_args()
    if args.bench:
        bench(args)
    else:
        check(args)
