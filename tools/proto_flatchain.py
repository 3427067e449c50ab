'''Prototype: MXU-formulation fused ConvChain kernel ("flatland").

Idea (ROADMAP #1): keep a level's activations as [C, H*W] — spatial
flattened into the LANE axis — so a SAME 3x3 conv becomes, per tap t at
offset s_t = (dy-1)*W + (dx-1):

    acc += W_t^T  @  mask_t * lane_roll(x, -s_t)      # [Cm,Ci]@[Ci,HW]

i.e. nine masked lane-rolls (cheap VPU) + nine MXU contractions over the
channel dim, with NO relayouts, NO scalar tap loops, and the whole
conv+bias+relu x2 chain in one kernel. The scalar-stencil chain kernel
measured 3-10x slower than XLA at 12-24 channels and the XLA path drags
~60 layout copies/step (RESULTS.md round 3); this is the formulation
that matches the hardware instead.

Usage:
  python tools/proto_flatchain.py --interpret      # CPU parity check
  python tools/proto_flatchain.py --bench          # real-chip timing
'''

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _taps(wt, hw, W):
        '''(shift, mask) per 3x3 tap for a [*, hw] flat block.'''
        col = lax.broadcasted_iota(jnp.int32, (1, hw), 1) % W
        row = lax.broadcasted_iota(jnp.int32, (1, hw), 1) // W
        H = hw // W
        out = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = dy * W + dx
                valid = ((col + dx >= 0) & (col + dx < W)
                         & (row + dy >= 0) & (row + dy < H))
                out.append((s, valid))
        return out

    def kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, c1_ref, *,
               W, interpret):
        x = x_ref[0]                       # [Ci, HW] f32
        hw = x.shape[-1]
        taps = _taps(None, hw, W)

        def roll(v, s):
            if interpret:
                return jnp.roll(v, -s, axis=-1)
            return pltpu.roll(v, -s % hw, axis=1)

        cm = c1_ref.shape[0]
        c1_ref[:] = jnp.broadcast_to(b1_ref[:, 0:1], c1_ref.shape)
        for t, (s, valid) in enumerate(taps):
            xs = jnp.where(valid, roll(x, s), 0.0)
            c1_ref[:] += jax.lax.dot_general(
                w1t_ref[t], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        c1_ref[:] = jnp.maximum(c1_ref[:], 0.0)

        o_ref[0] = jnp.broadcast_to(b2_ref[:, 0:1], o_ref.shape[1:])
        c1 = c1_ref[:]
        for t, (s, valid) in enumerate(taps):
            cs = jnp.where(valid, roll(c1, s), 0.0)
            o_ref[0] += jax.lax.dot_general(
                w2t_ref[t], cs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = jnp.maximum(o_ref[0], 0.0)

    def bwd_kernel(x_ref, w1_ref, w1t_ref, w2_ref, w2t_ref, c1_ref, o_ref,
                   g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                   dc1_ref, *, W, interpret):
        '''One image: dx, dw1/db1, dw2/db2 for the fused chain.

        All weight gradients are [HW]-contraction dots (K=4096 on the
        MXU); dc1/dx are reverse masked lane-rolls of [Cm,Ci]@[Ci,HW]
        dots. Weight-gradient outputs accumulate across the batch grid
        (one program per image adds its contribution).
        '''
        x = x_ref[0]
        hw = x.shape[-1]
        taps = _taps(None, hw, W)

        def roll(v, s):
            if interpret:
                return jnp.roll(v, -s, axis=-1)
            return pltpu.roll(v, -s % hw, axis=1)

        first = pl.program_id(0) == 0
        g2 = jnp.where(o_ref[0] > 0, g_ref[0], 0.0)
        c1 = c1_ref[0]

        # dw2/db2 + dc1
        dc1 = jnp.zeros(c1.shape, jnp.float32)
        for t, (s, valid) in enumerate(taps):
            cs = jnp.where(valid, roll(c1, s), 0.0)
            contrib = jax.lax.dot_general(
                g2, cs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Co, Cm]
            prev = jnp.where(first, 0.0, dw2_ref[t])
            dw2_ref[t] = prev + contrib
            term = jax.lax.dot_general(
                w2_ref[t], g2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Cm, HW]
            dc1 = dc1 + roll(jnp.where(valid, term, 0.0), -s)
        prev = jnp.where(first, 0.0, db2_ref[:, 0])
        db2_ref[:, 0] = prev + jnp.sum(g2, axis=1)
        dc1 = jnp.where(c1 > 0, dc1, 0.0)
        dc1_ref[:] = dc1

        # dw1/db1 + dx
        acc = jnp.zeros(x.shape, jnp.float32)
        for t, (s, valid) in enumerate(taps):
            xs = jnp.where(valid, roll(x, s), 0.0)
            contrib = jax.lax.dot_general(
                dc1, xs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Cm, Ci]
            prev = jnp.where(first, 0.0, dw1_ref[t])
            dw1_ref[t] = prev + contrib
            term = jax.lax.dot_general(
                w1_ref[t], dc1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Ci, HW]
            acc = acc + roll(jnp.where(valid, term, 0.0), -s)
        prev = jnp.where(first, 0.0, db1_ref[:, 0])
        db1_ref[:, 0] = prev + jnp.sum(dc1, axis=1)
        dx_ref[0] = acc

    @functools.partial(jax.jit, static_argnames=('Wd', 'interpret'))
    def chain_flat_bwd(x, c1, out, g, w1, w2, Wd, interpret=False):
        '''Gradients for chain_flat given saved (x, c1, out).

        Returns dx [B,Ci,HW], dw1 [3,3,Ci,Cm], db1, dw2, db2.
        '''
        b, ci, hw = x.shape
        cm = w1.shape[-1]
        co = w2.shape[-1]
        w1_taps = w1.reshape(9, ci, cm)           # [9, Ci, Cm]
        w1t = jnp.transpose(w1_taps, (0, 2, 1))
        w2_taps = w2.reshape(9, cm, co)
        w2t = jnp.transpose(w2_taps, (0, 2, 1))
        dx, dw1t, db1, dw2t, db2 = pl.pallas_call(
            functools.partial(bwd_kernel, W=Wd, interpret=interpret),
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
            scratch_shapes=[pltpu.VMEM((cm, hw), jnp.float32)],
            interpret=interpret,
        )(x, w1_taps, w1t, w2_taps, w2t, c1, out, g)
        dw1 = jnp.transpose(dw1t, (0, 2, 1)).reshape(3, 3, ci, cm)
        dw2 = jnp.transpose(dw2t, (0, 2, 1)).reshape(3, 3, cm, co)
        return dx, dw1, db1[:, 0], dw2, db2[:, 0]

    @functools.partial(jax.jit, static_argnames=('Wd', 'interpret'))
    def chain_flat(x, w1, b1, w2, b2, Wd, interpret=False):
        '''x [B, Ci, HW]; w1 [3,3,Ci,Cm]; w2 [3,3,Cm,Co] (HWIO).'''
        b, ci, hw = x.shape
        cm = w1.shape[-1]
        co = w2.shape[-1]
        # pre-transpose taps outside (Mosaic has no transpose):
        # [3,3,Ci,Cm] -> [9, Cm, Ci]
        w1t = jnp.transpose(w1.reshape(9, ci, cm), (0, 2, 1))
        w2t = jnp.transpose(w2.reshape(9, cm, co), (0, 2, 1))
        out = pl.pallas_call(
            functools.partial(kernel, W=Wd, interpret=interpret),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, ci, hw), lambda i: (i, 0, 0)),
                pl.BlockSpec((9, cm, ci), lambda i: (0, 0, 0)),
                pl.BlockSpec((cm, 1), lambda i: (0, 0)),
                pl.BlockSpec((9, co, cm), lambda i: (0, 0, 0)),
                pl.BlockSpec((co, 1), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, co, hw), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, co, hw), jnp.float32),
            scratch_shapes=[pltpu.VMEM((cm, hw), jnp.float32)],
            interpret=interpret,
        )(x, w1t, b1[:, None], w2t, b2[:, None])
        return out

    return chain_flat, chain_flat_bwd


def reference(x_nchw, w1, b1, w2, b2):
    import jax.numpy as jnp
    from jax import lax
    y = lax.conv_general_dilated(
        x_nchw, w1, (1, 1), 'SAME',
        dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
    y = jnp.maximum(y + b1.reshape(1, -1, 1, 1), 0)
    y = lax.conv_general_dilated(
        y, w2, (1, 1), 'SAME',
        dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
    return jnp.maximum(y + b2.reshape(1, -1, 1, 1), 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--interpret', action='store_true')
    p.add_argument('--bench', action='store_true')
    p.add_argument('--bwd', action='store_true')
    p.add_argument('--B', type=int, default=8)
    p.add_argument('--ci', type=int, default=6)
    p.add_argument('--cm', type=int, default=12)
    p.add_argument('--co', type=int, default=12)
    p.add_argument('--H', type=int, default=64)
    p.add_argument('--W', type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    chain_flat, chain_flat_bwd = make_kernel()

    rng = np.random.default_rng(0)
    B, ci, cm, co, H, W = args.B, args.ci, args.cm, args.co, args.H, args.W
    x = rng.standard_normal((B, ci, H, W)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, ci, cm)) * 0.2).astype(np.float32)
    b1 = rng.standard_normal((cm,)).astype(np.float32) * 0.1
    w2 = (rng.standard_normal((3, 3, cm, co)) * 0.2).astype(np.float32)
    b2 = rng.standard_normal((co,)).astype(np.float32) * 0.1

    want = np.asarray(reference(jnp.asarray(x), jnp.asarray(w1),
                                jnp.asarray(b1), jnp.asarray(w2),
                                jnp.asarray(b2)))
    got = np.asarray(chain_flat(
        jnp.asarray(x.reshape(B, ci, H * W)), jnp.asarray(w1),
        jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2), Wd=W,
        interpret=args.interpret)).reshape(B, co, H, W)
    err = np.abs(got - want).max()
    print('max abs err vs XLA conv chain:', err)
    assert err < 1e-3, err

    if args.bwd:
        from jax import lax

        def ref_loss(x_, w1_, b1_, w2_, b2_, cot):
            return jnp.sum(reference(x_, w1_, b1_, w2_, b2_) * cot)

        cot = rng.standard_normal((B, co, H, W)).astype(np.float32)
        grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(cot))
        # saved activations (values identical to the kernel's)
        c1 = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w1), (1, 1), 'SAME',
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        c1 = jnp.maximum(c1 + jnp.asarray(b1).reshape(1, -1, 1, 1), 0)
        outv = jnp.asarray(want)
        dx, dw1, db1, dw2, db2 = chain_flat_bwd(
            jnp.asarray(x.reshape(B, ci, H * W)),
            c1.reshape(B, cm, H * W), outv.reshape(B, co, H * W),
            jnp.asarray(cot.reshape(B, co, H * W)),
            jnp.asarray(w1), jnp.asarray(w2), Wd=W,
            interpret=args.interpret)
        names = ('dx', 'dw1', 'db1', 'dw2', 'db2')
        mine = (np.asarray(dx).reshape(B, ci, H, W), np.asarray(dw1),
                np.asarray(db1), np.asarray(dw2), np.asarray(db2))
        for name, a, b_ in zip(names, mine, [np.asarray(g) for g in grads]):
            scale = max(np.abs(b_).max(), 1e-6)
            e = np.abs(a - b_).max() / scale
            print(f'  {name}: rel err {e:.2e}')
            assert e < 1e-4, (name, e)

    if args.bench:
        import time
        xf = jnp.asarray(x.reshape(B, ci, H * W))
        a = [jnp.asarray(v) for v in (w1, b1, w2, b2)]
        f = lambda: chain_flat(xf, *a, Wd=W, interpret=args.interpret)
        jax.block_until_ready(f())
        n = 100
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        t_flat = (time.perf_counter() - t0) / n * 1e6
        xn = jnp.asarray(x)
        g = jax.jit(lambda x: reference(x, *a))
        jax.block_until_ready(g(xn))
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(xn)
        jax.block_until_ready(r)
        t_xla = (time.perf_counter() - t0) / n * 1e6
        print(f'flatland chain: {t_flat:8.1f} us   XLA chain: {t_xla:8.1f} us')


if __name__ == '__main__':
    main()
