#!/usr/bin/env python
'''Real-chip validation + microbench for the fused encoder-level kernel
(ops/pallas/enclevel.py) at the production shape of unet.yaml's top
encoder level: x [8, 5, 256, 256] -> skip [8, 3, 256, 256] + pooled
[8, 3, 128, 128] (reference components.py:16-81: Conv2D x2 -> MaxPool2D).

Run on the TPU (no env overrides):  python tools/chip_enclevel.py
Compares against the composed XLA path (2x conv+relu -> 2x2 maxpool) for
numeric parity and fwd+bwd wall time. --input_grad exercises the dx path
(level 0 in the model elides it).
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dnncancerannotator_tpu.ops.pallas import enclevel


def compose_reference(x, w1, b1, w2, b2, precision=None):
    dn = ('NCHW', 'HWIO', 'NCHW')

    def conv(v, w, b):
        return lax.conv_general_dilated(
            v, w, (1, 1), 'SAME', dimension_numbers=dn,
            precision=precision) \
            + b[None, :, None, None]

    c1 = jnp.maximum(conv(x, w1, b1), 0.0)
    skip = jnp.maximum(conv(c1, w2, b2), 0.0)
    m = jnp.maximum(skip[:, :, 0::2, :], skip[:, :, 1::2, :])
    pooled = jnp.maximum(m[:, :, :, 0::2], m[:, :, :, 1::2])
    return skip, pooled


def main(b=8, ci=5, f=3, h=256, w=256, iters=50, input_grad=False):
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.randn(b, ci, h, w) * 0.5, jnp.float32),
        jnp.asarray(rng.randn(3, 3, ci, f) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(f) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, f, f) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(f) * 0.1, jnp.float32),
    )

    def loss_ref(*a):
        skip, pooled = compose_reference(*a)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    def loss_hi(*a):
        skip, pooled = compose_reference(*a, precision=lax.Precision.HIGHEST)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    def loss_fused(*a):
        skip, pooled = enclevel.enc_level_nchw(*a, input_grad, False)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    argnums = tuple(range(5)) if input_grad else tuple(range(1, 5))
    oracle_path = '/tmp/enclevel_oracle.npz'
    if '--make-oracle' in sys.argv:
        # run on CPU with JAX_ENABLE_X64=1: exact f64 composed reference
        a64 = tuple(v.astype(jnp.float64) for v in args)
        vh, gvh = jax.value_and_grad(loss_hi, argnums=argnums)(*a64)
        np.savez(oracle_path, loss=np.asarray(vh),
                 **{f'g{i}': np.asarray(g) for i, g in enumerate(gvh)})
        print('oracle written:', oracle_path, float(vh))
        return
    gr = jax.jit(jax.value_and_grad(loss_ref, argnums=argnums))
    gf = jax.jit(jax.value_and_grad(loss_fused, argnums=argnums))

    t0 = time.time()
    vr, gvr = gr(*args)
    jax.block_until_ready(vr)
    print(f'ref compile+run {time.time()-t0:.1f}s')
    t0 = time.time()
    vf, gvf = gf(*args)
    jax.block_until_ready(vf)
    print(f'fused compile+run {time.time()-t0:.1f}s')

    names = (['dx'] if input_grad else []) + 'dw1 db1 dw2 db2'.split()
    ok = True
    if os.path.exists(oracle_path):
        o = np.load(oracle_path)
        vh = float(o['loss'])
        gvh = [o[f'g{i}'] for i in range(len(names))]
        print('loss rel err fused-vs-f64:', abs(vh - float(vf)) / abs(vh))
        print('loss rel err default-vs-f64:', abs(vh - float(vr)) / abs(vh))
        for a, hi, bb, name in zip(gvr, gvh, gvf, names):
            scale = float(np.max(np.abs(hi))) + 1e-9
            errf = float(np.max(np.abs(hi - np.asarray(bb, np.float64)))) \
                / scale
            errd = float(np.max(np.abs(hi - np.asarray(a, np.float64)))) \
                / scale
            flag = 'OK' if errf < max(1e-3, 2 * errd) else 'FAIL'
            ok &= flag == 'OK'
            print(f'  {name}: rel-vs-f64 fused {errf:.2e} '
                  f'default-XLA {errd:.2e} {flag}')
    else:
        print('no oracle file; fused-vs-default only')
        print('loss rel err:', abs(float(vr) - float(vf)) / abs(float(vr)))
        for a, bb, name in zip(gvr, gvf, names):
            err = float(jnp.max(jnp.abs(a - bb)))
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            print(f'  {name}: maxabs {err:.3e} rel {err/scale:.2e}')

    def bench(fn, label):
        fn(*args)  # warm
        jax.block_until_ready(fn(*args)[0])
        t0 = time.time()
        for _ in range(iters):
            v, g = fn(*args)
        jax.block_until_ready(v)
        dt = (time.time() - t0) / iters
        print(f'{label}: {dt*1e3:.3f} ms/iter (fwd+bwd)')
        return dt

    tr = bench(gr, 'XLA composed')
    tf = bench(gf, 'Pallas enclevel')
    print(f'speedup: {tr/tf:.2f}x  parity: {"OK" if ok else "FAIL"}')


if __name__ == '__main__':
    main(input_grad='--input_grad' in sys.argv)
