#!/usr/bin/env python
'''Real-chip validation + microbench for the fused decoder-level kernel
(ops/pallas/declevel.py) at the production shape of unet.yaml's top
decoder level: x [8, 6, 128, 128] -> skip [8, 3, 256, 256] -> out
[8, 3, 256, 256].

Run on the TPU (no env overrides):  python tools/chip_declevel.py
Compares against the composed XLA path (tconv + concat + 2x conv) for
numeric parity and fwd+bwd wall time.
'''
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dnncancerannotator_tpu.ops.pallas import declevel


def compose_reference(x, skip, wt, bt, w1, b1, w2, b2):
    dn = ('NCHW', 'HWIO', 'NCHW')
    up = lax.conv_transpose(x, wt, (2, 2), 'SAME',
                            dimension_numbers=dn) + bt[None, :, None, None]
    cat = jnp.concatenate([up, skip], axis=1)

    def conv(v, w, b):
        return lax.conv_general_dilated(
            v, w, (1, 1), 'SAME', dimension_numbers=dn) \
            + b[None, :, None, None]

    c1 = jnp.maximum(conv(cat, w1, b1), 0.0)
    return jnp.maximum(conv(c1, w2, b2), 0.0)


def main(b=8, cb=6, cs=3, f=3, hh=128, ww=128, iters=50):
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.randn(b, cb, hh, ww) * 0.5, jnp.float32),
        jnp.asarray(rng.randn(b, cs, 2 * hh, 2 * ww) * 0.5, jnp.float32),
        jnp.asarray(rng.randn(2, 2, cb, f) * 0.3, jnp.float32),
        jnp.asarray(rng.randn(f) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, f + cs, f) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(f) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, f, f) * 0.2, jnp.float32),
        jnp.asarray(rng.randn(f) * 0.1, jnp.float32),
    )

    def loss_ref(*a):
        return jnp.sum(compose_reference(*a) ** 2)

    def loss_fused(*a):
        return jnp.sum(declevel.dec_level_nchw(*a, False) ** 2)

    gr = jax.jit(jax.value_and_grad(loss_ref, argnums=tuple(range(8))))
    gf = jax.jit(jax.value_and_grad(loss_fused, argnums=tuple(range(8))))

    t0 = time.time()
    vr, gvr = gr(*args)
    jax.block_until_ready(vr)
    print(f'ref compile+run {time.time()-t0:.1f}s')
    t0 = time.time()
    vf, gvf = gf(*args)
    jax.block_until_ready(vf)
    print(f'fused compile+run {time.time()-t0:.1f}s')

    print('loss rel err:', abs(float(vr) - float(vf)) / abs(float(vr)))
    names = 'dx dskip dwt dbt dw1 db1 dw2 db2'.split()
    ok = True
    for a, bb, name in zip(gvr, gvf, names):
        err = float(jnp.max(jnp.abs(a - bb)))
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        flag = 'OK' if err / scale < 1e-3 else 'FAIL'
        ok &= flag == 'OK'
        print(f'  {name}: maxabs {err:.3e} rel {err/scale:.2e} {flag}')

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
    tf = bench(gf, 'Pallas declevel')
    print(f'speedup: {tr/tf:.2f}x  parity: {"OK" if ok else "FAIL"}')


if __name__ == '__main__':
    main()
