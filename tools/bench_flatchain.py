'''Microbench: the repo's flatland chain kernel vs the XLA conv chain.

Times forward and forward+backward at a given [B, Ci, H, W] -> Cm -> Co
chain shape, for whichever strategy ``DNNCA_FLATCHAIN_IM2COL`` selects.
Sync is a scalar readback (block_until_ready is unreliable through the
axon relay, see RESULTS.md).

  python tools/bench_flatchain.py --ci 6 --cm 12 --H 64 --W 64
'''

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--B', type=int, default=8)
    p.add_argument('--ci', type=int, default=6)
    p.add_argument('--cm', type=int, default=12)
    p.add_argument('--co', type=int, default=None)
    p.add_argument('--H', type=int, default=64)
    p.add_argument('--W', type=int, default=64)
    p.add_argument('--n', type=int, default=200)
    args = p.parse_args()
    co = args.co if args.co is not None else args.cm

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dnncancerannotator_tpu.ops.pallas import flatchain

    rng = np.random.default_rng(0)
    B, ci, cm, H, W = args.B, args.ci, args.cm, args.H, args.W
    x = jnp.asarray(rng.standard_normal((B, ci, H, W)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, ci, cm)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, co)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    def xla_chain(x, w1, b1, w2, b2):
        y = lax.conv_general_dilated(
            x, w1, (1, 1), 'SAME', dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        y = jnp.maximum(y + b1.reshape(1, -1, 1, 1), 0)
        y = lax.conv_general_dilated(
            y, w2, (1, 1), 'SAME', dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        return jnp.maximum(y + b2.reshape(1, -1, 1, 1), 0)

    def flat_chain(x, w1, b1, w2, b2):
        return flatchain.conv_chain_flat_nchw(x, w1, b1, w2, b2, False)

    from dnncancerannotator_tpu.models import fastconv

    def stencil_chain(x, w1, b1, w2, b2):
        pads = ((1, 1), (1, 1))
        return fastconv.conv_chain_nchw(x, w1, b1, w2, b2, pads)

    def bench(tag, fn, grad):
        if grad:
            f = jax.jit(jax.grad(
                lambda *a: jnp.sum(fn(*a) ** 2), argnums=(0, 1, 2, 3, 4)))
            sync = lambda r: float(r[0][0, 0, 0, 0])
        else:
            f = jax.jit(fn)
            sync = lambda r: float(r[0, 0, 0, 0])
        r = f(x, w1, b1, w2, b2)
        sync(r)
        # differential timing: n and 3n reps cancel fixed dispatch cost
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = f(x, w1, b1, w2, b2)
            sync(r)
            return time.perf_counter() - t0
        n = args.n
        t1 = min(run(n) for _ in range(3))
        t3 = min(run(3 * n) for _ in range(3))
        us = (t3 - t1) / (2 * n) * 1e6
        print(f'  {tag:28s} {us:9.1f} us/iter')
        return us

    strat = 'im2col' if flatchain._im2col() else 'nine-dot'
    print(f'[B={B} ci={ci} cm={cm} co={co} {H}x{W}] strategy={strat} '
          f'backend={jax.default_backend()}')
    a = bench('XLA chain fwd', xla_chain, False)
    b = bench('flat chain fwd', flat_chain, False)
    c = bench('XLA chain fwd+bwd', xla_chain, True)
    d = bench('flat chain fwd+bwd', flat_chain, True)
    print(f'  speedup fwd {a / b:5.2f}x   fwd+bwd {c / d:5.2f}x')
    if fastconv.chain_pallas_ok((B, ci, H, W), 3, co, ((1, 1), (1, 1))) \
            and cm == co:
        e = bench('stencil chain fwd', stencil_chain, False)
        f_ = bench('stencil chain fwd+bwd', stencil_chain, True)
        print(f'  flat-vs-stencil fwd {e / b:5.2f}x   fwd+bwd {f_ / d:5.2f}x')


if __name__ == '__main__':
    main()
