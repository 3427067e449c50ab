'''Real-chip A/B: Pallas fused max-pool(2x2/2) vs the strided-slice
pairwise-max XLA path, fwd and fwd+bwd, at the unet_big pool shapes.'''

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dnncancerannotator_tpu.ops import pooling
    from dnncancerannotator_tpu.ops.pallas import pool_kernel as PK

    rng = np.random.RandomState(0)
    shapes = [(8, 256, 256, 128), (8, 128, 128, 128), (8, 64, 64, 256),
              (8, 32, 32, 512)]

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

    for shape in shapes:
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        g = jnp.asarray(rng.randn(shape[0], shape[1] // 2, shape[2] // 2,
                                  shape[3]), jnp.float32)

        jp_f = jax.jit(lambda x_: PK.max_pool2x2_nhwc(x_, False))
        jx_f = jax.jit(lambda x_: pooling.max_pool2d(x_, 2))
        jp_b = jax.jit(jax.grad(
            lambda x_: jnp.vdot(PK.max_pool2x2_nhwc(x_, False), g)))
        jx_b = jax.jit(jax.grad(
            lambda x_: jnp.vdot(pooling.max_pool2d(x_, 2), g)))

        # numeric sanity on-chip before timing
        np.testing.assert_allclose(np.asarray(jp_f(x)), np.asarray(jx_f(x)),
                                   atol=1e-6)
        tp_f, tx_f = timeit(jp_f, x), timeit(jx_f, x)
        tp_b, tx_b = timeit(jp_b, x), timeit(jx_b, x)
        print(f'{shape}: fwd pallas {tp_f:.3f} ms xla {tx_f:.3f} ms | '
              f'fwd+bwd pallas {tp_b:.3f} ms xla {tx_b:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
