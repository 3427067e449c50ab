'''Flatland ConvTranspose(2x2/2) NCHW parity vs lax.conv_transpose.

Runs the kernel through the Pallas interpreter on CPU; the in-model
chip A/B lives in tools/bench_flattconv.py.
'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.ops.pallas import flattconv as FT
from dnncancerannotator_tpu.models import fastconv as FC


SHAPES = [
    # (B, Ci, H, W, Co)
    (2, 6, 8, 128, 3),
    (1, 3, 4, 256, 6),
    (2, 12, 16, 128, 12),
    (2, 12, 8, 64, 6),    # r=2 grouping
    (2, 24, 8, 32, 12),   # r=4 grouping
]


@pytest.mark.parametrize('shape', SHAPES)
def test_fwd_bwd_parity(shape):
    B, ci, H, W, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, ci, H, W), jnp.float32)
    w = jnp.asarray(rng.randn(2, 2, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32)

    def ref(x_, w_, b_):
        return jax.lax.conv_transpose(
            x_, w_, (2, 2), 'SAME',
            dimension_numbers=('NCHW', 'HWIO', 'NCHW')) \
            + b_.reshape(1, -1, 1, 1)

    out = FT.conv_transpose2x2_flat_nchw(x, w, b, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w, b)),
                               rtol=2e-5, atol=2e-4)

    g = jnp.asarray(rng.randn(*out.shape), jnp.float32)
    grads = jax.grad(
        lambda x_, w_, b_: jnp.vdot(FT.conv_transpose2x2_flat_nchw(
            x_, w_, b_, True), g), argnums=(0, 1, 2))(x, w, b)
    grads_ref = jax.grad(
        lambda x_, w_, b_: jnp.vdot(ref(x_, w_, b_), g),
        argnums=(0, 1, 2))(x, w, b)
    for got, want, name in zip(grads, grads_ref, 'dx dw db'.split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=5e-4, err_msg=name)


def test_module_gate_parity(monkeypatch):
    '''ConvTranspose2DFast with DNNCA_FLATTCONV=1 must match the
    gated-off module (same param tree, same output).'''
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 6, 8, 128))
    mod = FC.ConvTranspose2DFast(3, (2, 2), strides=(2, 2), padding='SAME',
                                 data_format='NCHW')
    v = mod.init(rng, x)
    monkeypatch.setenv('DNNCA_FLATTCONV', '0')
    ref = mod.apply(v, x)
    monkeypatch.setenv('DNNCA_FLATTCONV', '1')
    got = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
