'''Pallas fused ConvTranspose(2x2/2) parity vs lax.conv_transpose.

Runs the kernel through the Pallas interpreter on CPU; the real-chip
timing A/B lives in tools/proto_tconv.py --bench (chip_queue2).
'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.ops.pallas import tconv_kernel as TK
from dnncancerannotator_tpu.models import fastconv as FC


SHAPES = [
    (2, 8, 8, 128, 128),
    (1, 4, 4, 256, 128),
    (2, 8, 16, 128, 256),
]


@pytest.mark.parametrize('shape', SHAPES)
def test_fwd_bwd_parity(shape):
    B, H, W, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, ci), jnp.float32)
    w = jnp.asarray(rng.randn(2, 2, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32)

    def ref(x_, w_, b_):
        return jax.lax.conv_transpose(
            x_, w_, (2, 2), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_

    out = TK.conv_transpose2x2_nhwc(x, w, b, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w, b)),
                               rtol=2e-5, atol=2e-4)

    g = jnp.asarray(rng.randn(*out.shape), jnp.float32)
    grads = jax.grad(
        lambda x_, w_, b_: jnp.vdot(TK.conv_transpose2x2_nhwc(
            x_, w_, b_, True), g), argnums=(0, 1, 2))(x, w, b)
    grads_ref = jax.grad(
        lambda x_, w_, b_: jnp.vdot(ref(x_, w_, b_), g),
        argnums=(0, 1, 2))(x, w, b)
    for got, want, name in zip(grads, grads_ref, 'dx dw db'.split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=5e-4, err_msg=name)


def test_module_gate_parity(monkeypatch):
    '''ConvTranspose2DFast with DNNCA_PTCONV=1 must match the gated-off
    module exactly (same param tree, same output).'''
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 8, 8, 128))
    mod = FC.ConvTranspose2DFast(128, (2, 2), strides=(2, 2), padding='SAME')
    v = mod.init(rng, x)

    monkeypatch.delenv('DNNCA_PTCONV', raising=False)
    ref_out = mod.apply(v, x)
    monkeypatch.setenv('DNNCA_PTCONV', '1')
    pallas_out = mod.apply(v, x)
    assert pallas_out.shape == ref_out.shape == (2, 16, 16, 128)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-4)


def test_gate_rejects_ineligible(monkeypatch):
    monkeypatch.setenv('DNNCA_PTCONV', '1')
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    # non-128-multiple channels, wrong kernel geometry, non-f32
    assert not TK.tconv_pallas_ok((2, 8, 8, 96), (2, 2), (2, 2), 128,
                                  'NHWC', None)
    assert not TK.tconv_pallas_ok((2, 8, 8, 128), (3, 3), (2, 2), 128,
                                  'NHWC', None)
    assert not TK.tconv_pallas_ok((2, 8, 8, 128), (2, 2), (2, 2), 128,
                                  'NHWC', jnp.bfloat16)
    assert not TK.tconv_pallas_ok((2, 8, 8, 128), (2, 2), (2, 2), 128,
                                  'NCHW', None)
    monkeypatch.delenv('DNNCA_PTCONV')
    assert not TK.tconv_pallas_ok((2, 8, 8, 128), (2, 2), (2, 2), 128,
                                  'NHWC', None)
