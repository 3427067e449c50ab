'''Parity tests for the fused encoder-level kernel (ops/pallas/enclevel.py)
against the composed reference path: two SAME 3x3 conv+bias+relu -> 2x2
maxpool (reference components.py:16-81 semantics, ops/pooling.py pool).'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax


def _compose_reference(x, w1, b1, w2, b2):
    '''NCHW reference: chain -> (skip, pairwise-max 2x2 pool).'''
    dn = ('NCHW', 'HWIO', 'NCHW')

    def conv(v, w, b):
        return lax.conv_general_dilated(
            v, w, (1, 1), 'SAME', dimension_numbers=dn) \
            + b[None, :, None, None]

    c1 = jnp.maximum(conv(x, w1, b1), 0.0)
    skip = jnp.maximum(conv(c1, w2, b2), 0.0)
    # the exact pool formulation of ops/pooling.py (rows first, then cols)
    m = jnp.maximum(skip[:, :, 0::2, :], skip[:, :, 1::2, :])
    pooled = jnp.maximum(m[:, :, :, 0::2], m[:, :, :, 1::2])
    return skip, pooled


def _make_case(seed=0, b=2, ci=6, f=3, h=32, w=256):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, ci, h, w) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, ci, f) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, f, f) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_enclevel_forward_parity():
    from dnncancerannotator_tpu.ops.pallas import enclevel
    args = _make_case()
    want_skip, want_pool = _compose_reference(*args)
    got_skip, got_pool = enclevel.enc_level_nchw(*args, True, True)
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(want_skip),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize('input_grad', [True, False])
def test_enclevel_grad_parity(input_grad):
    from dnncancerannotator_tpu.ops.pallas import enclevel
    args = _make_case(seed=1, b=1, h=16, w=256)

    # both outputs contribute (the skip feeds the decoder, the pooled the
    # next level); relu zeros make exact pool ties common, exercising the
    # 50/50 tie split
    def loss_ref(*a):
        skip, pooled = _compose_reference(*a)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    def loss_fused(*a):
        skip, pooled = enclevel.enc_level_nchw(*a, input_grad, True)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    argnums = tuple(range(5)) if input_grad else tuple(range(1, 5))
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_fused = jax.grad(loss_fused, argnums=argnums)(*args)
    names = ('dx ' if input_grad else '') + 'dw1 db1 dw2 db2'
    for a, b, name in zip(g_ref, g_fused, names.split()):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-4,
            err_msg=name)


def test_enclevel_in_model_parity(monkeypatch):
    '''Downsample routes through the fused encoder level when gated on, with
    the exact param tree of the unfused path (init unfused, apply fused).'''
    from dnncancerannotator_tpu.models import blocks
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 16, 256) * 0.5, jnp.float32)
    mod = blocks.Downsample(filters=3, rate=2, kernel_size=3, conv_stride=1,
                            bn=False, padding='SAME', data_format='NCHW')
    monkeypatch.delenv('DNNCA_ENCLEVEL', raising=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    base_skip, base_pool = mod.apply(params, x)
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    monkeypatch.setenv('DNNCA_ENCLEVEL', '1')
    fused_skip, fused_pool = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused_skip), np.asarray(base_skip),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_pool), np.asarray(base_pool),
                               atol=2e-5, rtol=1e-5)

    def loss(fn_params, enable):
        if enable:
            monkeypatch.setenv('DNNCA_ENCLEVEL', '1')
        else:
            monkeypatch.delenv('DNNCA_ENCLEVEL', raising=False)
        skip, pooled = mod.apply(fn_params, x)
        return jnp.sum(skip ** 2) + jnp.sum(pooled ** 3)

    g_base = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert len(flat_b) == 4
    for path, vb in flat_b:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(vb), atol=3e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))
