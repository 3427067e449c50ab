'''Parity tests for the fused decoder-level kernel (ops/pallas/declevel.py)
against the composed reference path: lax.conv_transpose -> concat -> two
SAME 3x3 conv+bias+relu (reference components.py:84-166 semantics).'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax


def _compose_reference(x, skip, wt, bt, w1, b1, w2, b2):
    '''NCHW reference: tconv(k=2,s=2) + bias -> concat(up, skip) -> chain.'''
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


def _make_case(seed=0, b=2, cb=6, cs=3, f=3, hh=16, ww=128):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, cb, hh, ww) * 0.5, jnp.float32)
    skip = jnp.asarray(rng.randn(b, cs, 2 * hh, 2 * ww) * 0.5, jnp.float32)
    wt = jnp.asarray(rng.randn(2, 2, cb, f) * 0.3, jnp.float32)
    bt = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, f + cs, f) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, f, f) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    return x, skip, wt, bt, w1, b1, w2, b2


def test_phase_split_merge_roundtrip():
    from dnncancerannotator_tpu.ops.pallas import declevel
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 8, 16), jnp.float32)
    sp = declevel.phase_split(x)
    assert sp.shape == (2, 12, 4, 8)
    # plane (p*2+q)*C + c == x[:, c, p::2, q::2]
    np.testing.assert_array_equal(
        np.asarray(sp[:, 1 * 3 + 2]), np.asarray(x[:, 2, 0::2, 1::2]))
    np.testing.assert_array_equal(
        np.asarray(declevel.phase_merge(sp)), np.asarray(x))


def test_declevel_forward_parity():
    from dnncancerannotator_tpu.ops.pallas import declevel
    args = _make_case()
    want = _compose_reference(*args)
    got = declevel.dec_level_nchw(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_declevel_grad_parity():
    from dnncancerannotator_tpu.ops.pallas import declevel
    args = _make_case(seed=1, b=1, hh=8, ww=128)

    def loss_ref(*a):
        return jnp.sum(_compose_reference(*a) ** 2)

    def loss_fused(*a):
        return jnp.sum(declevel.dec_level_nchw(*a, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    names = 'dx dskip dwt dbt dw1 db1 dw2 db2'.split()
    for a, b, name in zip(g_ref, g_fused, names):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-4,
            err_msg=name)


def test_declevel_in_model_parity(monkeypatch):
    '''Upsample routes through the fused decoder level when gated on, with
    the exact param tree of the unfused path (init unfused, apply fused).'''
    from dnncancerannotator_tpu.models import blocks
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 8, 128) * 0.5, jnp.float32)
    skip = jnp.asarray(rng.randn(1, 3, 16, 256) * 0.5, jnp.float32)
    mod = blocks.Upsample(filters=3, rate=2, kernel_size=3, conv_stride=1,
                          bn=False, padding='SAME', data_format='NCHW')
    monkeypatch.delenv('DNNCA_DECLEVEL', raising=False)
    params = mod.init(jax.random.PRNGKey(0), x, skip)
    base = mod.apply(params, x, skip)
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    monkeypatch.setenv('DNNCA_DECLEVEL', '1')
    fused = mod.apply(params, x, skip)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=2e-5, rtol=1e-5)

    def loss(fn_params, enable):
        if enable:
            monkeypatch.setenv('DNNCA_DECLEVEL', '1')
        else:
            monkeypatch.delenv('DNNCA_DECLEVEL', raising=False)
        return jnp.sum(mod.apply(fn_params, x, skip) ** 2)

    g_base = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert len(flat_b) == 6
    for path, vb in flat_b:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(vb), atol=3e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))
