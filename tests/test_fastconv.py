'''Fast-conv parity: the small-channel stencil paths must match the plain
flax conv modules bit-for-bit (same parameter trees).'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dnncancerannotator_tpu.models import fastconv as FC


@pytest.mark.parametrize('padding', ['SAME', 'VALID'])
@pytest.mark.parametrize('stride', [(1, 1), (2, 2)])
def test_conv_parity(padding, stride):
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 17, 19, 5))
    ref = nn.Conv(3, (3, 3), strides=stride, padding=padding)
    v = ref.init(rng, x)
    fast = FC.Conv2DFast(3, (3, 3), strides=stride, padding=padding)
    np.testing.assert_allclose(
        np.asarray(fast.apply(v, x)), np.asarray(ref.apply(v, x)), atol=1e-5)


@pytest.mark.parametrize('rate', [2, 3])
def test_conv_transpose_parity(rate):
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 9, 11, 4))
    ref = nn.ConvTranspose(3, (rate, rate), strides=(rate, rate),
                           padding='SAME')
    v = ref.init(rng, x)
    fast = FC.ConvTranspose2DFast(3, (rate, rate), strides=(rate, rate),
                                  padding='SAME')
    out_f = fast.apply(v, x)
    out_r = ref.apply(v, x)
    assert out_f.shape == out_r.shape == (2, 9 * rate, 11 * rate, 3)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=1e-5)


def test_large_channel_fallback_parity():
    '''Above the small-channel limit the module must use the XLA conv.'''
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (1, 9, 9, 40))
    ref = nn.Conv(48, (3, 3), padding='SAME')
    v = ref.init(rng, x)
    fast = FC.Conv2DFast(48, (3, 3), padding='SAME')
    np.testing.assert_allclose(
        np.asarray(fast.apply(v, x)), np.asarray(ref.apply(v, x)), atol=1e-4)


def test_grads_match():
    '''Backward through the stencil path equals backward through lax conv.'''
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (2, 12, 12, 3))
    ref = nn.Conv(4, (3, 3), padding='SAME')
    v = ref.init(rng, x)
    fast = FC.Conv2DFast(4, (3, 3), padding='SAME')

    def loss(module, params):
        return jnp.sum(module.apply(params, x) ** 2)

    g_ref = jax.grad(lambda p: loss(ref, p))(v)
    g_fast = jax.grad(lambda p: loss(fast, p))(v)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
        a, b = np.asarray(a), np.asarray(b)
        # Grad magnitudes here are O(100); the two paths reassociate fmas
        # differently, so compare relative to the tensor's own scale.
        np.testing.assert_allclose(a, b, rtol=1e-5,
                                   atol=1e-5 * np.abs(a).max())


@pytest.mark.parametrize('padding', ['SAME', 'VALID'])
def test_input_grads_match(padding):
    '''The custom VJP's input gradient equals lax-conv autodiff (the stencil
    flip/pad identity), for both padding modes.'''
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (2, 13, 15, 4))
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 3)) * 0.3

    def loss_fast(x):
        return jnp.sum(FC.stencil_conv2d(x, w, padding=padding) ** 2)

    def loss_ref(x):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), padding.upper(),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(out ** 2)

    ga = np.asarray(jax.grad(loss_fast)(x))
    gb = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-5 * np.abs(gb).max())


def test_even_kernel_grads_match():
    '''kernel=2 SAME has asymmetric pads (0,1); the VJP pad math must hold.'''
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 10, 10, 3))
    w = jax.random.normal(jax.random.PRNGKey(6), (2, 2, 3, 3)) * 0.3

    def loss_fast(x, w):
        return jnp.sum(FC.stencil_conv2d(x, w, padding='SAME') ** 2)

    def loss_ref(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(out ** 2)

    for argnum in (0, 1):
        ga = np.asarray(jax.grad(loss_fast, argnum)(x, w))
        gb = np.asarray(jax.grad(loss_ref, argnum)(x, w))
        np.testing.assert_allclose(ga, gb, rtol=1e-5,
                                   atol=1e-5 * np.abs(gb).max())


@pytest.mark.parametrize('im2col', ['0', '1'])
def test_flat_chain_kernel_matches_xla(monkeypatch, im2col):
    '''The MXU "flatland" chain kernel (ops/pallas/flatchain.py) must match
    the XLA conv chain forward AND backward (interpret mode), under both
    the nine-dot and the im2col-in-VMEM strategies.'''
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dnncancerannotator_tpu.ops.pallas.flatchain import (
        conv_chain_flat_nchw)

    monkeypatch.setenv('DNNCA_FLATCHAIN_IM2COL', im2col)

    rng = np.random.default_rng(3)
    B, ci, cm, H, W = 4, 6, 12, 32, 32
    x = jnp.asarray(rng.standard_normal((B, ci, H, W)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, ci, cm)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)

    def ref(x, w1, b1, w2, b2):
        y = lax.conv_general_dilated(
            x, w1, (1, 1), 'SAME',
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        y = jnp.maximum(y + b1.reshape(1, -1, 1, 1), 0)
        y = lax.conv_general_dilated(
            y, w2, (1, 1), 'SAME',
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
        return jnp.maximum(y + b2.reshape(1, -1, 1, 1), 0)

    cot = jnp.asarray(rng.standard_normal((B, cm, H, W)), jnp.float32)
    want, ref_vjp = jax.vjp(ref, x, w1, b1, w2, b2)
    got, flat_vjp = jax.vjp(
        lambda *a: conv_chain_flat_nchw(*a, True), x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    for name, a, b in zip(('dx', 'dw1', 'db1', 'dw2', 'db2'),
                          flat_vjp(cot), ref_vjp(cot)):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5,
            err_msg=name)


def test_flat_chain_wired_into_convchain(monkeypatch):
    '''With DNNCA_FLATCHAIN=1 (+interpret), ConvChain must route eligible
    NCHW chains through the flat kernel with an identical param tree and
    matching outputs.'''
    import jax
    import jax.numpy as jnp
    from dnncancerannotator_tpu.models import blocks

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 16)), jnp.float32)
    chain = blocks.ConvChain(filters=12, kernel_size=3, conv_stride=1,
                             bn=False, padding='SAME', data_format='NCHW')
    params = chain.init(jax.random.PRNGKey(0), x)
    base = chain.apply(params, x)

    monkeypatch.setenv('DNNCA_FLATCHAIN', '1')
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    from dnncancerannotator_tpu.models import fastconv
    assert fastconv.flat_chain_ok(x.shape, 3, 12, 'SAME', None), \
        'flat path must be eligible under the test env'
    params2 = chain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    got = chain.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=2e-5)


def test_flatchain_config_option(monkeypatch, tmp_path):
    '''deploy_options.flatchain (configs/additionals/flatchain.yaml) must
    reach the per-Engine gate set that flat_chain_ok reads at trace time;
    the environment is NOT mutated (override-only channel).'''
    import os
    import yaml
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.ops import gates as gates_lib

    monkeypatch.delenv('DNNCA_FLATCHAIN', raising=False)
    cfg = {
        'model': 'UNetAnnotator',
        'model_options': dict(n_filters_first=2, n_downsample=1, rate=2,
                              kernel_size=3, conv_stride=1, bn=False,
                              padding='same'),
        'deploy_options': {'optimizer': 'adam', 'enable_multigpu': False},
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    overlay = yaml.safe_load(
        open(os.path.join(repo, 'configs/additionals/flatchain.yaml')))
    assert overlay == {'deploy_options.flatchain': True}
    cfg['deploy_options']['flatchain'] = True
    eng_on = engine_lib.Engine(yaml.safe_load(yaml.safe_dump(cfg)), seed=0)
    cfg['deploy_options']['flatchain'] = False
    eng_off = engine_lib.Engine(yaml.safe_load(yaml.safe_dump(cfg)), seed=0)
    assert 'DNNCA_FLATCHAIN' not in os.environ
    with gates_lib.active(eng_on.kernel_gates):
        assert gates_lib.enabled('flatchain') is True
    with gates_lib.active(eng_off.kernel_gates):
        assert gates_lib.enabled('flatchain') is False
    # env var remains an override-only A/B channel over the config
    monkeypatch.setenv('DNNCA_FLATCHAIN', '0')
    with gates_lib.active(eng_on.kernel_gates):
        assert gates_lib.enabled('flatchain') is False


def test_chain_need_dx_param_grads(monkeypatch):
    '''input_grad=False (first-layer dx elision) must not change any
    parameter gradient; only dx is zeroed.'''
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    import numpy as np
    from dnncancerannotator_tpu.models import fastconv as FC

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 16, 16), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 5, 3) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 3, 3) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
    pads = ((1, 1), (1, 1))

    def loss(w1_, b1_, w2_, b2_, need_dx):
        return jnp.sum(FC.conv_chain_nchw(x, w1_, b1_, w2_, b2_, pads,
                                          need_dx) ** 2)

    g_with = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
        w1, b1, w2, b2)
    g_without = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(
        w1, b1, w2, b2)
    for a, b, name in zip(g_with, g_without, 'dw1 db1 dw2 db2'.split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
    dx = jax.grad(lambda x_: jnp.sum(FC.conv_chain_nchw(
        x_, w1, b1, w2, b2, pads, False) ** 2))(x)
    assert not np.asarray(dx).any()
