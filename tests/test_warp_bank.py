'''Warp-bank augmentation path (gate ``warp_bank``, default OFF).

The bank replaces random_warp's per-step TPS solve with a one-time
precompute: coarse two-pass flow fields solved at engine start, gathered
per step with random mirror symmetries (data/augment.py:build_warp_bank).
These tests pin:

- the refactored coarse-flow + resample tail realizes exactly what
  ``sparse_image_warp(method='two_pass')`` realizes (the bank path and the
  composed path share every numeric stage except where the flow came from);
- the banked op only ever applies one of the 4 mirror transforms of a bank
  field;
- the Engine wires the gate end-to-end (bank built once, train step runs).

Reference warp semantics: annotator/data.py:628-644, :718-763 (fresh warp
per sample — the bank is a documented distribution approximation, which is
why the gate defaults off).
'''

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dnncancerannotator_tpu.data import augment
from dnncancerannotator_tpu.ops import gates
from dnncancerannotator_tpu.ops import warp as W


def _smooth_batch(b=4, size=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:size, :size]
    imgs = np.zeros((b, size, size, c), np.float32)
    for i in range(b):
        for _ in range(4):
            cy, cx = rng.uniform(8, size - 8, 2)
            imgs[i, ..., rng.integers(0, c)] += np.exp(
                -(((yy - cy) ** 2 + (xx - cx) ** 2) / 60.0)
            ).astype(np.float32)
    return jnp.asarray(np.clip(imgs, 0, 1))


def test_coarse_flow_tail_matches_sparse_warp():
    '''coarse_twopass_flow + warp_with_coarse_flow must realize exactly the
    sparse_image_warp(method='two_pass', clamp_flow=True) result — same
    control points, same math, only factored so the flow can be banked.'''
    rng = np.random.default_rng(3)
    b, size, md = 3, 64, 8
    pts = jnp.asarray(rng.uniform(0, size, (b, 100, 2)).astype(np.float32))
    diff = jnp.asarray(
        np.clip(rng.normal(0, 2.0, (b, 100, 2)), -5, 5).astype(np.float32))
    img = _smooth_batch(b=b, size=size)
    direct = W.sparse_image_warp(
        img, pts, pts + diff, method='two_pass', max_displacement=md,
        clamp_flow=True, flow_grid_stride=4)
    flow = W.coarse_twopass_flow(
        pts, pts + diff, (size, size), max_displacement=md,
        flow_grid_stride=4)
    banked = W.warp_with_coarse_flow(
        img, flow, max_displacement=md, flow_grid_stride=4)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(banked), atol=1e-5)


def test_bank_build_shapes_and_determinism():
    key = jax.random.PRNGKey(11)
    bank = augment.build_warp_bank(key, 12, (64, 64), chunk=4)
    hc = -(-63 // 4) + 1
    assert bank['flows'].shape == (12, hc, hc, 2)
    assert bank['out_size'] == (64, 64)
    assert bank['max_displacement'] == 8  # ceil(5) + 3
    assert np.isfinite(np.asarray(bank['flows'])).all()
    # clamp honored at the coarse grid
    assert np.abs(np.asarray(bank['flows'][..., 1])).max() <= 8.0 + 1e-5
    # deterministic in the key; distinct fields across the bank
    bank2 = augment.build_warp_bank(key, 12, (64, 64), chunk=4)
    np.testing.assert_array_equal(
        np.asarray(bank['flows']), np.asarray(bank2['flows']))
    f = np.asarray(bank['flows'])
    assert np.abs(f[0] - f[1]).max() > 1e-3


def test_banked_warp_applies_a_bank_field_symmetry():
    '''With a single-field bank, every banked output must equal the warp at
    one of the 4 mirror transforms of that field — nothing else.'''
    bank = augment.build_warp_bank(jax.random.PRNGKey(5), 1, (64, 64))
    img = _smooth_batch(b=5, size=64)
    out = np.asarray(augment.random_warp_batch_banked(
        img, jax.random.PRNGKey(123), bank))

    fl = bank['flows']  # [1, hc, wc, 2]
    ud = jnp.stack([-fl[:, ::-1, :, 0], fl[:, ::-1, :, 1]], axis=-1)
    variants = [fl, ud]
    variants += [jnp.stack([v[:, :, ::-1, 0], -v[:, :, ::-1, 1]], axis=-1)
                 for v in list(variants)]
    expected = [np.asarray(W.warp_with_coarse_flow(
        img, jnp.broadcast_to(v, (img.shape[0],) + v.shape[1:]),
        max_displacement=bank['max_displacement'],
        flow_grid_stride=bank['stride'])) for v in variants]
    for i in range(img.shape[0]):
        best = min(np.abs(e[i] - out[i]).max() for e in expected)
        assert best < 1e-5, f'image {i}: nearest symmetry off by {best}'
    # the warp is not a no-op
    assert np.abs(out - np.asarray(img)).max() > 1e-3


def test_augment_chain_uses_bank_only_when_threaded():
    methods = augment.parse_augment_options(
        {'random_crop': None, 'random_flip': None, 'random_contrast': None,
         'random_warp': None},
        slice_types=('TRA', 'ADC', 'label'), output_size=(32, 32))
    imgs = _smooth_batch(b=4, size=44)
    key = jax.random.PRNGKey(0)
    bank = augment.build_warp_bank(jax.random.PRNGKey(1), 4, (32, 32))
    plain = np.asarray(augment.build_augment_fn(methods)(imgs, key))
    banked = np.asarray(
        augment.build_augment_fn(methods, warp_bank=bank)(imgs, key))
    assert plain.shape == banked.shape == (4, 32, 32, 3)
    # same crop/flip/contrast draws, different warp source -> close but
    # not identical fields
    assert np.abs(plain - banked).max() > 1e-4


def test_engine_builds_bank_and_trains():
    '''Gate on via deploy_options: the Engine precomputes the bank once and
    the jitted train step runs on it.'''
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.parallel import mesh as mesh_lib

    config = yaml.safe_load(yaml.safe_dump({
        'model': 'UNetAnnotator',
        'model_options': dict(n_filters_first=2, n_downsample=2, rate=2,
                              kernel_size=3, conv_stride=1, bn=False,
                              padding='same'),
        'deploy_options': {
            'optimizer': 'adam',
            'loss': {'class_name': 'WeightedCrossentropy',
                     'config': {'weight_mul': 3.0}},
            'enable_multigpu': False,
            'warp_bank': True,
            'warp_bank_size': 6,
        },
    }))

    class DS:
        slice_types = ('TRA', 'ADC', 'label')
        augment_methods = augment.parse_augment_options(
            {'random_crop': None, 'random_flip': None,
             'random_contrast': None, 'random_warp': None},
            slice_types=slice_types, output_size=(16, 16))
        feature_shape = (4, 16, 16, 2)

    eng = engine_lib.Engine(config, seed=3)
    eng.build(DS.feature_shape)
    bank = eng._warp_bank(DS())
    assert bank is not None and bank['flows'].shape[0] == 6
    assert eng._warp_bank(DS()) is bank  # cached, built once

    step = eng._make_train_step(DS())
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(2):
        raw = rng.integers(0, 255, (4, 28, 28, 3), np.uint8)
        raw_dev, _ = mesh_lib.shard_batch(eng.mesh, raw)
        eng.state, loss, _, _ = step(eng.state, raw_dev, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses

    # gate off -> no bank
    config['deploy_options']['warp_bank'] = False
    eng2 = engine_lib.Engine(config, seed=3)
    assert eng2._warp_bank(DS()) is None


def test_gate_default_and_opt_out():
    '''Default ON after the round-5 A/B + drift study (WARPBANK_DRIFT.md);
    per-Engine opt-out must win over the default.'''
    with gates.active(gates.KernelGates()):
        assert gates.enabled('warp_bank')
    with gates.active(gates.KernelGates(warp_bank=False)):
        assert not gates.enabled('warp_bank')
