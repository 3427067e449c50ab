'''Fused augmentation chain (crop+flip+contrast+warp in one Pallas resample)
vs the composed per-op chain: identical draws, identical semantics.

The fused path (data/augment.py:_apply_fused_chain) replicates the composed
ops' PRNG key threading, so for the same key both paths realize the same
crop offsets / flips / contrast factors / control points. At
``flow_grid_stride=1`` the realized flow matches bit-near-exactly; at the
production stride 4 the two coarse grids differ by the per-image crop shift
(both within the documented sub-0.15 px interpolation bound of the exact
spline).

Reference chain semantics: annotator/data.py:538-763.
'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.data import augment
from dnncancerannotator_tpu.ops import gates


def _methods(stride):
    return augment.parse_augment_options(
        {'random_crop': None, 'random_flip': None, 'random_contrast': None,
         'random_warp': {'flow_grid_stride': stride}},
        slice_types=('TRA', 'ADC', 'label'), output_size=(64, 64))


def _window_batch(b=6, size=76, c=3, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:size, :size]
    imgs = np.zeros((b, size, size, c), np.float32)
    for i in range(b):
        for _ in range(4):
            cy, cx = rng.uniform(10, size - 10, 2)
            imgs[i, ..., rng.integers(0, c)] += np.exp(
                -(((yy - cy) ** 2 + (xx - cx) ** 2) / 60.0)
            ).astype(np.float32)
    return jnp.asarray(np.clip(imgs, 0, 1))


def _run_both(monkeypatch, stride, seed):
    '''Composed (gate off) and fused (gate on, interpret kernel) outputs.'''
    methods = _methods(stride)
    fn = augment.build_augment_fn(methods)
    imgs = _window_batch(seed=seed)
    key = jax.random.PRNGKey(seed)

    monkeypatch.delenv('DNNCA_PALLAS_INTERPRET', raising=False)
    with gates.active(gates.KernelGates(fused_aug=False)):
        composed = np.asarray(fn(imgs, key))
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    with gates.active(gates.KernelGates(fused_aug=True)):
        fused = np.asarray(fn(imgs, key))
    return composed, fused


def test_fused_matches_composed_stride1(monkeypatch):
    '''At stride 1 both paths evaluate the spline at identical points:
    agreement to fp tolerance, across a batch containing flipped and
    unflipped draws.'''
    for seed in (0, 3):
        composed, fused = _run_both(monkeypatch, stride=1, seed=seed)
        assert composed.shape == fused.shape == (6, 64, 64, 3)
        np.testing.assert_allclose(fused, composed, atol=2e-5)


def test_fused_matches_composed_production_stride(monkeypatch):
    '''At the production stride 4 the coarse flow grids differ by the crop
    shift; both approximate the exact spline within ~0.15 px, so outputs
    agree within the interpolation bound for smooth content.'''
    composed, fused = _run_both(monkeypatch, stride=4, seed=1)
    err = np.abs(composed - fused)
    assert err.mean() < 5e-3
    # pointwise: flow-grid shift can move a sample ~0.3 px, so the worst
    # pixel differs by ~0.3 * |image gradient| — bounded, not fp-tight
    assert err.max() < 0.25
    assert np.quantile(err, 0.999) < 0.1


def test_fused_batch_realizes_flips(monkeypatch):
    '''Sanity: the parity batch actually exercises both flip branches (a
    batch of 6 with p=0.5 flips; keys chosen so both outcomes occur).'''
    methods = _methods(4)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    flips = jax.vmap(lambda k: jax.random.bernoulli(k))(
        jax.random.split(keys[1], 6))
    flips = np.asarray(flips)
    assert flips.any() and not flips.all()


def test_window_mean_exact():
    '''The prefix-sum crop-window mean equals jnp.mean over the slice.'''
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((4, 40, 44, 3)).astype(np.float32))
    off = jnp.asarray([[0, 0], [8, 12], [3, 5], [8, 0]], jnp.int32)
    got = np.asarray(augment._window_mean(imgs, off, 32, 32))
    for i in range(4):
        oy, ox = int(off[i, 0]), int(off[i, 1])
        want = np.asarray(imgs[i, oy:oy + 32, ox:ox + 32]).mean(axis=(0, 1))
        np.testing.assert_allclose(got[i], want, rtol=2e-5)


def test_gate_off_uses_composed_path(monkeypatch):
    '''With the gate off (the default) the chain is the composed one even
    when the pattern matches — outputs are deterministic per key either
    way, so just pin the default routing.'''
    monkeypatch.delenv('DNNCA_FUSEDAUG', raising=False)
    monkeypatch.delenv('DNNCA_PALLAS_INTERPRET', raising=False)
    assert not gates.enabled('fused_aug')


def test_non_matching_chain_falls_back(monkeypatch):
    '''A chain that is not the exact production pattern (no flip) must run
    the composed path under the fused gate without error.'''
    methods = augment.parse_augment_options(
        {'random_crop': None, 'random_warp': {'flow_grid_stride': 1}},
        slice_types=('TRA', 'ADC', 'label'), output_size=(64, 64))
    assert not augment._fused_chain_eligible(methods)
    fn = augment.build_augment_fn(methods)
    imgs = _window_batch()
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    with gates.active(gates.KernelGates(fused_aug=True)):
        out = fn(imgs, jax.random.PRNGKey(0))
    assert out.shape == (6, 64, 64, 3)
