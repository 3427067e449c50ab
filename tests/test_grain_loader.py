'''grain-based host input option (data_options.train.loader: grain).'''

import numpy as np
import pytest

from tests import util_synth

pytest.importorskip('grain')


def _ds(tmp_path, **kw):
    from dnncancerannotator_tpu.data import pipeline
    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    return pipeline.train_ds(
        [cancer, healthy], batch_size=4, buffer_size=8,
        slice_types=('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'),
        output_size=(32, 32), base_size=64,
        augment_options={'random_crop': None, 'random_flip': None},
        loader='grain', **kw)


def test_grain_batches_shape_and_dtype(tmp_path):
    ds = _ds(tmp_path)
    assert ds.load_resident() is None  # grain forces the streaming path
    it = ds.raw_batches(seed=0)
    batches = [next(it) for _ in range(5)]
    for b in batches:
        assert b.shape == ds.element_shape, (b.shape, ds.element_shape)
        assert b.dtype == np.uint8
        assert b.flags['C_CONTIGUOUS']
    # shuffled: consecutive batches differ
    assert not np.array_equal(batches[0], batches[1])


def test_grain_normalize_exams_warns_about_sampling_fork(tmp_path, caplog):
    '''The grain loader approximates normalize_exams (per-epoch index
    equalization, not with-replacement sampling like the native path /
    reference data.py:515-525); that semantic fork must be disclosed loudly
    at runtime, not just in a docstring.'''
    import logging
    ds = _ds(tmp_path, normalize_exams=True)
    with caplog.at_level(logging.WARNING):
        next(ds.raw_batches(seed=0))
    assert any('normalize_exams' in rec.getMessage() for rec in caplog.records)


def test_grain_epoch_boundary_without_repeat(tmp_path):
    ds = _ds(tmp_path, repeat=False, normalize_exams=False)
    n = sum(1 for _ in ds.raw_batches(seed=0))
    # 12 slices, batch 4, drop_remainder -> 3 batches
    assert n == 3


def test_grain_trains_end_to_end(tmp_path):
    from dnncancerannotator_tpu import engine as engine_lib
    ds = _ds(tmp_path)
    eng = engine_lib.Engine({
        'model': 'UNetAnnotator',
        'model_options': {
            'n_filters_first': 2, 'n_downsample': 2, 'rate': 2,
            'kernel_size': 3, 'conv_stride': 1, 'bn': False,
            'padding': 'same'},
        'deploy_options': {
            'optimizer': 'adam',
            'loss': {'class_name': 'WeightedCrossentropy',
                     'config': {'weight_mul': 3.0}},
            'enable_multigpu': False},
    })
    eng.build(ds.feature_shape)
    results = eng.train(ds, max_steps=3, save_freq=10, save_path=None)
    assert len(results.epoch) == 3
    assert np.isfinite(results.history['loss']).all()
