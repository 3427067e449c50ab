'''Device-resident input path: dataset materialization and the resident
train step (HBM-resident data tensor, on-device batch sampling).'''

import numpy as np
import yaml

from tests import util_synth


CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': dict(n_filters_first=2, n_downsample=2, rate=2,
                          kernel_size=3, conv_stride=1, bn=False,
                          padding='same'),
    'deploy_options': {
        'optimizer': 'adam',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': False,
        'steps_per_call': 4,
    },
    'data_options': {
        'train': {
            'batch_size': 4, 'buffer_size': 16, 'output_size': [32, 32],
            'base_size': 64,
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_crop': None, 'random_flip': None},
        },
        'eval': {'batch_size': 4, 'output_size': [32, 32],
                 'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL',
                                 'label']},
    },
}


def test_load_resident(tmp_path):
    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    from dnncancerannotator_tpu import data as data_lib
    ds = data_lib.train_ds([cancer, healthy],
                           **CONFIG['data_options']['train'])
    res = ds.load_resident()
    assert res is not None
    # 2 sources x 2 exams x 3 slices, host-cropped to 44 (32 + 2*6 jitter)
    assert res['data'].shape == (12, 44, 44, 6)
    assert res['data'].dtype == np.uint8
    np.testing.assert_array_equal(res['starts'], [0, 6])
    np.testing.assert_array_equal(res['counts'], [6, 6])
    assert res['balanced']
    # over-budget and disabled cases fall back
    assert ds.load_resident(budget_bytes=100) is None
    ds2 = data_lib.train_ds([cancer], device_cache=False,
                            **CONFIG['data_options']['train'])
    assert ds2.load_resident() is None


def test_resident_training_runs(tmp_path):
    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu import data as data_lib
    cfg = yaml.safe_load(yaml.safe_dump(CONFIG))
    ds = data_lib.train_ds([cancer, healthy],
                           **cfg['data_options']['train'])
    eng = engine_lib.Engine(cfg, seed=3)
    results = eng.train(ds, max_steps=8, save_freq=4, auto_resume=False)
    assert results.epoch == list(range(1, 9))
    losses = results.history['loss']
    assert len(losses) == 8
    assert all(np.isfinite(v) for v in losses)


def test_load_resident_skips_empty_source(tmp_path):
    '''A zero-slice source (e.g. an empty .tfrecords) must not appear in
    starts/counts: the balanced sampler's idx = starts[f] + u*counts[f]
    would clamp counts[f]=0 to a slice of the PREVIOUS source.'''
    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    empty = str(tmp_path / 'empty.tfrecords')
    open(empty, 'wb').close()
    from dnncancerannotator_tpu import data as data_lib
    ds = data_lib.train_ds([cancer, empty, healthy],
                           **CONFIG['data_options']['train'])
    res = ds.load_resident()
    assert res is not None
    np.testing.assert_array_equal(res['starts'], [0, 6])
    np.testing.assert_array_equal(res['counts'], [6, 6])
