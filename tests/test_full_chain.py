'''One chained end-to-end run of the full reference CLI contract
(reference annotator/runs/__main__.py:21-28):

    synthetic screenshot collages
      -> extract_all          (collages -> per-sequence PNG trees)
      -> generate_tfrecords   (PNG trees -> cancer/healthy tfrecords)
      -> train --validate     (2 steps, checkpoint every step)
      -> evaluate --export_images --export_csv

Every stage is covered separately elsewhere (tests/test_extract.py,
tests/util_synth.py, tests/test_engine_e2e.py); this test exercises the
*handoffs* — extracted-PNG tree layout -> tfrecords schema -> training ->
export tree — where path/layout mismatches would live.
'''

import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')
pd = pytest.importorskip('pandas')
yaml = pytest.importorskip('yaml')

from tests.test_extract import make_collage

CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': {
        'n_filters_first': 2, 'n_downsample': 2, 'rate': 2, 'kernel_size': 3,
        'conv_stride': 1, 'bn': False, 'padding': 'same',
    },
    'deploy_options': {
        'optimizer': 'adam',
        'enable_multigpu': False,
        'metrics': [
            {'Precision': {'thresholds': 0.8, 'name': 'pixel/precision'}},
        ],
    },
    'data_options': {
        'train': {
            'batch_size': 2, 'buffer_size': 8, 'normalize_exams': True,
            'output_size': [64, 64], 'base_size': 256,
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_crop': None, 'random_flip': None},
        },
        'eval': {
            'batch_size': 2, 'output_size': [64, 64],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
        },
    },
}


def test_extract_to_evaluate_chain(tmp_path):
    from dnncancerannotator_tpu.runs import extract as ex
    from dnncancerannotator_tpu.data import generate_tfrecords
    from dnncancerannotator_tpu.runs.train import train
    from dnncancerannotator_tpu.runs.evaluate import evaluate

    # ---- 1. synthetic clinical screenshot collages
    raw = tmp_path / 'raw'
    n_slices = {'cancer': 2, 'healthy': 2}
    for category, with_label in (('cancer', True), ('healthy', False)):
        exam = raw / category / '1' / '1'
        exam.mkdir(parents=True)
        for s in range(1, n_slices[category] + 1):
            cv2.imwrite(str(exam / f'{s:02d}.png'),
                        make_collage(with_label=with_label, seed=s))

    # ---- 2. extract_all: collages -> per-sequence PNG trees (in place)
    ex.extract_all(str(raw), num_workers=0)
    for t in ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'):
        assert (raw / 'cancer' / '1' / '1' / t / '01.png').exists()
    assert not (raw / 'healthy' / '1' / '1' / 'label').exists()

    # ---- 3. generate_tfrecords on the extracted tree
    cancer = str(tmp_path / 'cancer.tfrecords')
    healthy = str(tmp_path / 'healthy.tfrecords')
    n_c = generate_tfrecords(str(raw), cancer, category='cancer',
                             output_size=(256, 256))
    n_h = generate_tfrecords(str(raw), healthy, category='healthy',
                             output_size=(256, 256))
    assert os.path.getsize(cancer) > 0 and os.path.getsize(healthy) > 0

    # ---- 4. train --validate (2 steps, ckpt every step)
    config_path = str(tmp_path / 'config.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(CONFIG, f)
    save_path = str(tmp_path / 'run')
    results = train(
        config=[config_path], save_path=save_path,
        data_path=[cancer, healthy], max_steps=2, save_freq=1,
        validate=True, val_data_path=[cancer, healthy])
    assert results.epoch == [1, 2]
    assert np.isfinite(results.history['loss']).all()
    assert np.isfinite(results.history['val_loss']).all()
    assert sorted(os.listdir(os.path.join(save_path, 'checkpoints'))) == \
        ['ckpt-1', 'ckpt-2']

    # options.yaml round-trip: dumped by train, reloadable, and the stack
    # result matches what we trained with
    opts_path = os.path.join(save_path, 'options.yaml')
    assert os.path.exists(opts_path)
    with open(opts_path) as f:
        opts = yaml.safe_load(f)
    assert opts['config']['model'] == 'UNetAnnotator'
    assert opts['config']['model_options']['n_filters_first'] == 2
    assert opts['data_path'] == [cancer, healthy]

    # ---- 5. evaluate --export_images --export_csv (reloads options.yaml)
    rows = evaluate(
        save_path=save_path, data_path=[cancer], tag='chain',
        export_csv=True, export_images=True, export_casewise_metrics=True)
    assert sorted(rows) == [1, 2]

    out_dir = os.path.join(save_path, 'tfevents', 'chain')
    frame = pd.read_csv(os.path.join(out_dir, 'results.csv'))
    assert list(frame['step']) == [1, 2]
    assert {'loss', 'pixel/precision'} <= set(frame.columns)
    assert np.isfinite(frame['loss']).all()

    casewise = pd.read_csv(os.path.join(out_dir, 'casewise_results.csv'))
    # every cancer slice x every checkpoint
    assert len(casewise) == n_slices['cancer'] * 2

    # PNG export tree mirrors the dataset layout (category/pid/eid/slice)
    images_root = os.path.join(out_dir, 'images')
    pngs = sorted(
        os.path.relpath(os.path.join(d, p), images_root)
        for d, _, files in os.walk(images_root) for p in files)
    assert len(pngs) == n_slices['cancer'] * 2
    assert all('cancer' in p and p.endswith('.png') for p in pngs)

    # tfevents written for TensorBoard
    assert [f for f in os.listdir(out_dir) if f.startswith('events')]
