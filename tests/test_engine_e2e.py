'''End-to-end: train -> auto-resume -> evaluate-every-checkpoint -> predict,
through the run drivers on a synthetic TFRecord dataset.'''

import glob
import os
import pickle

import numpy as np
import pytest
import yaml

from tests import util_synth

TINY_CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': {
        'n_filters_first': 2, 'n_downsample': 2, 'rate': 2, 'kernel_size': 3,
        'conv_stride': 1, 'bn': False, 'padding': 'same',
    },
    'deploy_options': {
        'optimizer': 'adam',
        'LearningRateScheduler':
            'lambda epoch, current_lr: 0.001 * 0.96 ** (epoch // 1000)',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': True,  # exercises the 8-device CPU mesh
        'metrics': [
            {'Precision': {'thresholds': 0.8, 'name': 'pixel/precision'}},
            {'Recall': {'thresholds': 0.8, 'name': 'pixel/recall'}},
        ],
    },
    'data_options': {
        'train': {
            'batch_size': 8, 'buffer_size': 32, 'normalize_exams': True,
            'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_crop': None, 'random_flip': None},
            'base_size': 64,
        },
        'eval': {
            'batch_size': 8, 'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
        },
    },
}


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp('e2e')
    cancer, healthy = util_synth.make_tfrecords(str(tmpdir), size=64)
    config_path = str(tmpdir / 'config.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(TINY_CONFIG, f)
    return dict(tmpdir=str(tmpdir), data=[cancer, healthy],
                config=config_path)


def test_train_host_streaming_multiple_epochs(env, tmp_path):
    '''normalize_exams=False + device_cache=False must train past one epoch
    (the reference repeats the train stream unconditionally,
    data.py:106-110) — regression test for the StopIteration-after-one-epoch
    bug on the host-streaming path.'''
    from dnncancerannotator_tpu.runs.train import train

    with open(env['config']) as f:
        cfg = yaml.safe_load(f)
    train_opts = cfg['data_options']['train']
    train_opts['normalize_exams'] = False
    train_opts['device_cache'] = False
    # also exercise Keras-style dict optimizer resolution (engine.py:276-284
    # parity): momentum-SGD instead of the default adam
    cfg['deploy_options']['optimizer'] = {
        'class_name': 'SGD', 'config': {'learning_rate': 0.01,
                                        'momentum': 0.9}}
    del cfg['deploy_options']['LearningRateScheduler']
    # and the checkify-functionalized step (runtime numeric asserts)
    cfg['deploy_options']['debug_asserts'] = True
    config_path = str(tmp_path / 'cfg.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    # 4 steps x batch 8 = 32 elements > the 12-slice dataset: crosses epochs.
    results = train(
        config=[config_path], save_path=str(tmp_path / 'run'),
        data_path=env['data'], max_steps=4, save_freq=10, validate=False)
    assert results.epoch == [1, 2, 3, 4]


def test_train_resume_evaluate_predict(env):
    from dnncancerannotator_tpu.runs.train import train
    from dnncancerannotator_tpu.runs.evaluate import evaluate
    from dnncancerannotator_tpu.runs.predict import predict

    save_path = os.path.join(env['tmpdir'], 'run')

    # ---- train 4 steps, checkpoint every 2
    results = train(
        config=[env['config']], save_path=save_path, data_path=env['data'],
        max_steps=4, save_freq=2, validate=True, val_data_path=env['data'])
    assert results.epoch == [1, 2, 3, 4]
    assert 'loss' in results.history
    assert 'val_loss' in results.history
    ckpts = sorted(os.listdir(os.path.join(save_path, 'checkpoints')))
    assert ckpts == ['ckpt-2', 'ckpt-4']
    assert os.path.exists(os.path.join(save_path, 'options.yaml'))
    with open(os.path.join(save_path, 'results.pkl'), 'rb') as f:
        dumped = pickle.load(f)
    assert dumped['model'] == 'UNetAnnotator'

    # ---- resume: train to 6 continues from step 4
    results2 = train(
        config=[env['config']], save_path=save_path, data_path=env['data'],
        max_steps=6, save_freq=2, validate=False)
    assert results2.epoch == [5, 6]
    ckpts = sorted(os.listdir(os.path.join(save_path, 'checkpoints')))
    assert 'ckpt-6' in ckpts
    # second options.yaml dump collision-renamed
    assert os.path.exists(os.path.join(save_path, 'options_.yaml'))

    # ---- evaluate all checkpoints with CSV + image export
    evaluate(
        save_path=save_path, data_path=env['data'], tag='testtag',
        export_csv=True, export_images=True, export_casewise_metrics=True)
    import pandas as pd
    out_dir = os.path.join(save_path, 'tfevents', 'testtag')
    frame = pd.read_csv(os.path.join(out_dir, 'results.csv'))
    assert list(frame['step']) == [2, 4, 6]
    assert 'loss' in frame.columns
    assert 'pixel/precision' in frame.columns
    casewise = pd.read_csv(os.path.join(out_dir, 'casewise_results.csv'))
    assert len(casewise) == 12 * 3  # every slice x every checkpoint
    # image export tree exists
    images_root = os.path.join(out_dir, 'images')
    pngs = [p for _, _, files in os.walk(images_root) for p in files]
    assert len(pngs) == 12 * 3
    # tfevents written
    events = [f for f in os.listdir(out_dir) if f.startswith('events')]
    assert events

    # ---- evaluate again without avoid_overwrite -> error
    with pytest.raises(ValueError):
        evaluate(save_path=save_path, data_path=env['data'], tag='testtag',
                 skip_visualization=True)
    # with avoid_overwrite -> tag renamed, min_interval filters ckpt-4
    rows = evaluate(save_path=save_path, data_path=env['data'], tag='testtag',
                    avoid_overwrite=True, skip_visualization=True,
                    min_interval=4)
    assert sorted(rows) == [2, 6]

    # ---- predict with latest checkpoint
    n = predict(save_path=save_path, data_path=env['data'],
                output_path=os.path.join(env['tmpdir'], 'preds'))
    assert n == 12

    # ---- batched prediction with raw probability export: same maps
    import numpy as np
    n = predict(save_path=save_path, data_path=env['data'],
                output_path=os.path.join(env['tmpdir'], 'preds_npy'),
                batch_size=4, output_format='npy')
    assert n == 12
    npys = sorted(glob.glob(
        os.path.join(env['tmpdir'], 'preds_npy', '**', '*.npy'),
        recursive=True))
    pngs = sorted(glob.glob(
        os.path.join(env['tmpdir'], 'preds', '**', '*.png'), recursive=True))
    assert len(npys) == 12
    from PIL import Image
    for npy_path, png_path in zip(npys, pngs):
        probs = np.load(npy_path)
        assert probs.dtype == np.float32 and (probs >= 0).all() \
            and (probs <= 1).all()
        quantized = np.clip(probs * 255.0, 0, 255).astype(np.uint8)
        # batch-4 vs batch-1 forward may differ by float-fusion noise, which
        # can flip values sitting exactly on a quantization bin edge
        np.testing.assert_allclose(
            quantized.astype(np.int32),
            np.asarray(Image.open(png_path)).astype(np.int32), atol=1)

    # ---- 16-bit probability PNGs round-trip at 1/65535 resolution
    n = predict(save_path=save_path, data_path=env['data'],
                output_path=os.path.join(env['tmpdir'], 'preds16'),
                batch_size=4, output_format='png16')
    assert n == 12
    p16 = sorted(glob.glob(
        os.path.join(env['tmpdir'], 'preds16', '**', '*.png'),
        recursive=True))
    arr16 = np.asarray(Image.open(p16[0]))
    assert arr16.dtype == np.int32 or arr16.dtype == np.uint16
    np.testing.assert_allclose(
        arr16 / 65535.0, np.load(npys[0]), atol=1.0 / 65535)




def test_kernel_gates_per_engine_coexist(monkeypatch):
    '''Two Engines with opposing Pallas kernel gates coexist in one
    process: each one's jitted step routes by its own gate set (explicit
    trace-time context, ops/gates.py), the environment is never mutated,
    and an Engine whose config omits a gate gets the default — not a
    previous Engine's setting.'''
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.models import fastconv
    from dnncancerannotator_tpu.ops import gates as gates_lib

    monkeypatch.delenv('DNNCA_FLATCHAIN', raising=False)
    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')

    cfg_on = yaml.safe_load(yaml.safe_dump(TINY_CONFIG))
    cfg_on['deploy_options']['flatchain'] = True
    cfg_on['deploy_options']['enable_multigpu'] = False
    eng_on = engine_lib.Engine(cfg_on, seed=0)

    cfg_off = yaml.safe_load(yaml.safe_dump(TINY_CONFIG))
    cfg_off['deploy_options']['flatchain'] = False
    cfg_off['deploy_options']['enable_multigpu'] = False
    eng_off = engine_lib.Engine(cfg_off, seed=0)

    assert 'DNNCA_FLATCHAIN' not in os.environ

    # a chain shape that is flatchain-eligible when the gate is on
    shape, ks, filters = (1, 6, 64, 64), 3, 12
    routed = []
    for eng in (eng_on, eng_off):
        with gates_lib.active(eng.kernel_gates):
            routed.append(
                fastconv.flat_chain_ok(shape, ks, filters, 'SAME', None))
    assert routed == [True, False]

    # omitting the gate inherits the default (ON), not eng_off's setting
    cfg_default = yaml.safe_load(yaml.safe_dump(TINY_CONFIG))
    cfg_default['deploy_options']['enable_multigpu'] = False
    eng_default = engine_lib.Engine(cfg_default, seed=0)
    with gates_lib.active(eng_default.kernel_gates):
        assert fastconv.flat_chain_ok(shape, ks, filters, 'SAME', None)


def test_prefetcher_close_releases_producer():
    '''Closing a _Prefetcher mid-stream unblocks and terminates the
    producer thread (an eval failure must not leak batches).'''
    import itertools
    import time
    from dnncancerannotator_tpu.engine import _Prefetcher

    pf = _Prefetcher(itertools.count(), lambda x: x, depth=2)
    assert next(pf) == 0
    pf.close()
    deadline = time.time() + 5
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.01)
    assert not pf._thread.is_alive()
    # idempotent
    pf.close()
