'''Serving export: jax.export artifact round-trip (runs/export.py).

The artifact must bake the trained weights in (no framework imports at
load time), accept any batch size (symbolic batch dim), and reproduce the
live engine's forward probabilities.
'''

import os

import numpy as np
import pytest
import yaml

from tests import util_synth

CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': {
        'n_filters_first': 2, 'n_downsample': 2, 'rate': 2, 'kernel_size': 3,
        'conv_stride': 1, 'bn': False, 'padding': 'same',
    },
    'deploy_options': {
        'optimizer': 'adam',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': False,
    },
    'data_options': {
        'train': {
            'batch_size': 4, 'buffer_size': 16, 'normalize_exams': True,
            'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_flip': None},
            'base_size': 64,
        },
        'eval': {
            'batch_size': 4, 'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
        },
    },
}


@pytest.fixture(scope='module')
def trained_run(tmp_path_factory):
    from dnncancerannotator_tpu.runs.train import train
    tmp = tmp_path_factory.mktemp('export_run')
    cancer, healthy = util_synth.make_tfrecords(str(tmp), size=64)
    config_path = str(tmp / 'cfg.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(CONFIG, f)
    save_path = str(tmp / 'run')
    train(config=[config_path], save_path=save_path,
          data_path=[cancer, healthy], max_steps=3, save_freq=2,
          validate=False)
    return save_path


def test_export_roundtrip_matches_live_engine(trained_run, tmp_path):
    import jax
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.runs.export import export_model, load_exported
    from dnncancerannotator_tpu.utils import config as config_lib

    out = str(tmp_path / 'artifact' / 'model')
    shlo = export_model(save_path=trained_run, output_path=out)
    assert os.path.exists(shlo) and os.path.exists(f'{out}.yaml')
    meta = yaml.safe_load(open(f'{out}.yaml'))
    assert meta['input']['dtype'] == 'uint8'
    assert meta['input']['shape'] == [-1, 32, 32, 5]

    fn = load_exported(shlo)
    x = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 5), np.uint8)
    probs = np.asarray(fn(x))
    assert probs.shape == (2, 32, 32, 1)
    assert np.isfinite(probs).all() and (probs >= 0).all() and \
        (probs <= 1).all()

    # symbolic batch: same artifact serves another batch size
    assert np.asarray(fn(np.repeat(x, 3, axis=0))).shape == (6, 32, 32, 1)

    # parity vs the live engine forward on identical inputs. The artifact
    # is by design a pure-XLA graph (no Pallas kernels — it must lower for
    # every target platform), so the live reference is computed under the
    # same gates.pure_xla() regime; Pallas-vs-XLA numeric deltas are
    # covered by the per-kernel parity suites, not here.
    from dnncancerannotator_tpu.ops import gates
    cfg = config_lib.load_config(
        os.path.join(trained_run, 'options.yaml'))['config']
    eng = engine_lib.Engine(cfg)
    eng.build((2, 32, 32, 5))
    ckpts = eng.get_ckpts(os.path.join(trained_run, 'checkpoints'))
    eng.load(ckpts[max(ckpts)])
    with gates.pure_xla():
        ref = np.asarray(jax.nn.sigmoid(jax.jit(
            lambda v: eng.model.apply(
                {'params': eng.state['params']}, v, training=False,
                return_logits=True))(x.astype(np.float32) / 255.0)))
    np.testing.assert_allclose(probs, ref, atol=1e-5)


def test_export_fixed_batch_rejects_other_sizes(trained_run, tmp_path):
    from dnncancerannotator_tpu.runs.export import export_model, load_exported

    out = str(tmp_path / 'fixed' / 'model')
    fn = load_exported(export_model(
        save_path=trained_run, output_path=out, batch_size=2))
    x = np.random.default_rng(1).integers(0, 255, (2, 32, 32, 5), np.uint8)
    assert np.asarray(fn(x)).shape == (2, 32, 32, 1)
    with pytest.raises(ValueError):
        fn(np.repeat(x, 2, axis=0))


def test_serve_http_endpoint(trained_run, tmp_path):
    '''The serve driver answers /predict with the artifact's output,
    /healthz + /spec with metadata, and clean 400s on bad input.'''
    import io
    import json
    import threading
    import urllib.request
    import urllib.error
    from dnncancerannotator_tpu.runs.export import export_model, load_exported
    from dnncancerannotator_tpu.runs.serve import make_server

    out = str(tmp_path / 'srv' / 'model')
    shlo = export_model(save_path=trained_run, output_path=out)
    server = make_server(shlo, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = 'http://127.0.0.1:%d' % server.server_address[1]
    try:
        assert urllib.request.urlopen(f'{base}/healthz').read() == b'ok'
        spec = json.loads(urllib.request.urlopen(f'{base}/spec').read())
        assert spec['input']['shape'] == [-1, 32, 32, 5]

        x = np.random.default_rng(2).integers(
            0, 255, (3, 32, 32, 5), np.uint8)
        buf = io.BytesIO()
        np.save(buf, x)
        resp = urllib.request.urlopen(f'{base}/predict', buf.getvalue())
        probs = np.load(io.BytesIO(resp.read()))
        assert probs.shape == (3, 32, 32, 1)
        np.testing.assert_allclose(
            probs, np.asarray(load_exported(shlo)(x)), atol=1e-6)

        # wrong dtype -> 400 with a JSON error body
        buf = io.BytesIO()
        np.save(buf, x.astype(np.float32))
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f'{base}/predict', buf.getvalue())
        assert err.value.code == 400
        assert 'uint8' in json.loads(err.value.read())['error']

        # wrong spatial shape -> 400
        buf = io.BytesIO()
        np.save(buf, x[:, :16])
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f'{base}/predict', buf.getvalue())
        assert err.value.code == 400

        # garbage body -> 400
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f'{base}/predict', b'not an npy')
        assert err.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_serve_fixed_batch_pads(trained_run, tmp_path):
    '''A fixed-batch artifact transparently serves smaller batches
    (request padded, response sliced).'''
    import io
    import threading
    import urllib.request
    import urllib.error
    from dnncancerannotator_tpu.runs.export import export_model
    from dnncancerannotator_tpu.runs.serve import make_server

    out = str(tmp_path / 'srvfix' / 'model')
    shlo = export_model(save_path=trained_run, output_path=out, batch_size=4)
    server = make_server(shlo, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = 'http://127.0.0.1:%d' % server.server_address[1]
    try:
        x = np.random.default_rng(3).integers(
            0, 255, (2, 32, 32, 5), np.uint8)
        buf = io.BytesIO()
        np.save(buf, x)
        resp = urllib.request.urlopen(f'{base}/predict', buf.getvalue())
        probs = np.load(io.BytesIO(resp.read()))
        assert probs.shape == (2, 32, 32, 1)

        # over the fixed batch -> 400
        buf = io.BytesIO()
        np.save(buf, np.repeat(x, 3, axis=0))
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f'{base}/predict', buf.getvalue())
        assert err.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)
