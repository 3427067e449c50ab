'''TensorBoard event-writer wire-format tests: files written by our
dependency-free writer must parse with TensorFlow's own event reader.'''

import os

import numpy as np
import pytest

from dnncancerannotator_tpu.utils import tboard

tf = pytest.importorskip('tensorflow')


def _read_events(logdir):
    files = [f for f in os.listdir(logdir) if f.startswith('events')]
    assert len(files) == 1
    events = []
    for raw in tf.data.TFRecordDataset(os.path.join(logdir, files[0])):
        e = tf.compat.v1.Event()
        e.ParseFromString(raw.numpy())
        events.append(e)
    return events


def test_scalars_readable_by_tf(tmp_path):
    w = tboard.SummaryWriter(str(tmp_path))
    w.scalar('loss', 0.5, 1)
    w.scalar('loss', 0.25, 2)
    w.close()
    events = _read_events(str(tmp_path))
    assert events[0].file_version == 'brain.Event:2'
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events for v in e.summary.value]
    assert scalars == [(1, 'loss', 0.5), (2, 'loss', 0.25)]


def test_image_summary_readable(tmp_path):
    w = tboard.SummaryWriter(str(tmp_path))
    img = np.random.default_rng(0).random((16, 24)).astype(np.float32)
    w.image('viz', img, 3)
    w.close()
    events = _read_events(str(tmp_path))
    vals = [v for e in events for v in e.summary.value if v.tag == 'viz']
    assert len(vals) == 1
    assert vals[0].image.height == 16
    assert vals[0].image.width == 24
    decoded = tf.io.decode_png(vals[0].image.encoded_image_string)
    assert decoded.shape == (16, 24, 1)


def test_pr_curve_summary_readable(tmp_path):
    w = tboard.SummaryWriter(str(tmp_path))
    n = 5
    w.pr_curve_raw('val', [5, 4, 3, 2, 1], [3, 2, 1, 0, 0], [0, 1, 2, 3, 3],
                   [0, 1, 2, 3, 4], [0.6, 0.7, 0.8, 1.0, 1.0],
                   [1.0, 0.8, 0.6, 0.4, 0.2], n, 7)
    w.close()
    events = _read_events(str(tmp_path))
    vals = [v for e in events for v in e.summary.value]
    assert len(vals) == 1
    v = vals[0]
    assert v.tag == 'val/pr_curves'
    assert v.metadata.plugin_data.plugin_name == 'pr_curves'
    tensor = tf.io.parse_tensor(v.tensor.SerializeToString(), tf.float32) \
        if False else tf.make_ndarray(v.tensor)
    assert tensor.shape == (6, n)
    np.testing.assert_allclose(tensor[0], [5, 4, 3, 2, 1])
    np.testing.assert_allclose(tensor[5], [1.0, 0.8, 0.6, 0.4, 0.2])
