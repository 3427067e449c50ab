'''Visualizer unit tests: grid construction, overlay mode, sensitivity
chart rendering (the full pipeline is covered by the e2e suite).'''

import numpy as np

from dnncancerannotator_tpu.utils.viz import Visualizer


def _viz(tmp_path, **kw):
    class _DummyData:
        slice_types = ('TRA', 'ADC', 'label')
        batch_size = 2
    return Visualizer('t', _DummyData(), 1, str(tmp_path), **kw)


def test_generate_image_grid(tmp_path):
    v = _viz(tmp_path)
    feats = np.random.default_rng(0).random((16, 16, 2)).astype(np.float32)
    label = np.zeros((16, 16), np.float32)
    out = np.zeros((16, 16, 1), np.float32)
    img = v._generate_image(feats, label, out)
    # 2 feature panels + label + pred, concatenated on width
    assert img.shape == (16, 16 * 4)
    np.testing.assert_allclose(img[:, :16], feats[..., 0])


def test_generate_image_overlay_rgb(tmp_path):
    v = _viz(tmp_path, overlay=True, prediction_threshold=0.5)
    feats = np.random.default_rng(0).random((16, 16, 2)).astype(np.float32)
    label = np.ones((16, 16), np.float32)
    out = np.full((16, 16, 1), 0.9, np.float32)
    img = v._generate_image(feats, label, out)
    assert img.shape == (16, 16 * 4, 3)
    # thresholded prediction panel: red channel binarized to 1
    np.testing.assert_allclose(img[:, 48:, 0], 1.0)


def test_sensitivity_chart_renders(tmp_path):
    v = _viz(tmp_path, visualize_sensitivity=True)
    chart = v._sensitivity_chart(
        np.array([0.4, 0.6], np.float32), ['TRA', 'ADC', 'label'])
    assert chart.ndim == 3 and chart.shape[-1] == 3
    assert chart.dtype == np.uint8
