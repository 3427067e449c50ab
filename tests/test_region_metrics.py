'''Region-metric behavioral spec, ported from the reference unit suite
(reference: annotator/tests/test_region_metrics.py — the only executable spec
of region-metric semantics). Fixtures are procedural synthetic circle masks
with analytically known TP/FN/FP counts.
'''

import random
import unittest
from copy import deepcopy

import numpy as np

from dnncancerannotator_tpu import metrics as custom_metrics


def draw_circle(tensor, radius, center_x, center_y, min_=1.0, max_=1.0):
    assert tensor.ndim == 2
    width, height = tensor.shape
    x = np.arange(width, dtype=np.float32)
    y = np.arange(height, dtype=np.float32)
    x_dist = (x - float(center_x)) ** 2
    y_dist = (y - float(center_y)) ** 2
    dist = np.sqrt(x_dist[:, None] + y_dist[None, :])
    out = (dist < float(radius)).astype(np.float32) * random.uniform(min_, max_)
    return (out.astype(tensor.dtype) + tensor)


class TestRegionMetricsSingleThreshold(unittest.TestCase):
    def setUp(self):
        random.seed(42)
        self.rng = np.random.default_rng(42)
        self.metric = custom_metrics.RegionBasedConfusionMatrix(
            thresholds=0.5, IoU_threshold=0.3, resize_factor=1.0)
        self.batch_size = 10
        self.radius = self.rng.integers(10, 30, self.batch_size)
        self.center_x = self.rng.integers(30, 70, self.batch_size)
        self.center_y = self.rng.integers(80, 120, self.batch_size)
        self.center_x_off = self.rng.integers(130, 170, self.batch_size)
        self.center_y_off = self.rng.integers(80, 120, self.batch_size)
        self.width = 200
        self.height = 200
        self.n_threshold = 1

    # -- sample generators (parity with reference fixtures) -----------------
    def generate_tp_fn_samples(self, tp_rate):
        y_true = np.stack([
            draw_circle(np.zeros([self.width, self.height], np.int64), r, cx, cy)
            for r, cx, cy in zip(self.radius, self.center_x, self.center_y)
        ], axis=0)
        y_pred = y_true.astype(np.float32)[..., None]
        n_tp = int(self.batch_size * tp_rate)
        n_fn = self.batch_size - n_tp
        indicator = np.concatenate(
            [np.ones(n_tp, np.float32), np.zeros(n_fn, np.float32)])
        self.rng.shuffle(indicator)
        y_pred = y_pred * indicator[:, None, None, None]
        return y_true, y_pred, n_tp, n_fn

    def generate_tp_fp_samples(self, tp_rate):
        y_true = np.stack([
            draw_circle(np.zeros([self.width, self.height], np.int64), r, cx, cy)
            for r, cx, cy in zip(self.radius, self.center_x, self.center_y)
        ], axis=0)
        y_pred = y_true.astype(np.float32)[..., None]
        n_tp = int(self.batch_size * tp_rate)
        n_fp = self.batch_size - n_tp
        indicator = np.concatenate(
            [np.ones(n_tp, np.int64), np.zeros(n_fp, np.int64)])
        self.rng.shuffle(indicator)
        y_true = y_true * indicator[:, None, None]
        return y_true, y_pred, n_tp, n_fp

    def generate_off_samples(self, off_rate):
        offs = np.stack([
            draw_circle(np.zeros([self.width, self.height], np.int64), r, cx, cy)
            for r, cx, cy in zip(self.radius, self.center_x_off, self.center_y_off)
        ], axis=0).astype(np.float32)[..., None]
        n_off = int(self.batch_size * off_rate)
        indicator = np.concatenate([
            np.ones(n_off, np.float32),
            np.zeros(self.batch_size - n_off, np.float32)])
        self.rng.shuffle(indicator)
        offs = offs * indicator[:, None, None, None]
        return offs, n_off

    def generate_null_samples(self):
        y_true = np.zeros([self.batch_size, self.width, self.height], np.int64)
        y_pred = y_true.astype(np.float32)[..., None]
        return y_true, y_pred

    def generate_random_samples(self, nslices, min_=1.0, max_=1.0):
        def gen_slice(dtype, ncircles, lo=1.0, hi=1.0):
            image = np.zeros([self.width, self.height], dtype)
            for _ in range(ncircles):
                image = draw_circle(
                    image,
                    random.uniform(5.0, self.width / 20),
                    random.uniform(0.0, self.width),
                    random.uniform(0.0, self.height),
                    lo, hi)
            return image

        y_true = np.stack([gen_slice(np.int32, 5) for _ in range(nslices)], 0)
        y_pred = np.stack(
            [gen_slice(np.float32, 5, min_, max_) for _ in range(nslices)], 0)
        return y_true, y_pred[..., None]

    # -- tests (parity with reference assertions) ---------------------------
    def test_tp_fn_all_tp(self):
        y_true, y_pred, n_tp, n_fn = self.generate_tp_fn_samples(1.0)
        tp, fn = self.metric.get_tp_fn(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [n_fn] * self.n_threshold)

    def test_tp_fn_all_fn(self):
        y_true, y_pred, n_tp, n_fn = self.generate_tp_fn_samples(0.0)
        tp, fn = self.metric.get_tp_fn(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [n_fn] * self.n_threshold)

    def test_tp_fn_all_fp(self):
        y_true, y_pred, _, _ = self.generate_tp_fp_samples(0.0)
        tp, fn = self.metric.get_tp_fn(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [0] * self.n_threshold)

    def test_tp_fn_half(self):
        y_true, y_pred, n_tp, n_fn = self.generate_tp_fn_samples(0.5)
        tp, fn = self.metric.get_tp_fn(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [n_fn] * self.n_threshold)

    def test_tp_fp_all_tp(self):
        y_true, y_pred, n_tp, n_fp = self.generate_tp_fp_samples(0.0)
        tp, fp = self.metric.get_tp_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_fp] * self.n_threshold)

    def test_tp_fp_all_fp(self):
        y_true, y_pred, n_tp, n_fp = self.generate_tp_fp_samples(1.0)
        tp, fp = self.metric.get_tp_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_fp] * self.n_threshold)

    def test_tp_fp_all_fn(self):
        y_true, y_pred, _, _ = self.generate_tp_fn_samples(0.0)
        tp, fp = self.metric.get_tp_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [0] * self.n_threshold)

    def test_tp_fp_half(self):
        y_true, y_pred, n_tp, n_fp = self.generate_tp_fp_samples(0.5)
        tp, fp = self.metric.get_tp_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_fp] * self.n_threshold)

    def test_tp_fn_fp_all_tp(self):
        y_true, y_pred, n_tp, n_fp = self.generate_tp_fp_samples(0.0)
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_fp] * self.n_threshold)

    def test_tp_fn_fp_all_fp(self):
        y_true, y_pred, n_tp, n_fp = self.generate_tp_fp_samples(1.0)
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_fp] * self.n_threshold)

    def test_tp_fn_fp_all_fn(self):
        y_true, y_pred, _, n_fn = self.generate_tp_fn_samples(0.0)
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [n_fn] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [0] * self.n_threshold)

    def test_tp_fn_fp_null(self):
        y_true, y_pred = self.generate_null_samples()
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [0] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [0] * self.n_threshold)

    def test_tp_fn_fp_mixed(self):
        y_true, y_pred, n_tp, n_fn = self.generate_tp_fn_samples(0.4)
        offs, n_off = self.generate_off_samples(0.7)
        y_pred = y_pred + offs
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), [n_tp] * self.n_threshold)
        self.assertListEqual(fn.tolist(), [n_fn] * self.n_threshold)
        self.assertListEqual(fp.tolist(), [n_off] * self.n_threshold)

    def test_consistency(self):
        y_true, y_pred, _, _ = self.generate_tp_fn_samples(0.4)
        offs, _ = self.generate_off_samples(0.7)
        y_pred = y_pred + offs
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        tp2, fn2 = self.metric.get_tp_fn(y_true, y_pred, None)
        _, fp2 = self.metric.get_tp_fp(y_true, y_pred, None)
        self.assertListEqual(tp.tolist(), tp2.tolist())
        self.assertListEqual(fp.tolist(), fp2.tolist())
        self.assertListEqual(fn.tolist(), fn2.tolist())

    def test_consistency_random(self):
        for _ in range(10):
            y_true, y_pred = self.generate_random_samples(20)
            tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
            tp2, fn2 = self.metric.get_tp_fn(y_true, y_pred, None)
            _, fp2 = self.metric.get_tp_fp(y_true, y_pred, None)
            self.assertListEqual(tp.tolist(), tp2.tolist())
            self.assertListEqual(fn.tolist(), fn2.tolist())
            self.assertListEqual(fp.tolist(), fp2.tolist())

    def test_highlevel_consistency(self):
        cfg = self.metric.get_config()
        tp_count = custom_metrics.RegionBasedTruePositives(**cfg)
        fp_count = custom_metrics.RegionBasedFalsePositives(**cfg)
        fn_count = custom_metrics.RegionBasedFalseNegatives(**cfg)
        recall_count = custom_metrics.RegionBasedRecall(**cfg)
        confusion = custom_metrics.RegionBasedConfusionMatrix(**cfg)
        for _ in range(5):
            y_true, y_pred = self.generate_random_samples(20)
            for m in (tp_count, fp_count, fn_count, recall_count, confusion):
                m.update_state(y_true, y_pred)
        d = confusion.result_dict()
        np.testing.assert_array_equal(
            np.asarray(tp_count.result()), np.asarray(d['true_positive_counts']))
        np.testing.assert_array_equal(
            np.asarray(fp_count.result()), np.asarray(d['false_positive_counts']))
        np.testing.assert_array_equal(
            np.asarray(fn_count.result()), np.asarray(d['false_negative_counts']))
        np.testing.assert_allclose(
            np.asarray(recall_count.result()), np.asarray(d['recall']), rtol=1e-6)


class TestRegionMetricsMultiThreshold(TestRegionMetricsSingleThreshold):
    def setUp(self):
        super().setUp()
        self.n_threshold = 10
        configs = self.metric.get_config()
        configs['thresholds'] = [
            i / (self.n_threshold - 1) for i in range(self.n_threshold)]
        configs['thresholds'][0] = 0.001

        def new_config(threshold, configs):
            configs = deepcopy(configs)
            configs['thresholds'] = [threshold]
            return configs

        self.metric = custom_metrics.RegionBasedConfusionMatrix(**configs)
        self.metric_list = [
            custom_metrics.RegionBasedConfusionMatrix(**new_config(t, configs))
            for t in configs['thresholds']
        ]

    def test_consistency_multithresholds(self):
        y_true, y_pred = self.generate_random_samples(20, 0.2, 1.0)
        tp, fn, fp = self.metric.get_tp_fn_fp(y_true, y_pred, None)
        singles = [m.get_tp_fn_fp(y_true, y_pred, None) for m in self.metric_list]
        self.assertListEqual([int(s[0][0]) for s in singles], tp.tolist())
        self.assertListEqual([int(s[1][0]) for s in singles], fn.tolist())
        self.assertListEqual([int(s[2][0]) for s in singles], fp.tolist())

    def test_highlevel_consistency_multithresholds(self):
        for _ in range(10):
            y_true, y_pred = self.generate_random_samples(20, 0.2, 1.0)
            self.metric.update_state(y_true, y_pred)
            for m in self.metric_list:
                m.update_state(y_true, y_pred)
        d = self.metric.result_dict()
        self.assertListEqual(
            [int(m.result_dict()['true_positive_counts']) for m in self.metric_list],
            np.asarray(d['true_positive_counts']).tolist())
        self.assertListEqual(
            [int(m.result_dict()['false_positive_counts']) for m in self.metric_list],
            np.asarray(d['false_positive_counts']).tolist())
        self.assertListEqual(
            [int(m.result_dict()['false_negative_counts']) for m in self.metric_list],
            np.asarray(d['false_negative_counts']).tolist())
        np.testing.assert_allclose(
            [float(m.result_dict()['precision']) for m in self.metric_list],
            np.asarray(d['precision']), rtol=1e-6)
        np.testing.assert_allclose(
            [float(m.result_dict()['recall']) for m in self.metric_list],
            np.asarray(d['recall']), rtol=1e-6)


class TestRegionMetricsSingleThresholdShrinked(TestRegionMetricsSingleThreshold):
    def setUp(self):
        super().setUp()
        configs = self.metric.get_config()
        configs['resize_factor'] = 0.5
        self.metric = custom_metrics.RegionBasedConfusionMatrix(**configs)


class TestRegionMetricsMultiThresholdShrinked(TestRegionMetricsMultiThreshold):
    def setUp(self):
        super().setUp()
        configs = self.metric.get_config()
        configs['resize_factor'] = 0.5
        self.metric = custom_metrics.RegionBasedConfusionMatrix(**configs)

        def new_config(threshold, configs):
            configs = deepcopy(configs)
            configs['thresholds'] = [threshold]
            return configs

        self.metric_list = [
            custom_metrics.RegionBasedConfusionMatrix(**new_config(t, configs))
            for t in np.reshape(configs['thresholds'], [-1]).tolist()
        ]


class TestRegionCapacityOverflow(unittest.TestCase):
    '''Images with more components than the static capacity must escalate,
    not silently truncate (reference ragged semantics, metrics.py:261,300).'''

    def _grid_masks(self):
        '''100 isolated 6x6 pred blobs on a raster grid; the LAST 10 (by
        raster order, i.e. the highest component ids) are also label
        regions — so a capacity-64 run without escalation would miss every
        match.'''
        size = 200
        y_pred = np.zeros([size, size], np.float32)
        y_true = np.zeros([size, size], np.int64)
        blobs = [(5 + 18 * r, 5 + 18 * c) for r in range(10)
                 for c in range(10)]
        for y0, x0 in blobs:
            y_pred[y0:y0 + 6, x0:x0 + 6] = 1.0
        for y0, x0 in blobs[-10:]:
            y_true[y0:y0 + 6, x0:x0 + 6] = 1
        return y_true[None], y_pred[None, ..., None]

    def test_overflow_escalates_to_exact_counts(self):
        y_true, y_pred = self._grid_masks()
        from scipy import ndimage
        self.assertEqual(ndimage.label(y_pred[0, ..., 0] > 0.5)[1], 100)

        metric = custom_metrics.RegionBasedConfusionMatrix(
            thresholds=0.5, IoU_threshold=0.3, max_pred_regions=64)
        tp, fn, fp = metric.get_tp_fn_fp(y_true, y_pred)
        self.assertEqual(int(np.squeeze(tp)), 10)
        self.assertEqual(int(np.squeeze(fn)), 0)
        self.assertEqual(int(np.squeeze(fp)), 90)

    def test_overflow_pred_side_precision(self):
        y_true, y_pred = self._grid_masks()
        precision = custom_metrics.RegionBasedPrecision(
            thresholds=0.5, IoU_threshold=0.3, max_pred_regions=64)
        precision.update_state(y_true, y_pred)
        self.assertAlmostEqual(float(precision.result()), 10 / 100, places=4)


if __name__ == '__main__':
    unittest.main()


def test_cca_pallas_padded_nonaligned_interpret(monkeypatch):
    '''Non-(8,128)-aligned planes now take the Pallas CCA through the
    pad-in-wrapper path; interpret mode runs the real kernel math on CPU
    and must match scipy region structure and counts.'''
    import numpy as np
    from scipy import ndimage
    import jax.numpy as jnp
    from dnncancerannotator_tpu.ops.cca import (
        connected_components_batch, _pallas_cca_ok)
    from dnncancerannotator_tpu.parallel import mesh as mesh_lib

    monkeypatch.setenv('DNNCA_PALLAS_INTERPRET', '1')
    rng = np.random.default_rng(3)
    masks = rng.random((2, 20, 70)) > 0.6
    with mesh_lib.pallas_single_device():
        assert _pallas_cca_ok(masks.shape)
        labels, counts = connected_components_batch(jnp.asarray(masks))
    labels, counts = np.asarray(labels), np.asarray(counts)
    four = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for i in range(masks.shape[0]):
        ref, n = ndimage.label(masks[i], structure=four)
        assert counts[i] == n
        pairs = set(zip(ref.ravel().tolist(), labels[i].ravel().tolist()))
        assert len(pairs) == n + 1  # bijective region correspondence


def test_grayscale_opening_commutes_with_thresholding():
    '''The round-4 region-eval optimization (metrics/region.py): opening the
    grayscale prediction once and thresholding equals opening each binary
    thresholded mask (flat SE, SAME pad) — exactly, for every threshold.'''
    import numpy as np
    import jax.numpy as jnp
    from dnncancerannotator_tpu.ops.morphology import morph_open

    rng = np.random.RandomState(3)
    pred = rng.rand(40, 40).astype(np.float32)
    thresholds = np.linspace(0.005, 0.995, 25).astype(np.float32)
    opened = np.asarray(morph_open(jnp.asarray(pred), 5))
    for t in thresholds:
        via_gray = opened >= t
        via_binary = np.asarray(
            morph_open(jnp.asarray((pred >= t).astype(np.int8)), 5)) > 0
        np.testing.assert_array_equal(via_gray, via_binary, err_msg=f't={t}')
