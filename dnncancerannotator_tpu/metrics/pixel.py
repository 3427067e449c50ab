'''Pixel-level metrics with Keras-equivalent semantics.

The reference resolves these through ``tf.keras.metrics.get``
(reference: annotator/utils/metrics.py:19-34) with the suite configured in
configs/additionals/metrics.yaml: Precision / Recall / AUC(PR, ROC) /
FBetaScore plus the confusion-count metrics used for PR-curve raw data
(reference: annotator/utils/callbacks.py:219-224).

Keras details preserved:
- prediction comparison is strict ``>`` against each threshold;
- labels compare ``> 0.5``;
- ``AUC(num_thresholds=N)`` places N-2 evenly spaced interior thresholds with
  -eps / 1+eps endpoints;
- PR AUC uses Keras's "careful interpolation" (Davis & Goadrich), ROC AUC the
  trapezoidal rule.

All updates run as one jitted confusion-count kernel on device.
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import _memo

# per-batch confusion-count memo (see metrics/_memo.py)
_COUNT_CACHE = []


@functools.partial(jax.jit, static_argnames=())
def _confusion_counts(y_true, y_pred, thresholds):
    '''TP/FP/TN/FN counts per threshold. y_true/y_pred flattened.'''
    y_true = y_true.reshape(-1).astype(jnp.float32)
    y_pred = y_pred.reshape(-1).astype(jnp.float32)
    pos = (y_true > 0.5).astype(jnp.float32)
    neg = 1.0 - pos
    pred_pos = (y_pred[None, :] > thresholds[:, None]).astype(jnp.float32)
    tp = pred_pos @ pos
    fp = pred_pos @ neg
    fn = jnp.sum(pos) - tp
    tn = jnp.sum(neg) - fp
    return tp, fp, tn, fn


class _ConfusionMetric:
    '''Shared accumulator over thresholds.'''

    def __init__(self, thresholds=0.5, name=None):
        self._scalar = np.isscalar(thresholds)
        self.thresholds = jnp.asarray(
            np.reshape(np.asarray(thresholds, np.float32), [-1]))
        self.name = name or type(self).__name__
        self.reset_state()

    def reset_state(self):
        n = self.thresholds.shape[0]
        self.tp = np.zeros([n], np.float64)
        self.fp = np.zeros([n], np.float64)
        self.tn = np.zeros([n], np.float64)
        self.fn = np.zeros([n], np.float64)

    reset = reset_state

    def update_state(self, y_true, y_pred, sample_weight=None):
        # identical-threshold instances fed the same batch (the PR-curve
        # suites hold 6 of them) share one confusion pass per batch
        key = tuple(np.asarray(self.thresholds).ravel().tolist())
        counts = _memo.lookup(_COUNT_CACHE, key, (y_true, y_pred))
        if counts is None:
            counts = _confusion_counts(
                jnp.asarray(y_true), jnp.asarray(y_pred), self.thresholds)
            counts = tuple(np.asarray(c, np.float64) for c in counts)
            _memo.store(_COUNT_CACHE, key, (y_true, y_pred), counts)
        tp, fp, tn, fn = counts
        self.tp = self.tp + tp
        self.fp = self.fp + fp
        self.tn = self.tn + tn
        self.fn = self.fn + fn

    update = update_state

    def _maybe_scalar(self, x):
        x = np.asarray(x, np.float32)
        return float(x[0]) if self._scalar else x


class Precision(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.tp / np.maximum(self.tp + self.fp, 1e-12))


class Recall(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.tp / np.maximum(self.tp + self.fn, 1e-12))


class TruePositives(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.tp)


class FalsePositives(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.fp)


class TrueNegatives(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.tn)


class FalseNegatives(_ConfusionMetric):
    def result(self):
        return self._maybe_scalar(self.fn)


class FBetaScore:
    '''F-beta from precision+recall (reference metrics.py:37-77).'''

    def __init__(self, beta, thresholds, epsilon=1e-07, name=None, **kwargs):
        assert beta > 0
        self.beta = beta
        self.epsilon = epsilon
        self.name = name or type(self).__name__
        self.precision = Precision(thresholds)
        self.recall = Recall(thresholds)

    def update_state(self, y_true, y_pred, sample_weight=None):
        self.precision.update_state(y_true, y_pred, sample_weight)
        self.recall.update_state(y_true, y_pred, sample_weight)

    update = update_state

    def result(self):
        p = np.asarray(self.precision.result())
        r = np.asarray(self.recall.result())
        out = (1 + self.beta ** 2) * p * r / (self.beta ** 2 * p + r + self.epsilon)
        return float(out) if out.ndim == 0 else out

    def reset_state(self):
        self.precision.reset_state()
        self.recall.reset_state()

    reset = reset_state


class AUC(_ConfusionMetric):
    '''Keras-parity AUC over PR or ROC curves.'''

    def __init__(self, curve='ROC', num_thresholds=200, name=None, **kwargs):
        self.curve = curve.upper()
        self.num_thresholds = num_thresholds
        eps = 1e-7
        interior = [(i + 1) / (num_thresholds - 1)
                    for i in range(num_thresholds - 2)]
        thresholds = [-eps] + interior + [1.0 + eps]
        super().__init__(thresholds=thresholds, name=name)
        self._scalar = True

    def result(self):
        tp, fp, tn, fn = self.tp, self.fp, self.tn, self.fn
        if self.curve == 'PR':
            # Keras interpolate_pr_auc (careful interpolation)
            dtp = tp[:-1] - tp[1:]
            p = tp + fp
            dp = p[:-1] - p[1:]
            prec_slope = _div_no_nan(dtp, np.maximum(dp, 0))
            intercept = tp[1:] - prec_slope * p[1:]
            safe_p_ratio = np.where(
                (p[:-1] > 0) & (p[1:] > 0),
                _div_no_nan(p[:-1], np.maximum(p[1:], 0)),
                np.ones_like(p[1:]))
            incr = _div_no_nan(
                prec_slope * (dtp + intercept * np.log(safe_p_ratio)),
                np.maximum(tp[1:] + fn[1:], 0))
            return float(np.sum(incr))
        # ROC, trapezoidal
        tpr = _div_no_nan(tp, tp + fn)
        fpr = _div_no_nan(fp, fp + tn)
        heights = (tpr[:-1] + tpr[1:]) / 2.0
        return float(np.sum((fpr[:-1] - fpr[1:]) * heights))


def _div_no_nan(a, b):
    return np.where(b != 0, a / np.where(b == 0, 1, b), 0.0)


class Mean:
    '''Streaming mean (used for loss reporting).'''

    def __init__(self, name='mean'):
        self.name = name
        self.reset()

    def reset(self):
        self.total = 0.0
        self.count = 0

    reset_state = reset

    def update(self, value, n=1):
        self.total += float(value) * n
        self.count += n

    def result(self):
        return self.total / max(self.count, 1)
