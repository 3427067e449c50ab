'''Segmentation losses.

``weighted_crossentropy`` reproduces the reference loss (reference:
annotator/utils/losses.py:17-106):

- pixel-wise binary cross-entropy with a positive-class weight mask
  ``label * (weight - 1) + 1``;
- when ``weight`` is unset it is derived per batch as ``1 / positive_rate``
  (losses.py:25-27, :87-102), then scaled ``weight_mul * w + weight_add``;
- optional label smoothing = Gaussian blur of the mask
  (losses.py:60-72, via tfa.gaussian_filter2d);
- computed **from logits** for numerical stability (the reference digs the
  logits out of Keras's sigmoid output via ``y_pred._keras_logits``).

Returns the per-sample loss vector [B] (mean over pixels), like the
reference; callers take the batch mean. All math is jit/pjit-safe: under a
sharded batch the positive-rate reduction is global, matching single-device
semantics.
'''

import jax
import jax.numpy as jnp

from ..ops.filters import gaussian_filter2d
from ..utils import checks


def sigmoid_bce_from_logits(labels, logits):
    '''Numerically-stable elementwise sigmoid cross-entropy.'''
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def positive_rate(label):
    '''Fraction of positive pixels over the whole (global) label tensor.'''
    return jnp.sum(label) / jnp.asarray(label.size, jnp.float32)


def weighted_crossentropy(labels, logits, weight=None, weight_add=0.0,
                          weight_mul=1.0, n_valid=None):
    '''Per-sample weighted BCE.

    Args:
        labels: [B, H, W] float labels in [0, 1].
        logits: [B, H, W] or [B, H, W, 1] logits.
        n_valid: optional count of real samples at the front of the batch;
            the auto positive-rate weight is computed over those only.
            Evaluation pads partial batches by repeating slices, which
            would otherwise shift the batch-dependent weight away from the
            reference's unpadded semantics (losses.py:25-27).

    Returns:
        [B] per-sample loss (mean over pixels).
    '''
    if logits.ndim == labels.ndim + 1:
        logits = jnp.squeeze(logits, -1)
    labels = labels.astype(jnp.float32)
    logits = logits.astype(jnp.float32)

    # runtime guards (reference losses.py:30,91-99), active only when
    # deploy_options.debug_asserts functionalizes the step
    checks.check_range(labels, 0.0, 1.0, 'labels')
    if weight is None:
        if n_valid is None:
            rate = positive_rate(labels)
        else:
            valid = (jnp.arange(labels.shape[0]) < n_valid).astype(
                jnp.float32)
            pos = jnp.sum(jnp.sum(labels, axis=(1, 2)) * valid)
            denom = n_valid.astype(jnp.float32) * labels.shape[1] * \
                labels.shape[2]
            rate = pos / jnp.maximum(denom, 1.0)
        checks.check_range(rate, 0.0, 1.0, 'positive_rate')
        weight = jnp.where(rate > 0.0, 1.0 / jnp.maximum(rate, 1e-12), 1.0)
    weight = weight_mul * weight + weight_add
    checks.check_non_negative(jnp.asarray(weight), 'loss weight')
    weight_mask = labels * (weight - 1.0) + 1.0

    bce = sigmoid_bce_from_logits(labels, logits)
    loss = jnp.mean(bce * weight_mask, axis=(1, 2))
    return loss


class WeightedCrossentropy:
    '''Configured loss callable (parity with reference TFWeightedCrossentropy,
    losses.py:40-84). ``__call__(labels, logits) -> scalar``.'''

    def __init__(self, weight=None, weight_add=0.0, weight_mul=1.0,
                 label_smoothing=False, label_smoothing_filter_size=6,
                 label_smoothing_sigma=3):
        self.weight = weight
        self.weight_add = weight_add
        self.weight_mul = weight_mul
        self.label_smoothing = label_smoothing
        self.label_smoothing_filter_size = label_smoothing_filter_size
        self.label_smoothing_sigma = label_smoothing_sigma

    def per_sample(self, labels, logits, n_valid=None):
        if self.label_smoothing:
            labels = gaussian_filter2d(
                labels[..., None],
                filter_shape=self.label_smoothing_filter_size,
                sigma=self.label_smoothing_sigma)[..., 0]
        return weighted_crossentropy(
            labels, logits, weight=self.weight, weight_add=self.weight_add,
            weight_mul=self.weight_mul, n_valid=n_valid)

    def __call__(self, labels, logits):
        return jnp.mean(self.per_sample(labels, logits))


_LOSSES = {
    'WeightedCrossentropy': WeightedCrossentropy,
    'weighted_crossentropy': WeightedCrossentropy,
}


def solve_loss(spec):
    '''Resolve a loss spec: Keras-style {'class_name': ..., 'config': {...}}
    or a plain registered name (parity with ``tf.keras.losses.get`` usage at
    reference engine.py:270-271).'''
    if isinstance(spec, str):
        return _LOSSES[spec]()
    if isinstance(spec, dict) and 'class_name' in spec:
        cls = _LOSSES[spec['class_name']]
        return cls(**(spec.get('config') or {}))
    if callable(spec):
        return spec
    raise ValueError(f'Cannot resolve loss spec: {spec!r}')
