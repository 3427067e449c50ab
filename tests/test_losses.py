'''Loss and LR-schedule semantics tests.'''

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.train import losses, schedules


def _manual_bce(y, logit):
    p = 1.0 / (1.0 + np.exp(-logit))
    return -(y * np.log(p) + (1 - y) * np.log(1 - p))


def test_weighted_crossentropy_explicit_weight():
    rng = np.random.default_rng(0)
    y = (rng.random((2, 8, 8)) > 0.7).astype(np.float32)
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    out = losses.weighted_crossentropy(
        jnp.asarray(y), jnp.asarray(logits), weight=4.0)
    bce = _manual_bce(y, logits[..., 0])
    mask = y * 3.0 + 1.0
    expected = (bce * mask).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_auto_weight_is_inverse_positive_rate():
    y = np.zeros((1, 10, 10), np.float32)
    y[0, :2, :5] = 1.0  # positive rate = 0.1 -> weight 10
    logits = np.zeros((1, 10, 10, 1), np.float32)
    auto = losses.weighted_crossentropy(jnp.asarray(y), jnp.asarray(logits))
    manual = losses.weighted_crossentropy(
        jnp.asarray(y), jnp.asarray(logits), weight=10.0)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual), rtol=1e-6)


def test_weight_mul_add():
    y = np.zeros((1, 10, 10), np.float32)
    y[0, :2, :5] = 1.0
    logits = np.ones((1, 10, 10, 1), np.float32)
    a = losses.weighted_crossentropy(
        jnp.asarray(y), jnp.asarray(logits), weight=2.0, weight_mul=3.0,
        weight_add=1.0)
    b = losses.weighted_crossentropy(
        jnp.asarray(y), jnp.asarray(logits), weight=7.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_label_smoothing_changes_target():
    '''Gaussian label smoothing must provably alter the loss.

    At zero logits the BCE reduces to log(2) x label mass, which blurring
    preserves — so this test uses spatially varying nonzero logits, where
    moving label mass between pixels with different predictions changes
    the loss (reference losses.py:60-72 semantics).
    '''
    y = np.zeros((1, 16, 16), np.float32)
    y[0, 6:10, 6:10] = 1.0
    rng = np.random.default_rng(3)
    logits = rng.normal(0, 2, (1, 16, 16, 1)).astype(np.float32)
    plain = losses.WeightedCrossentropy(weight=1.0)
    smooth = losses.WeightedCrossentropy(
        weight=1.0, label_smoothing=True, label_smoothing_filter_size=6,
        label_smoothing_sigma=3)
    a = float(plain(jnp.asarray(y), jnp.asarray(logits)))
    b = float(smooth(jnp.asarray(y), jnp.asarray(logits)))
    assert abs(a - b) > 1e-4, (a, b)


def test_solve_loss_spec():
    loss = losses.solve_loss({'class_name': 'WeightedCrossentropy',
                              'config': {'weight_mul': 3.0}})
    assert isinstance(loss, losses.WeightedCrossentropy)
    assert loss.weight_mul == 3.0
    assert isinstance(losses.solve_loss('WeightedCrossentropy'),
                      losses.WeightedCrossentropy)


def test_schedule_lambda_string_parsed():
    fn = schedules.solve_schedule(
        'lambda epoch, current_lr: 0.001 * 0.96 ** (epoch // 1000)')
    assert float(fn(0)) == pytest.approx(0.001)
    assert float(fn(999)) == pytest.approx(0.001)
    assert float(fn(1000)) == pytest.approx(0.001 * 0.96)
    assert float(fn(5000)) == pytest.approx(0.001 * 0.96 ** 5)


def test_schedule_more_lambda_forms():
    const = schedules.solve_schedule('lambda epoch, current_lr: 5e-4')
    assert float(const(123)) == pytest.approx(5e-4)
    exp = schedules.solve_schedule(
        'lambda epoch, current_lr: 0.01 * 0.5 ** epoch')
    assert float(exp(2)) == pytest.approx(0.0025)
    with pytest.raises(ValueError, match='dict spec'):
        schedules.solve_schedule('lambda e, lr: lr * __import__("os")')


def test_solve_optimizer_registry():
    import jax.numpy as jnp
    import optax
    from dnncancerannotator_tpu.train import optimizers

    params = {'w': jnp.ones((3,))}
    grads = {'w': jnp.full((3,), 0.5)}
    for name in ('adam', 'sgd', 'rmsprop', 'adamw', 'adagrad', 'adadelta',
                 'nadam', 'adamax', 'lamb', 'lion'):
        tx, schedule = optimizers.solve_optimizer(name)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new['w'] - params['w']).sum()) > 0, name
        assert float(schedule(0)) > 0

    # Keras dict spec with argument-name mapping
    tx, schedule = optimizers.solve_optimizer(
        {'class_name': 'SGD',
         'config': {'learning_rate': 0.5, 'momentum': 0.9}})
    assert float(schedule(0)) == pytest.approx(0.5)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates['w']),
                               -0.5 * 0.5 * np.ones(3), rtol=1e-6)

    with pytest.raises(ValueError, match='Unknown optimizer'):
        optimizers.solve_optimizer('ftrl2000')


def test_debug_asserts_catch_bad_labels():
    '''checkify-armed loss rejects out-of-range labels (reference
    tf.debugging.assert_on_max/min parity, losses.py:91-99).'''
    from jax.experimental import checkify
    from dnncancerannotator_tpu.utils import checks

    checks.enable(True)
    try:
        fn = checks.checked(
            jax.jit(lambda y, lg: losses.weighted_crossentropy(y, lg)))
        logits = jnp.zeros((1, 4, 4, 1))
        with pytest.raises(checkify.JaxRuntimeError, match='labels'):
            fn(jnp.full((1, 4, 4), 2.0), logits)
        ok = fn(jnp.ones((1, 4, 4)) * 0.5, logits)
        assert np.all(np.isfinite(np.asarray(ok)))
    finally:
        checks.enable(False)


def test_checks_disabled_are_free():
    from dnncancerannotator_tpu.utils import checks
    assert not checks.enabled()
    fn = checks.checked(lambda x: x + 1)  # pass-through, no checkify
    assert fn(1) == 2


def test_schedule_rejects_arbitrary_code():
    with pytest.raises(ValueError):
        schedules.solve_schedule(
            'lambda epoch, lr: __import__("os").system("true")')


def test_schedule_dict_and_constant():
    fn = schedules.solve_schedule(
        {'kind': 'exponential_step_decay', 'initial': 0.005, 'rate': 0.9,
         'interval': 100})
    assert float(fn(250)) == pytest.approx(0.005 * 0.9 ** 2)
    assert float(schedules.solve_schedule(0.01)(123)) == pytest.approx(0.01)
