'''Optimizer resolution from Keras-style config specs.

The reference resolves any optimizer by name or ``{'class_name', 'config'}``
dict through ``tf.keras.optimizers.get`` (reference: annotator/engine.py:
276-284, including a workaround that rebuilds Adam from its config). This
module provides the same contract over optax: a registry of constructors
keyed by lowercase Keras optimizer names, with Keras argument names
(``beta_1``, ``epsilon``, ``rho``, ...) mapped onto optax's.

The learning rate is threaded as a schedule function so the engine's
LearningRateScheduler (reference engine.py:97-100) keeps authority over the
per-step LR; a ``learning_rate`` in the optimizer config is used only when no
scheduler is configured.
'''

import optax

# Keras defaults per optimizer (TF 2.6): the fallback LR when neither a
# scheduler nor an explicit learning_rate is configured.
_DEFAULT_LR = {
    'adam': 1e-3, 'adamw': 1e-3, 'adamax': 1e-3, 'nadam': 1e-3,
    'rmsprop': 1e-3, 'adagrad': 1e-3, 'adadelta': 1e-3,
    'sgd': 1e-2, 'lamb': 1e-3, 'lion': 1e-4,
}


def _adam(lr, cfg):
    return optax.adam(lr, b1=cfg.get('beta_1', 0.9),
                      b2=cfg.get('beta_2', 0.999),
                      eps=cfg.get('epsilon', 1e-7))


def _adamw(lr, cfg):
    return optax.adamw(lr, b1=cfg.get('beta_1', 0.9),
                       b2=cfg.get('beta_2', 0.999),
                       eps=cfg.get('epsilon', 1e-7),
                       weight_decay=cfg.get('weight_decay', 4e-3))


def _adamax(lr, cfg):
    return optax.adamax(lr, b1=cfg.get('beta_1', 0.9),
                        b2=cfg.get('beta_2', 0.999),
                        eps=cfg.get('epsilon', 1e-7))


def _nadam(lr, cfg):
    return optax.nadam(lr, b1=cfg.get('beta_1', 0.9),
                       b2=cfg.get('beta_2', 0.999),
                       eps=cfg.get('epsilon', 1e-7))


def _sgd(lr, cfg):
    momentum = cfg.get('momentum', 0.0) or None
    return optax.sgd(lr, momentum=momentum,
                     nesterov=cfg.get('nesterov', False))


def _rmsprop(lr, cfg):
    return optax.rmsprop(lr, decay=cfg.get('rho', 0.9),
                         eps=cfg.get('epsilon', 1e-7),
                         momentum=cfg.get('momentum', 0.0),
                         centered=cfg.get('centered', False))


def _adagrad(lr, cfg):
    return optax.adagrad(
        lr, initial_accumulator_value=cfg.get(
            'initial_accumulator_value', 0.1),
        eps=cfg.get('epsilon', 1e-7))


def _adadelta(lr, cfg):
    return optax.adadelta(lr, rho=cfg.get('rho', 0.95),
                          eps=cfg.get('epsilon', 1e-7))


def _lamb(lr, cfg):
    return optax.lamb(lr, b1=cfg.get('beta_1', 0.9),
                      b2=cfg.get('beta_2', 0.999),
                      eps=cfg.get('epsilon', 1e-6),
                      weight_decay=cfg.get('weight_decay', 0.0))


def _lion(lr, cfg):
    return optax.lion(lr, b1=cfg.get('beta_1', 0.9),
                      b2=cfg.get('beta_2', 0.99),
                      weight_decay=cfg.get('weight_decay', 0.0))


_REGISTRY = {
    'adam': _adam, 'adamw': _adamw, 'adamax': _adamax, 'nadam': _nadam,
    'sgd': _sgd, 'rmsprop': _rmsprop, 'adagrad': _adagrad,
    'adadelta': _adadelta, 'lamb': _lamb, 'lion': _lion,
}


def solve_optimizer(spec, schedule=None):
    '''Resolve an optimizer spec into ``(optax transform, lr schedule fn)``.

    ``spec``: a name string (any case), or ``{'class_name': ..., 'config':
    {...}}`` with Keras argument names. ``schedule``: the engine's LR
    schedule; when None, falls back to the config's ``learning_rate`` or the
    Keras default for that optimizer, returned as a constant schedule so
    callers can always log ``lr(step)``.
    '''
    from . import schedules as schedules_lib

    if isinstance(spec, str):
        name, cfg = spec, {}
    elif isinstance(spec, dict):
        name = spec.get('class_name') or spec.get('name')
        if not name:
            raise ValueError(f'optimizer dict spec needs class_name: {spec!r}')
        cfg = dict(spec.get('config') or {})
    else:
        raise ValueError(f'Cannot resolve optimizer spec: {spec!r}')

    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f'Unknown optimizer {name!r}; available: '
            f'{sorted(_REGISTRY)} (string name or '
            "{'class_name': ..., 'config': {...}} dict spec)")
    if schedule is None:
        lr = float(cfg.get('learning_rate', cfg.get('lr', _DEFAULT_LR[key])))
        schedule = schedules_lib.constant(lr)
    return _REGISTRY[key](schedule, cfg), schedule
