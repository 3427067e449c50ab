'''Learning-rate schedules, declaratively.

The reference configures its LR schedule as an ``eval()``-ed lambda string
(reference: annotator/engine.py:97-100, configs/additionals/
deploy_options.yaml:3: ``"lambda epoch, current_lr: 0.001 * 0.96 ** (epoch //
1000)"``). ``eval`` is a code-injection hazard, so this module *parses* that
exact string form into a safe declarative schedule, and also accepts explicit
dict specs ``{'initial': .., 'rate': .., 'interval': ..}`` or a constant.
'''

import re

import jax.numpy as jnp

# Recognized lambda-string forms (parsed, never eval'ed):
#   lambda epoch, lr: A * B ** (epoch // C)   -> exponential step decay
#   lambda epoch, lr: A * B ** epoch          -> per-step exponential decay
#   lambda epoch, lr: A                       -> constant
_NUM = r'[0-9.eE+-]+'
_LAMBDA_HEAD = r'^\s*lambda\s+\w+\s*,\s*\w+\s*:\s*'
_LAMBDA_STEP_RE = re.compile(
    _LAMBDA_HEAD + rf'({_NUM})\s*\*\s*({_NUM})\s*\*\*\s*'
    r'\(\s*\w+\s*//\s*([0-9]+)\s*\)\s*$')
_LAMBDA_EXP_RE = re.compile(
    _LAMBDA_HEAD + rf'({_NUM})\s*\*\s*({_NUM})\s*\*\*\s*\w+\s*$')
_LAMBDA_CONST_RE = re.compile(_LAMBDA_HEAD + rf'({_NUM})\s*$')


def exponential_step_decay(initial, rate, interval):
    '''lr(step) = initial * rate ** (step // interval).'''
    def schedule(step):
        return initial * rate ** (step // interval)
    schedule.spec = dict(kind='exponential_step_decay', initial=initial,
                         rate=rate, interval=interval)
    return schedule


def constant(value):
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), value)
    schedule.spec = dict(kind='constant', value=value)
    return schedule


def solve_schedule(spec):
    '''Resolve an LR schedule spec into ``fn(step) -> lr``.

    Accepts: None, a float, a dict spec, or the reference's lambda string
    (parsed, never eval'ed).
    '''
    if spec is None:
        return None
    if isinstance(spec, (int, float)):
        return constant(float(spec))
    if isinstance(spec, dict):
        kind = spec.get('kind', 'exponential_step_decay')
        if kind == 'constant':
            return constant(float(spec['value']))
        if kind == 'exponential_step_decay':
            return exponential_step_decay(
                float(spec['initial']), float(spec['rate']),
                int(spec['interval']))
        raise ValueError(f'Unknown schedule kind {kind!r}')
    if isinstance(spec, str):
        m = _LAMBDA_STEP_RE.match(spec)
        if m:
            return exponential_step_decay(
                float(m.group(1)), float(m.group(2)), int(m.group(3)))
        m = _LAMBDA_EXP_RE.match(spec)
        if m:
            return exponential_step_decay(
                float(m.group(1)), float(m.group(2)), interval=1)
        m = _LAMBDA_CONST_RE.match(spec)
        if m:
            return constant(float(m.group(1)))
        raise ValueError(
            'LR schedule strings are parsed, not eval\'ed; supported forms: '
            '"lambda epoch, current_lr: A * B ** (epoch // C)", '
            '"... : A * B ** epoch", "... : A". For anything else use the '
            "dict spec {'kind': 'exponential_step_decay', 'initial': A, "
            f"'rate': B, 'interval': C}}; got: {spec!r}")
    raise ValueError(f'Cannot resolve schedule spec: {spec!r}')
