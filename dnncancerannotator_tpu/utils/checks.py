'''Runtime numeric assertions.

TPU-native equivalent of the reference's graph-embedded
``tf.debugging.assert_*`` guards (reference: annotator/utils/losses.py:30,
91-99 — weight >= 0, labels within [0, 1], positive rate within [0, 1] — and
metrics.py:94 — non-negative thresholds). Under jit, value-dependent Python
asserts are impossible, so the checks are expressed with
``jax.experimental.checkify`` and the engine functionalizes the whole train
step when ``deploy_options.debug_asserts`` is on. Checkify adds a small
fixed overhead per step, so it is opt-in; the engine's NaN fail-fast on the
loss readback (free — the scalar comes back anyway) is always active.
'''

import jax.numpy as jnp
from jax.experimental import checkify

# Errors raised by our checks (user-data validation), excluding the
# index/NaN auto-instrumentation sets, which would slow every op down.
ERRORS = checkify.user_checks

_ENABLED = False


def enable(on=True):
    '''Globally arm the in-jit checks. The engine flips this from
    ``deploy_options.debug_asserts`` BEFORE tracing its step functions
    (the flag is read at trace time, not at run time).'''
    global _ENABLED
    _ENABLED = bool(on)


def enabled():
    return _ENABLED


def check_range(x, lo, hi, name):
    '''assert lo <= x <= hi elementwise (reference assert_on_min/max).'''
    if _ENABLED:
        checkify.check(jnp.all((x >= lo) & (x <= hi)),
                       f'{name} outside [{lo}, {hi}] '
                       '(min={mn}, max={mx})',
                       mn=jnp.min(x), mx=jnp.max(x))


def check_non_negative(x, name):
    '''assert x >= 0 elementwise (reference assert_on_weight).'''
    if _ENABLED:
        checkify.check(jnp.all(x >= 0),
                       f'{name} is negative (min={{mn}})', mn=jnp.min(x))


def check_finite(x, name):
    '''assert no NaN/Inf anywhere in x.'''
    if _ENABLED:
        checkify.check(jnp.all(jnp.isfinite(x)),
                       f'{name} contains NaN/Inf')


def checked(fn):
    '''Wrap a (possibly jitted) function so embedded checks raise
    ``checkify.JaxRuntimeError`` on failure while the call signature stays
    unchanged. No-op pass-through when checks are disabled.'''
    if not _ENABLED:
        return fn
    inner = checkify.checkify(fn, errors=ERRORS)

    def wrapper(*args, **kwargs):
        err, out = inner(*args, **kwargs)
        err.throw()
        return out

    return wrapper
