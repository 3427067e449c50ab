'''Explicit kernel-gate plumbing (config -> Engine -> trace-time routing).

The Pallas kernel gates (flatchain fused ConvChain, flatland tconv, fused
pool/tconv) decide *which kernel gets traced* inside a jitted step, so the
setting must be visible at trace time.  Earlier rounds routed this through
``os.environ`` mutation at Engine construction, which made two live Engines
with different gate configs fight over process-global state and hid the
config channel from review.  This module replaces that with an explicit
context:

- ``KernelGates`` is an immutable per-Engine gate set built from
  ``deploy_options`` (fields left ``None`` inherit the measured defaults).
- The Engine enters ``active(gates)`` inside each step function, so the
  gates are in scope exactly while that Engine's model traces — two Engines
  with opposing gates coexist in one process (tests/test_engine_e2e.py).
- ``DNNCA_*`` environment variables remain an *override-only* channel for
  A/B tooling (tools/ab_flatchain.sh, profile_step.py): a set env var beats
  both the context and the default; an unset one is invisible.

Defaults encode the real-chip A/B verdicts (RESULTS.md round 3): flatchain
and flat_tconv ON (+10.4% / +10% end-to-end on unet.yaml), pallas_tconv and
pallas_pool OFF (microbench wins, in-model losses to fusion barriers).

Reference analog: the reference has no kernel routing at all (Keras picks
cuDNN); this channel is TPU-native infrastructure.
'''
import contextlib
import contextvars
import dataclasses
import os
from typing import Optional

_DEFAULTS = {
    'flatchain': True,
    'flat_tconv': True,
    'pallas_tconv': False,
    'pallas_pool': False,
    'flatchain_im2col': True,
    'fused_aug': False,
    # banked warp fields: +16.7% end-to-end at steps_per_call 25, Dice
    # drift -0.0017 vs +-0.0008 seed noise (WARPBANK_DRIFT.md; RESULTS
    # round 5). Opt out per-Engine (warp_bank: false) or DNNCA_WARPBANK=0.
    'warp_bank': True,
}

_ENV = {
    'flatchain': 'DNNCA_FLATCHAIN',
    'flat_tconv': 'DNNCA_FLATTCONV',
    'pallas_tconv': 'DNNCA_PTCONV',
    'pallas_pool': 'DNNCA_PPOOL',
    'flatchain_im2col': 'DNNCA_FLATCHAIN_IM2COL',
    'fused_aug': 'DNNCA_FUSEDAUG',
    'warp_bank': 'DNNCA_WARPBANK',
}


@dataclasses.dataclass(frozen=True)
class KernelGates:
    '''Per-Engine kernel gate set; ``None`` fields inherit the default.'''
    flatchain: Optional[bool] = None
    flat_tconv: Optional[bool] = None
    pallas_tconv: Optional[bool] = None
    pallas_pool: Optional[bool] = None
    flatchain_im2col: Optional[bool] = None
    fused_aug: Optional[bool] = None
    warp_bank: Optional[bool] = None

    @classmethod
    def from_deploy_options(cls, deploy):
        '''Pop the gate keys out of a deploy_options dict (mutates it).'''
        return cls(**{f.name: deploy.pop(f.name, None)
                      for f in dataclasses.fields(cls)})


_active: contextvars.ContextVar = contextvars.ContextVar(
    'dnnca_kernel_gates', default=None)

_force_off: contextvars.ContextVar = contextvars.ContextVar(
    'dnnca_kernel_gates_force_off', default=False)


@contextlib.contextmanager
def active(gates):
    '''Make ``gates`` the trace-time gate set within the block.'''
    token = _active.set(gates)
    try:
        yield
    finally:
        _active.reset(token)


@contextlib.contextmanager
def pure_xla():
    '''Force EVERY kernel gate off within the block — beats env overrides.

    Used where a trace must contain no ``pallas_call`` at all: serving
    export (runs/export.py) lowers one StableHLO artifact for several
    platforms, and a captured Mosaic kernel makes the CPU lowering
    unloadable (``Only interpret mode is supported on CPU backend``).
    '''
    token = _force_off.set(True)
    try:
        yield
    finally:
        _force_off.reset(token)


def forced_off():
    '''True inside a ``pure_xla()`` block. Ungated (always-on) Pallas
    routes — the legacy stencil conv/chain, CCA, warp resample — must
    consult this in their eligibility checks, since they predate the
    named gates.'''
    return bool(_force_off.get())


def enabled(name):
    '''Resolve one gate: pure_xla force-off > env override > context >
    default.'''
    if _force_off.get():
        return False
    env = os.environ.get(_ENV[name])
    if env is not None and env != '':
        return env not in ('0', 'false', 'False')
    gates = _active.get()
    if gates is not None:
        val = getattr(gates, name)
        if val is not None:
            return bool(val)
    return _DEFAULTS[name]
