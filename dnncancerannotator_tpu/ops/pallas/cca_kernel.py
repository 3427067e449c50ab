'''Pallas TPU kernel: connected-components label propagation.

The region-metric evaluation runs CCA over up to batch x 100 thresholded
masks (reference behavior: tfa.image.connected_components per threshold,
annotator/utils/metrics.py:126-139). The XLA implementation (ops/cca.py)
converges in a `lax.while_loop` of segmented run-min sweeps, but every
iteration round-trips the label planes through HBM — the dominant cost of
evaluation at the 100-threshold PR-curve operating point.

This kernel keeps the whole propagation loop in VMEM: one program per mask
instance, run-min sweeps implemented as doubling-shift segmented scans —
sublane-direction shifts as static concatenations, lane-direction shifts as
rolls with wrap masking (Mosaic has no transpose). Iterates to convergence
on-chip. Output is the converged raw min-index labeling; the cheap
compaction to 1..n stays in XLA (it needs a gather, which the VPU cannot
vectorize).

Semantics match ops/cca.py exactly (same fixed point: per-component minimum
row-major flat index on mask pixels, sentinel H*W elsewhere).
'''

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FILL = 2 ** 30  # identity for min on in-range flat indices


def _shifted(x, shift, axis, fill, reverse):
    '''x shifted by ``shift`` along ``axis`` (toward higher indices when not
    reverse), vacated positions filled with ``fill``.'''
    n = x.shape[axis]
    if axis == 0:  # sublanes: static slice + concat
        pad = jnp.full_like(x[:shift] if not reverse else x[:shift], fill)
        if not reverse:
            return jnp.concatenate([pad, x[:-shift]], axis=0)
        return jnp.concatenate([x[shift:], pad], axis=0)
    # lanes: roll + wrap mask (no sub-128 static lane slicing in Mosaic)
    amount = shift if not reverse else n - shift
    rolled = pltpu.roll(x, amount, axis=1)
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    wrap = (col < shift) if not reverse else (col >= n - shift)
    return jnp.where(wrap, fill, rolled)


def _seg_min(vals, resets, axis, reverse):
    '''Segmented running min along ``axis`` (Hillis-Steele doubling).

    vals: int32 plane (min identity _FILL outside segments);
    resets: int32 0/1 plane (1 = segment boundary at this element).
    '''
    n = vals.shape[axis]
    m, r = vals, resets
    shift = 1
    while shift < n:
        m_prev = _shifted(m, shift, axis, _FILL, reverse)
        r_prev = _shifted(r, shift, axis, 1, reverse)
        m = jnp.where(r > 0, m, jnp.minimum(m_prev, m))
        r = jnp.maximum(r_prev, r)
        shift *= 2
    return m


def _run_min(labels, mask_i32, axis):
    '''Min label over each contiguous run (both directions) along axis.'''
    resets = 1 - mask_i32
    vals = jnp.where(mask_i32 > 0, labels, _FILL)
    fwd = _seg_min(vals, resets, axis, reverse=False)
    bwd = _seg_min(vals, resets, axis, reverse=True)
    return jnp.where(mask_i32 > 0, jnp.minimum(fwd, bwd), labels)


def _kernel(mask_ref, out_ref, *, h, w, block):
    '''``block`` mask planes per program: enough parallel 2D work to fill the
    VPU pipeline (a single 128x128 plane is only 16 tiles per stage).'''
    sentinel = jnp.int32(h * w)
    iota = (lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + lax.broadcasted_iota(jnp.int32, (h, w), 1))
    masks = [(mask_ref[i] != 0).astype(jnp.int32) for i in range(block)]
    init = tuple(jnp.where(m > 0, iota, sentinel) for m in masks)

    def body(state):
        labels, _ = state
        new = []
        for lab, m in zip(labels, masks):
            x = _run_min(lab, m, axis=1)   # along rows (lanes)
            x = _run_min(x, m, axis=0)     # along columns (sublanes)
            new.append(x)
        changed = jnp.bool_(False)  # scalar OR chain (no 1D vectors on TPU)
        for a, b in zip(new, labels):
            changed = jnp.logical_or(changed, jnp.any(a != b))
        return tuple(new), changed

    labels, _ = lax.while_loop(
        lambda s: s[1], body, (init, jnp.bool_(True)))
    for i in range(block):
        out_ref[i] = jnp.where(masks[i] > 0, labels[i], sentinel)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cca_raw_labels_pallas(masks, interpret=False):
    '''Converged raw min-index labels for a batch of masks.

    Args:
        masks: [N, H, W] bool.

    Returns:
        [N, H, W] int32: per-component min flat index on mask pixels,
        H*W on background (same fixed point as ops/cca.py before
        compaction).
    '''
    n, h, w = masks.shape
    # ~6 int32 working planes per instance (labels, shifted copies, in/out);
    # keep the per-program footprint well under the 16MB scoped-vmem limit
    per_plane = 24 * h * w
    block = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * per_plane < 10 * 1024 * 1024:
            block = cand
            break
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, block=block),
        grid=(n // block,),
        in_specs=[pl.BlockSpec((block, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(masks.astype(jnp.int8))
    return out


def supported(shape):
    '''Per-program VMEM footprint check ([H, W] int32 working planes).'''
    n, h, w = shape
    return 6 * h * w * 4 < 8 * 1024 * 1024 and h >= 8 and w >= 128
