'''Connected-components labeling, jit-compatible.

The reference relies on ``tfa.image.connected_components`` (C++ union-find,
4-connectivity) for its region-based metrics (reference:
annotator/utils/metrics.py:126-139). There is no XLA library op, so this is a
TPU-native reimplementation: iterative **min-label propagation with pointer
jumping** inside a ``lax.while_loop``. Every step is a stencil min (VPU) plus
two gathers; convergence is data-dependent but bounded, and the whole thing
jits, vmaps (over thresholds / batch), and shards.

Output contract matches what the metrics need from tfa: each connected region
of the boolean mask gets a distinct positive id (compacted to 1..n), 0 is
background, with 4-connectivity.
'''

import jax
import jax.numpy as jnp
from jax import lax


def _neighbor_min(labels, sentinel):
    '''Min over 4-neighborhood (cross), padding with sentinel.'''
    up = jnp.concatenate([labels[1:, :], jnp.full_like(labels[:1, :], sentinel)], axis=0)
    down = jnp.concatenate([jnp.full_like(labels[:1, :], sentinel), labels[:-1, :]], axis=0)
    left = jnp.concatenate([labels[:, 1:], jnp.full_like(labels[:, :1], sentinel)], axis=1)
    right = jnp.concatenate([jnp.full_like(labels[:, :1], sentinel), labels[:, :-1]], axis=1)
    return jnp.minimum(jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)), labels)


def _run_min(labels, mask, axis, sentinel):
    '''Segmented min along ``axis``: every pixel takes the min label of its
    contiguous True-run (both directions), via an O(log n) associative scan.
    One sweep spreads labels across entire straight runs — far fewer
    iterations than 1-pixel stencil propagation (turn count of the component
    geometry instead of its diameter).'''
    def combine(a, b):
        am, ar = a
        bm, br = b
        return jnp.where(br, bm, jnp.minimum(am, bm)), ar | br

    init = (labels, ~mask)
    fwd, _ = lax.associative_scan(combine, init, axis=axis)
    bwd, _ = lax.associative_scan(combine, init, axis=axis, reverse=True)
    return jnp.where(mask, jnp.minimum(fwd, bwd), sentinel)


def connected_components(mask):
    '''Label 4-connected regions of a boolean mask.

    Args:
        mask: [H, W] bool array.

    Returns:
        labels: [H, W] int32, 0 = background, regions labeled 1..n in
            first-pixel (row-major) order.
        n_regions: scalar int32 count of regions.
    '''
    h, w = mask.shape
    hw = h * w
    sentinel = jnp.int32(hw)
    idx = lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        lax.broadcasted_iota(jnp.int32, (h, w), 1)
    init = jnp.where(mask, idx, sentinel)

    # Row/column run-min sweeps only: each sweep spreads labels across whole
    # straight runs, converging in the number of "turns" of the component
    # geometry (a handful for real lesion masks). Pointer jumping would give
    # O(log) worst-case convergence but costs a full gather per step — slow
    # on TPU, and under vmap a conditional jump executes unconditionally —
    # measured 3x slower overall at the 100-threshold eval operating point.
    def body(state):
        labels, _ = state
        new = _run_min(labels, mask, 1, sentinel)   # spread along rows
        new = _run_min(new, mask, 0, sentinel)      # spread along columns
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = lax.while_loop(cond, body, (init, jnp.bool_(True)))

    # Compact to 1..n: a pixel is a root iff its label equals its own index.
    flat = labels.reshape(-1)
    is_root = (flat == jnp.arange(hw, dtype=jnp.int32)) & mask.reshape(-1)
    ranks = jnp.cumsum(is_root.astype(jnp.int32))  # 1-based at root positions
    compact = jnp.where(
        mask.reshape(-1), ranks[jnp.clip(flat, 0, hw - 1)], 0).reshape(h, w)
    n_regions = ranks[-1]
    return compact, n_regions


def _compact_from_raw(raw, mask):
    '''Compact converged raw min-index labels to 1..n (shared fixed point
    with connected_components).'''
    h, w = mask.shape
    hw = h * w
    flat = raw.reshape(-1)
    is_root = (flat == jnp.arange(hw, dtype=jnp.int32)) & mask.reshape(-1)
    ranks = jnp.cumsum(is_root.astype(jnp.int32))
    compact = jnp.where(
        mask.reshape(-1), ranks[jnp.clip(flat, 0, hw - 1)], 0).reshape(h, w)
    return compact, ranks[-1]


def _pallas_cca_ok(shape):
    '''Fused Pallas propagation with tile-aligned planes (the roll-based
    lane scan requires the lane dim to be a multiple of 128). Allowed on a
    single TPU device, or on multi-device hosts when the caller pins the
    computation to one chip (mesh_lib.pallas_single_device — the region
    metrics path does).'''
    try:
        from . import gates
        if gates.forced_off():
            return False
        from ..parallel import mesh as mesh_lib
        n, h, w = shape
        if jax.default_backend() == 'cpu' and not mesh_lib.pallas_interpret():
            return False
        if jax.device_count() != 1 and \
                not mesh_lib.pallas_single_device_active():
            return False
        from .pallas.cca_kernel import supported
        # eligibility is judged on the tile-aligned (padded) plane the
        # wrapper actually hands the kernel
        return supported((n, h + (-h) % 8, w + (-w) % 128))
    except Exception:
        return False


def connected_components_batch(masks):
    '''Batched CCA over a leading batch/threshold axis ([N, H, W] bool).

    Uses the VMEM-resident Pallas propagation kernel when eligible (see
    ops/pallas/cca_kernel.py); falls back to the vmapped XLA while_loop.
    Planes are zero-padded to the (8, 128) f32 tile so any eval resolution
    takes the kernel (the roll-based lane scan needs lane % 128 == 0);
    padding is background, so region structure and the row-major root
    numbering are unchanged, and the compact labels are cropped back.
    '''
    if _pallas_cca_ok(masks.shape):
        from ..parallel import mesh as mesh_lib
        from .pallas.cca_kernel import cca_raw_labels_pallas
        n, h, w = masks.shape
        ph, pw = (-h) % 8, (-w) % 128
        padded = masks if not (ph or pw) else jnp.pad(
            masks, ((0, 0), (0, ph), (0, pw)))
        raw = cca_raw_labels_pallas(
            padded, interpret=mesh_lib.pallas_interpret())
        compact, count = jax.vmap(_compact_from_raw)(raw, padded)
        return compact[:, :h, :w], count
    return jax.vmap(connected_components)(masks)
