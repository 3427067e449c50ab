'''On-device, jit-compiled augmentation suite.

Reimplements the reference's tf.data augmentations (reference:
annotator/data.py:538-763) as pure JAX transforms over **batched** images
with explicit PRNG-key threading. The reference applies per-element host-side
maps; here every op is vmapped across the batch and the whole chain compiles
into the training step, so augmentation rides the TPU instead of the host CPU.

Ops and their reference semantics:
- random_crop (data.py:677-689): jittered center crop; offset noise is
  round-free float->int32 cast (truncation) of N(0, stddev), clipped.
- random_flip (data.py:620-625): left-right flip, p=0.5.
- random_contrast (data.py:586-609): one contrast factor per image applied to
  the feature channels only; label channel untouched.
- random_warp (data.py:628-644, :718-763): thin-plate-spline warp with
  n_points uniform control points and clipped Gaussian displacements, applied
  to all channels together (label stays aligned).
- random_intrachannelwarp (data.py:656-715): independent warps per channel
  group; ``paired`` channel groups share a warp.

``parse_augment_options`` mirrors the config-name resolution at
data.py:538-551 (YAML keys ``random_crop`` etc., with per-op defaults).
'''

import functools
from typing import Any, Dict, Sequence

import jax
import numpy as np
import jax.numpy as jnp

from ..ops import image as image_ops
from ..ops import warp as warp_ops


def random_crop(image, key, output_size=(512, 512), stddev=4, max_=6, min_=-6):
    '''Jittered center crop of one [H, W, C] image.'''
    diff = jnp.clip(
        (jax.random.normal(key, [2]) * stddev).astype(jnp.int32), min_, max_)
    h, w = image.shape[0], image.shape[1]
    th, tw = output_size
    off = jnp.array([(h - th) // 2, (w - tw) // 2], jnp.int32) + diff
    off = jnp.clip(off, 0, jnp.array([h - th, w - tw], jnp.int32))
    return image_ops.crop_to_bounding_box(image, off[0], off[1], th, tw)


# above this many jitter offsets per axis, masked static slices stop paying
# for themselves and the crop falls back to a vmapped dynamic_slice gather
_CROP_SELECT_LIMIT = 33


def _crop_select(images, off, output_size, y_range, x_range):
    '''Crop via masked static slices over the reachable offset window.

    The jitter is clipped to [min_, max_], so only ``max_ - min_ + 1``
    offsets per axis are ever reachable (13 at the defaults) — regardless of
    how much larger the source image is. Selecting among static slices keeps
    the crop vectorized with no gathers.
    '''
    b, h, w, c = images.shape
    th, tw = output_size
    out_y = jnp.zeros((b, th, w, c), images.dtype)
    for d in range(y_range[0], y_range[1] + 1):
        sel = (off[:, 0] == d)[:, None, None, None]
        out_y = jnp.where(sel, images[:, d:d + th], out_y)
    out = jnp.zeros((b, th, tw, c), images.dtype)
    for d in range(x_range[0], x_range[1] + 1):
        sel = (off[:, 1] == d)[:, None, None, None]
        out = jnp.where(sel, out_y[:, :, d:d + tw], out)
    return out


def _crop_gather(images, off, output_size):
    '''Crop via vmapped dynamic_slice (XLA gather) — slower on TPU but safe
    for arbitrarily wide jitter windows.'''
    th, tw = output_size
    c = images.shape[-1]
    return jax.vmap(
        lambda img, o: jax.lax.dynamic_slice(img, (o[0], o[1], 0),
                                             (th, tw, c)))(images, off)


def random_crop_batch(images, key, output_size=(512, 512), stddev=4, max_=6,
                      min_=-6):
    '''Batched jittered center crop; sampling semantics identical to
    ``random_crop`` (truncated-normal integer jitter, reference
    data.py:677-689).

    Strategy: masked static slices over the reachable jitter window when it
    is small (the normal case — offsets only span ``max_ - min_ + 1``
    values), a vmapped ``dynamic_slice`` otherwise, so an exotic config
    (e.g. random_crop applied second, at full-resolution inputs, with a huge
    jitter) can never statically unroll H*W branches.
    '''
    b, h, w, c = images.shape
    th, tw = output_size
    diff = jnp.clip(
        (jax.random.normal(key, [b, 2]) * stddev).astype(jnp.int32),
        int(min_), int(max_))
    base = jnp.array([(h - th) // 2, (w - tw) // 2], jnp.int32)
    off = jnp.clip(base[None, :] + diff, 0,
                   jnp.array([h - th, w - tw], jnp.int32))

    y_range = (max(0, (h - th) // 2 + int(min_)),
               min(h - th, (h - th) // 2 + int(max_)))
    x_range = (max(0, (w - tw) // 2 + int(min_)),
               min(w - tw, (w - tw) // 2 + int(max_)))
    n_y = y_range[1] - y_range[0] + 1
    n_x = x_range[1] - x_range[0] + 1
    if max(n_y, n_x) > _CROP_SELECT_LIMIT:
        return _crop_gather(images, off, output_size)
    return _crop_select(images, off, output_size, y_range, x_range)


def random_flip(image, key):
    return image_ops.random_flip_left_right(key, image)


def random_contrast(image, key, target_channels, lower=0.8, upper=1.2):
    return image_ops.random_contrast(key, image, lower, upper, target_channels)


def _warp_points(key, n_images, n_points, size, stddev, max_diff):
    k1, k2 = jax.random.split(key)
    raw = jax.random.uniform(
        k1, [n_images, n_points, 2], minval=0.0, maxval=float(size))
    diff = jax.random.normal(k2, [n_images, n_points, 2]) * stddev
    diff = jnp.clip(diff, -float(max_diff), float(max_diff))
    return raw, raw + diff


def random_warp_batch(images, key, n_points=100, max_diff=5, stddev=2.0,
                      process_in_batch=None, method='two_pass',
                      flow_grid_stride=4):
    '''Warp a batch [B, H, W, C]; each image gets its own control points.

    ``process_in_batch`` is accepted for config parity (the reference uses it
    to batch host-side work, data.py:628-644); on TPU the whole batch is
    always processed at once. The default 'two_pass' resample avoids TPU
    gathers (see ops.warp.dense_image_warp_twopass) and the default stride-4
    coarse flow grid cuts the spline-evaluation matmuls 16x (sub-0.15 px
    interpolation error at the production control-point density); pass
    method='exact' for gather-based TFA semantics.
    '''
    del process_in_batch
    b, h, w, _ = images.shape
    src, dst = _warp_points(key, b, n_points, w, stddev, max_diff)
    return warp_ops.sparse_image_warp(
        images, src, dst, method=method,
        max_displacement=int(np.ceil(max_diff)) + 3, clamp_flow=True,
        flow_grid_stride=flow_grid_stride if method == 'two_pass' else 1)


def build_warp_bank(key, n_bank, out_size, n_points=100, max_diff=5,
                    stddev=2.0, process_in_batch=None, method='two_pass',
                    flow_grid_stride=4, chunk=8):
    '''Precompute a bank of ``n_bank`` coarse warp-flow fields.

    The ``warp_bank`` kernel gate (RESULTS.md round 5): random_warp's
    per-step device cost is dominated by the TPS solve (f32[B,103,103]
    batched LU + trsm — inherently serial; the batched hoist across scan
    steps was refuted, RESULTS.md round 5) plus three kernel-matrix
    evaluations. None of that work depends on the images — only on the
    random control points — so a bank of flow fields can be solved ONCE at
    engine start and each train step gathers B random fields instead
    (random_warp_batch_banked), applying random mirror symmetries for 4x
    effective diversity. The control-point distribution (uniform locations,
    isotropic clipped-Gaussian displacements; reference data.py:718-763) is
    mirror-invariant, so flipped fields are exactly in-distribution.

    Semantics: warps are drawn from ``4 * n_bank`` effective fields instead
    of fresh per step — a distribution approximation of the reference's
    per-sample warp (data.py:628-644), gated OFF by default; flipping the
    default requires the accuracy evidence protocol (cf. BF16_DRIFT.md).

    Draw distribution matches ``random_warp_batch`` exactly (_warp_points
    with size = crop width); solves run in ``chunk``-sized batches because
    XLA:TPU's batched LU scales super-linearly in batch (RESULTS round 5).
    '''
    del process_in_batch
    if method != 'two_pass':
        raise ValueError('warp_bank requires the two_pass warp method')
    th, tw = int(out_size[0]), int(out_size[1])
    md = int(np.ceil(max_diff)) + 3
    chunk = max(1, int(chunk))
    n_chunks = -(-int(n_bank) // chunk)
    n_pad = n_chunks * chunk
    src, dst = _warp_points(key, n_pad, n_points, tw, stddev, max_diff)
    src = src.reshape(n_chunks, chunk, n_points, 2)
    dst = dst.reshape(n_chunks, chunk, n_points, 2)

    def solve_chunk(sd):
        return warp_ops.coarse_twopass_flow(
            sd[0], sd[1], (th, tw), max_displacement=md,
            flow_grid_stride=int(flow_grid_stride))

    flows = jax.jit(lambda s, d: jax.lax.map(solve_chunk, (s, d)))(src, dst)
    flows = flows.reshape(n_pad, *flows.shape[2:])[:int(n_bank)]
    return dict(flows=jax.block_until_ready(flows),
                stride=int(flow_grid_stride), max_displacement=md,
                out_size=(th, tw))


def random_warp_batch_banked(images, key, bank):
    '''Banked ``random_warp_batch``: gather B precomputed coarse flow fields
    and apply per-image random mirror symmetries (see build_warp_bank), then
    the standard upsample + two-pass resample. No per-step spline solve.'''
    b = images.shape[0]
    flows = bank['flows']
    k_idx, k_ud, k_lr = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, [b], 0, flows.shape[0])
    fl = flows[idx]
    ud = jax.random.bernoulli(k_ud, shape=(b,))[:, None, None, None]
    lr = jax.random.bernoulli(k_lr, shape=(b,))[:, None, None, None]
    # vertical mirror: reverse rows, negate the y displacement
    fl = jnp.where(
        ud, jnp.stack([-fl[:, ::-1, :, 0], fl[:, ::-1, :, 1]], axis=-1), fl)
    # horizontal mirror: reverse columns, negate the x displacement
    fl = jnp.where(
        lr, jnp.stack([fl[:, :, ::-1, 0], -fl[:, :, ::-1, 1]], axis=-1), fl)
    return warp_ops.warp_with_coarse_flow(
        images, fl, max_displacement=bank['max_displacement'],
        flow_grid_stride=bank['stride'])


def random_intrachannelwarp_batch(images, key, n_points=100, max_diff=5,
                                  stddev=2.0, paired=((0, -1),)):
    '''Warp channel groups independently (misalignment experiment op).'''
    b, h, w, c = images.shape
    paired = [
        [ch if ch >= 0 else c + ch for ch in group] for group in paired]
    grouped = set(ch for group in paired for ch in group)
    groups = list(paired) + [[ch] for ch in range(c) if ch not in grouped]

    out_channels = [None] * c
    keys = jax.random.split(key, len(groups))
    for gkey, group in zip(keys, groups):
        sub = images[..., jnp.array(group)]
        src, dst = _warp_points(gkey, b, n_points, w, stddev, max_diff)
        warped = warp_ops.sparse_image_warp(sub, src, dst)
        for j, ch in enumerate(group):
            out_channels[ch] = warped[..., j]
    return jnp.stack(out_channels, axis=-1)


# per-element ops get vmapped over the batch; batch ops run as-is
_PER_ELEMENT = {
    'random_flip': random_flip,
    'random_contrast': random_contrast,
    'random_hue': None,  # greyscale data; accepted but rejected at parse time
}
_BATCH = {
    'random_crop': random_crop_batch,
    'random_warp': random_warp_batch,
    'random_intrachannelwarp': random_intrachannelwarp_batch,
}


def parse_augment_options(augment_options: Dict[str, Any],
                          slice_types: Sequence[str],
                          output_size=(256, 256)):
    '''Resolve config augment specs to an ordered [(name, options)] list with
    the reference's per-op defaults merged in (data.py:88-93).'''
    if augment_options is None:
        augment_options = {'random_crop': {}}
    defaults = {
        'random_crop': dict(output_size=tuple(output_size)),
        'random_flip': {},
        'random_contrast': dict(
            target_channels=list(range(len(slice_types[:-1])))),
        'random_warp': {},
    }
    resolved = []
    for name, conf in augment_options.items():
        if name not in _PER_ELEMENT and name not in _BATCH:
            raise KeyError(f'Unknown augmentation {name!r}')
        if name == 'random_hue':
            raise NotImplementedError('random_hue needs RGB data')
        merged = dict(defaults.get(name, {}))
        merged.update(conf or {})
        if 'output_size' in merged:
            merged['output_size'] = tuple(merged['output_size'])
        if 'paired' in merged:
            merged['paired'] = tuple(map(tuple, merged['paired']))
        if merged.get('target_channels') is not None:
            merged['target_channels'] = tuple(merged['target_channels'])
        resolved.append((name, merged))
    return resolved


_FUSED_PATTERN = ('random_crop', 'random_flip', 'random_contrast',
                  'random_warp')


def _fused_chain_eligible(methods):
    '''The fused path handles exactly the production chain
    crop -> flip -> contrast -> two_pass warp.'''
    if tuple(n for n, _ in methods) != _FUSED_PATTERN:
        return False
    # The fused contrast stage builds a channel mask from target_channels;
    # None (= adjust ALL channels, incl. the label lane riding along) and
    # empty sequences stay on the composed path.
    if not (methods[2][1] or {}).get('target_channels'):
        return False
    warp_o = methods[3][1]
    return warp_o.get('method', 'two_pass') == 'two_pass'


def _window_mean(images, off, th, tw):
    '''Exact per-channel mean over the [oy:oy+th, ox:ox+tw] crop window of
    each image — two prefix-sum passes plus per-image corner-band slices, so
    the cropped image itself never materializes. f32 prefix-sum rounding at
    these sizes (~7e4 running sums) perturbs the mean by ~1e-7 relative.'''
    b, h, w, c = images.shape
    csy = jnp.cumsum(images, axis=1)
    csy = jnp.concatenate([jnp.zeros_like(csy[:, :1]), csy], axis=1)

    def band(cs, oy):
        top = jax.lax.dynamic_slice(cs, (oy, 0, 0), (1, w, c))
        bot = jax.lax.dynamic_slice(cs, (oy + th, 0, 0), (1, w, c))
        return (bot - top)[0]

    rows = jax.vmap(band)(csy, off[:, 0])            # [B, W, C]
    csx = jnp.cumsum(rows, axis=1)
    csx = jnp.concatenate([jnp.zeros_like(csx[:, :1]), csx], axis=1)

    def wsum(cs, ox):
        lo = jax.lax.dynamic_slice(cs, (ox, 0), (1, c))
        hi = jax.lax.dynamic_slice(cs, (ox + tw, 0), (1, c))
        return (hi - lo)[0]

    total = jax.vmap(wsum)(csx, off[:, 1])           # [B, C]
    return total / float(th * tw)


def _chain_draws(images_shape, key, methods):
    '''Realize the production chain's random draws for one batch/key:
    (crop offsets [B,2] i32, flips [B] bool, contrast factors [B],
    warp src/dst [B,N,2]). Replicates the composed ops' key threading
    exactly (split per op in chain order; per-element ops split again
    across the batch), so fused and composed paths — and the f64 oracle
    in tools/chip_fusedaug_parity.py — realize the same augmentation for
    the same key.'''
    crop_o, _flip_o, con_o, warp_o = (dict(o or {}) for _, o in methods)
    b, h_in, w_in = images_shape[0], images_shape[1], images_shape[2]
    th, tw = crop_o['output_size']
    stddev = crop_o.get('stddev', 4)
    mx, mn = int(crop_o.get('max_', 6)), int(crop_o.get('min_', -6))

    keys = jax.random.split(key, 4)
    diff = jnp.clip(
        (jax.random.normal(keys[0], [b, 2]) * stddev).astype(jnp.int32),
        mn, mx)
    base = jnp.array([(h_in - th) // 2, (w_in - tw) // 2], jnp.int32)
    off = jnp.clip(base[None, :] + diff, 0,
                   jnp.array([h_in - th, w_in - tw], jnp.int32))
    flip = jax.vmap(lambda k: jax.random.bernoulli(k))(
        jax.random.split(keys[1], b))
    lower = con_o.get('lower', 0.8)
    upper = con_o.get('upper', 1.2)
    factors = jax.vmap(
        lambda k: jax.random.uniform(k, (), minval=lower, maxval=upper))(
            jax.random.split(keys[2], b))
    src, dst = _warp_points(
        keys[3], b, warp_o.get('n_points', 100), tw,
        warp_o.get('stddev', 2.0), warp_o.get('max_diff', 5))
    return off, flip, factors, src, dst


def _apply_fused_chain(images, key, methods):
    '''One-shot crop+flip+contrast+warp (see build_augment_fn).

    Random draws come from _chain_draws (identical to the composed ops').
    The composition identities:
      - contrast commutes with the crop/flip selection and with the convex
        bilinear resample exactly, given the crop-window mean -> applied to
        the full window up front (fuses into the normalize pass);
      - crop-then-flip == flip-the-window-then-crop at the mirrored offset
        ``w_in - w_out - ox`` -> one reverse-select, no second materialize;
      - the crop's integer offsets ride the Pallas resample's dynamic slice
        bases (ops/warp.py:sparse_image_warp_cropped).
    '''
    crop_o, flip_o, con_o, warp_o = (dict(o or {}) for _, o in methods)
    del flip_o
    b, h_in, w_in, c = images.shape
    th, tw = crop_o['output_size']
    off, flip, factors, src, dst = _chain_draws(images.shape, key, methods)

    means = _window_mean(images, off, th, tw)
    tmask = jnp.zeros((c,), bool).at[
        jnp.asarray(con_o['target_channels'])].set(True)
    m = means[:, None, None, :]
    adjusted = (images - m) * factors[:, None, None, None] + m
    images = jnp.where(tmask[None, None, None, :], adjusted, images)

    images = jnp.where(flip[:, None, None, None],
                       images[:, :, ::-1, :], images)
    ox = jnp.where(flip, (w_in - tw) - off[:, 1], off[:, 1])
    off_eff = jnp.stack([off[:, 0], ox], axis=1).astype(jnp.int32)

    max_diff = warp_o.get('max_diff', 5)
    return warp_ops.sparse_image_warp_cropped(
        images, src, dst, off_eff, out_size=(th, tw),
        max_displacement=int(np.ceil(max_diff)) + 3, clamp_flow=True,
        flow_grid_stride=warp_o.get('flow_grid_stride', 4))


def build_augment_fn(methods, warp_bank=None):
    '''Compose an ordered [(name, options)] list into one batched transform
    ``fn(images [B,H,W,C] float, key) -> images``. jit-safe.

    When the list is exactly the production chain (crop, flip, contrast,
    two-pass warp), the ``fused_aug`` kernel gate routes it through one
    crop-fused Pallas resample instead of four materialized stages — same
    draws, same semantics (see _apply_fused_chain).

    ``warp_bank`` (built by build_warp_bank under the ``warp_bank`` gate;
    threaded in by the Engine) replaces random_warp's per-step spline solve
    with a gather from the precomputed field bank when the image shape at
    that point in the chain matches the bank.'''

    def apply_all(images, key):
        if _fused_chain_eligible(methods):
            from ..ops import gates as gates_lib
            crop_o = methods[0][1]
            th, tw = crop_o['output_size']
            md = int(np.ceil(methods[3][1].get('max_diff', 5))) + 3
            if (gates_lib.enabled('fused_aug')
                    and warp_ops.fused_crop_warp_ok(
                        images.shape, (th, tw), md)):
                return _apply_fused_chain(images, key, methods)
        keys = jax.random.split(key, max(len(methods), 1))
        for (name, options), op_key in zip(methods, keys):
            if (name == 'random_warp' and warp_bank is not None
                    and options.get('method', 'two_pass') == 'two_pass'
                    and tuple(images.shape[1:3]) == warp_bank['out_size']):
                images = random_warp_batch_banked(images, op_key, warp_bank)
            elif name in _BATCH:
                images = _BATCH[name](images, op_key, **options)
            else:
                fn = functools.partial(_PER_ELEMENT[name], **options)
                elem_keys = jax.random.split(op_key, images.shape[0])
                images = jax.vmap(fn)(images, elem_keys)
        return images

    return apply_all


def to_feature_label(images, slice_types):
    '''Split [B, H, W, C] into (x [B,H,W,C-1], y [B,H,W]) by the label channel
    (reference data.py:766-788).'''
    slice_types = list(slice_types)
    label_index = slice_types.index('label')
    feature_indices = [i for i in range(len(slice_types)) if i != label_index]
    x = images[..., jnp.array(feature_indices)]
    y = images[..., label_index]
    return x, y
