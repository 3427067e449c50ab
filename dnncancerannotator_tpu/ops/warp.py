'''Sparse (control-point) image warping in pure JAX.

TPU-native equivalent of ``tfa.image.sparse_image_warp`` (the random-warp
augmentation at reference annotator/data.py:718-763): a polyharmonic
(thin-plate, order 2) spline interpolates a dense flow field from control
point displacements, then the image is bilinearly resampled at
``grid - flow``.

The spline solve is a small batched dense linear system ((N+3) x (N+3) per
image) and the flow evaluation is a [H*W, N] kernel-matrix matmul — both land
on the MXU. Resampling is a bilinear gather (``map_coordinates`` order 1 with
edge clamping, matching TFA's clamped bilinear interpolation).
'''

import functools

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from ..parallel import mesh as mesh_lib


def _phi_order2(r2):
    '''Thin-plate kernel on squared distances: r^2 log(r) = 0.5 r^2 log(r^2).'''
    eps = 1e-10
    return 0.5 * r2 * jnp.log(jnp.maximum(r2, eps))


def _solve_spline(train_points, train_values, regularization=0.0):
    '''Fit polyharmonic spline weights.

    Args:
        train_points: [N, 2] control point locations.
        train_values: [N, D] values at the control points.

    Returns:
        (w [N, D], v [3, D]) radial and affine weights.
    '''
    n = train_points.shape[0]
    d2 = jnp.sum(
        (train_points[:, None, :] - train_points[None, :, :]) ** 2, axis=-1)
    a = _phi_order2(d2)
    if regularization:
        a = a + regularization * jnp.eye(n, dtype=a.dtype)
    ones = jnp.ones((n, 1), train_points.dtype)
    b = jnp.concatenate([ones, train_points], axis=1)  # [N, 3]

    top = jnp.concatenate([a, b], axis=1)                      # [N, N+3]
    bottom = jnp.concatenate(
        [b.T, jnp.zeros((3, 3), a.dtype)], axis=1)             # [3, N+3]
    lhs = jnp.concatenate([top, bottom], axis=0)               # [N+3, N+3]
    rhs = jnp.concatenate(
        [train_values, jnp.zeros((3, train_values.shape[1]), a.dtype)], axis=0)
    sol = jnp.linalg.solve(lhs, rhs)
    return sol[:n], sol[n:]


def _evaluate_spline(query_points, train_points, w, v):
    '''Evaluate the fitted spline at query points ([M, 2] -> [M, D]).'''
    d2 = jnp.sum(
        (query_points[:, None, :] - train_points[None, :, :]) ** 2, axis=-1)
    rbf = _phi_order2(d2) @ w                                   # [M, D]
    ones = jnp.ones((query_points.shape[0], 1), query_points.dtype)
    affine = jnp.concatenate([ones, query_points], axis=1) @ v  # [M, D]
    return rbf + affine


def dense_image_warp(image, flow):
    '''Resample ``image`` at ``grid - flow`` (bilinear, edge-clamped).

    Args:
        image: [B, H, W, C].
        flow: [B, H, W, 2] (dy, dx) displacement.
    '''
    b, h, w, c = image.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def warp_one(img, fl):
        qy = gy - fl[..., 0]
        qx = gx - fl[..., 1]

        def per_channel(ch):
            return map_coordinates(ch, [qy, qx], order=1, mode='nearest')

        return jax.vmap(per_channel, in_axes=-1, out_axes=-1)(img)

    return jax.vmap(warp_one)(image, flow)


def dense_image_warp_twopass(image, flow, max_displacement=8):
    '''Bilinear resample via two axis-separated shift-select passes.

    XLA gathers are slow on TPU (~13ms for [8,256,256,6]); for the bounded,
    smooth flows of warp *augmentation* the resample can instead be built
    from static shifted slices blended with per-pixel masks — pure VPU work.

    The vertical pass resamples rows exactly at ``qy``; the horizontal pass
    then resamples the result at ``qx``, which evaluates ``qy`` at the
    source column instead of the target column. For spline flows (hundreds of
    control points over a 256px image, |flow| <= max_diff) that composition
    error is O(|d flow_y/dx| * |flow_x|) ~ well under a pixel — negligible
    against the randomness of the augmentation itself. Use
    ``dense_image_warp`` when exact gather semantics are required.

    Flow is clamped to ±max_displacement (static) to bound the shift range.
    '''
    b, h, w, c = image.shape
    d = int(max_displacement)
    flow = jnp.clip(flow, -d, d)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def pass_axis(img, q, axis):
        n = img.shape[axis + 1]  # spatial size along axis (after batch)
        base = gy if axis == 0 else gx
        q0 = jnp.floor(q)
        r = (q - q0)[..., None]                     # [B,h,w,1]
        shift = (q0 - base).astype(jnp.int32)       # in [-d-1, d]
        pad = d + 2
        pad_cfg = [(0, 0), (0, 0), (0, 0), (0, 0)]
        pad_cfg[axis + 1] = (pad, pad)
        padded = jnp.pad(img, pad_cfg, mode='edge')
        out = jnp.zeros_like(img)
        for s in range(-d - 1, d + 1):
            if axis == 0:
                lo = padded[:, pad + s:pad + s + h, :, :]
                hi = padded[:, pad + s + 1:pad + s + 1 + h, :, :]
            else:
                lo = padded[:, :, pad + s:pad + s + w, :]
                hi = padded[:, :, pad + s + 1:pad + s + 1 + w, :]
            val = lo * (1.0 - r) + hi * r
            out = jnp.where((shift == s)[..., None], val, out)
        return out

    qy = jnp.clip(gy[None] - flow[..., 0], 0.0, h - 1.0)
    qx = jnp.clip(gx[None] - flow[..., 1], 0.0, w - 1.0)
    out = pass_axis(image, qy, axis=0)
    out = pass_axis(out, qx, axis=1)
    return out


def _flow_from_points(train_pts, train_vals, gy, gx, scale, regularization,
                      clamp, d, two_pass):
    '''One image's (coarse) spline flow [hc, wc, 2] from pixel-space control
    points; shared by sparse_image_warp and the warp-bank precompute
    (coarse_twopass_flow) so both realize bit-identical flows.'''
    hc, wc = gy.shape
    tp = train_pts.astype(jnp.float32) * scale
    wgt, v = _solve_spline(tp, train_vals, regularization)
    grid = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1) * scale
    fl = _evaluate_spline(grid, tp, wgt, v).reshape(hc, wc, 2)
    if clamp:
        fl = jnp.clip(fl, -d, d)
    if two_pass:
        # First-order composition correction: the horizontal pass reads
        # the vertically-resampled image at source column x' = qx(y, x),
        # so the vertical pass must use the flow of the *target* column
        # x ~ x' + flow_x(y, x'). Evaluate flow_y at those shifted points
        # (one more spline matmul); residual error is second-order
        # (<0.1 px for the augmentation's flow magnitudes).
        qpts = jnp.stack(
            [gy.reshape(-1), (gx + fl[..., 1]).reshape(-1)],
            axis=-1) * scale
        fy = _evaluate_spline(qpts, tp, wgt, v)[:, 0].reshape(hc, wc)
        fl = jnp.stack([fy, fl[..., 1]], axis=-1)
    return fl


def _interp_matrix(n_fine, stride, n_coarse):
    '''Exact 1D bilinear-upsampling matrix [n_fine, n_coarse] for coarse
    samples at coordinates ``i * stride`` (built host-side; static shapes).'''
    import numpy as np
    m = np.zeros((n_fine, n_coarse), np.float32)
    for i in range(n_fine):
        t = i / stride
        i0 = int(np.floor(t))
        f = t - i0
        m[i, i0] += 1.0 - f
        if f > 0.0:
            m[i, i0 + 1] += f
    return jnp.asarray(m)


def _upsample_flow(flow, h, w, stride):
    '''Bilinearly upsample a coarse flow [B, Hc, Wc, 2] to [B, h, w, 2].

    Two tiny interpolation matmuls (MXU) — exact bilinear weights, no
    jax.image.resize half-pixel-center semantics to reason about.
    '''
    hc, wc = flow.shape[1], flow.shape[2]
    my = _interp_matrix(h, stride, hc)
    mx = _interp_matrix(w, stride, wc)
    flow = jnp.einsum('yh,bhwc->bywc', my, flow,
                      preferred_element_type=jnp.float32)
    return jnp.einsum('xw,bywc->byxc', mx, flow,
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=('regularization', 'method', 'max_displacement',
                              'clamp_flow', 'flow_grid_stride'))
def sparse_image_warp(image, source_control_points, dest_control_points,
                      regularization=0.0, method='exact',
                      max_displacement=8, clamp_flow=False,
                      flow_grid_stride=1):
    '''Warp so that pixels at source control points land on dest points.

    Args:
        image: [B, H, W, C] float array.
        source_control_points: [B, N, 2] (y, x) locations.
        dest_control_points: [B, N, 2] (y, x) locations.
        method: 'exact' (gather-based bilinear, TFA semantics) or 'two_pass'
            (select-based resample, much faster on TPU; see
            dense_image_warp_twopass for the approximation bound).
        max_displacement: flow clamp for the 'two_pass' method.
        clamp_flow: clip the interpolated flow to ±max_displacement for BOTH
            methods (the thin-plate interpolant can overshoot the clipped
            control displacements between near-duplicate random points;
            augmentation callers clamp so the realized warp honors the
            configured max_diff bound).
        flow_grid_stride: evaluate the spline flow on a ``stride``-spaced
            coarse grid and bilinearly upsample ('two_pass' only). The TPS
            interpolant's length scale is the control-point spacing (~25 px
            at the production 100-points/256px operating point), so a
            stride-4 grid resolves it with sub-0.15 px interpolation error
            while cutting the [H*W, N] kernel-matrix work 16x. 1 = dense
            (exact) evaluation.

    Returns:
        warped image [B, H, W, C].
    '''
    image = image.astype(jnp.float32)
    b, h, w, _ = image.shape
    stride = int(flow_grid_stride) if method == 'two_pass' else 1

    # flow(dest) must equal dest - source so that out(dest) = img(source)
    values = (dest_control_points - source_control_points).astype(jnp.float32)

    # Solve in [0,1]-normalized coordinates: the r^2 log r kernel matrix is
    # catastrophically ill-conditioned in f32 at pixel scale (entries ~1e5 at
    # 256px; observed interpolated flows overshooting to ~1e3 px). 2D TPS
    # interpolants are invariant under uniform domain scaling, so this only
    # fixes conditioning. Displacement *values* stay in pixels.
    scale = 1.0 / float(max(h, w))

    # flow-evaluation grid (coarse when flow_grid_stride > 1; the last coarse
    # sample may land past the image edge — the spline extrapolates smoothly)
    hc = -(-(h - 1) // stride) + 1
    wc = -(-(w - 1) // stride) + 1
    gy = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 0) * stride
    gx = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 1) * stride

    def flow_one(train_pts, train_vals):
        '''One spline solve per image, shared by the base flow and the
        two-pass composition correction.'''
        return _flow_from_points(
            train_pts, train_vals, gy, gx, scale, regularization,
            clamp_flow, float(max_displacement), method == 'two_pass')

    flow = jax.vmap(flow_one)(dest_control_points, values)
    if stride > 1:
        flow = _upsample_flow(flow, h, w, stride)
    if method == 'two_pass':
        return _twopass_resample(image, flow, max_displacement)
    return dense_image_warp(image, flow)


def _twopass_resample(image, flow, max_displacement):
    '''Dense two-pass resample at a full-resolution flow: the Pallas kernel
    on TPU (shard_mapped under SPMD), the XLA select path otherwise.'''
    if _pallas_resample_ok(image.shape, max_displacement):
        from .pallas.warp_kernel import dense_image_warp_twopass_pallas
        fn = functools.partial(
            dense_image_warp_twopass_pallas,
            max_displacement=max_displacement,
            interpret=mesh_lib.pallas_interpret())
        mesh = mesh_lib.spmd_batch_mesh(image.shape[0])
        if mesh is not None and jax.device_count() != 1:
            from jax.sharding import PartitionSpec as P
            fn = jax.shard_map(
                fn, mesh=mesh, in_specs=(P('data'), P('data')),
                out_specs=P('data'), check_vma=False)
        return fn(image, flow)
    return dense_image_warp_twopass(image, flow, max_displacement)


@functools.partial(
    jax.jit, static_argnames=('out_size', 'regularization',
                              'max_displacement', 'flow_grid_stride'))
def coarse_twopass_flow(source_control_points, dest_control_points, out_size,
                        regularization=0.0, max_displacement=8,
                        flow_grid_stride=4):
    '''The clamped, composition-corrected coarse flow grids [B, hc, wc, 2]
    that ``sparse_image_warp(method='two_pass', clamp_flow=True)`` would
    realize for these control points — without resampling any image.

    This is the warp-bank precompute (data/augment.py:build_warp_bank): the
    spline solve depends only on the control points, so banks of these grids
    can be solved once and resampled later via ``warp_with_coarse_flow``.
    '''
    h, w = out_size
    stride = int(flow_grid_stride)
    values = (dest_control_points - source_control_points).astype(jnp.float32)
    scale = 1.0 / float(max(h, w))
    hc = -(-(h - 1) // stride) + 1
    wc = -(-(w - 1) // stride) + 1
    gy = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 0) * stride
    gx = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 1) * stride

    def flow_one(train_pts, train_vals):
        return _flow_from_points(
            train_pts, train_vals, gy, gx, scale, regularization,
            True, float(max_displacement), True)

    return jax.vmap(flow_one)(dest_control_points, values)


@functools.partial(
    jax.jit, static_argnames=('max_displacement', 'flow_grid_stride'))
def warp_with_coarse_flow(image, coarse_flow, max_displacement=8,
                          flow_grid_stride=4):
    '''Two-pass warp of [B, H, W, C] at precomputed coarse flow grids
    (``coarse_twopass_flow`` output): bilinear-matmul upsample + the same
    resample tail as ``sparse_image_warp(method='two_pass')``.'''
    image = image.astype(jnp.float32)
    b, h, w, _ = image.shape
    stride = int(flow_grid_stride)
    flow = coarse_flow.astype(jnp.float32)
    if stride > 1:
        flow = _upsample_flow(flow, h, w, stride)
    return _twopass_resample(image, flow, max_displacement)


def _upsample_plane(fl, h, w, stride):
    '''Bilinearly upsample one coarse flow component [B, Hc, Wc] -> [B,h,w].'''
    hc, wc = fl.shape[1], fl.shape[2]
    my = _interp_matrix(h, stride, hc)
    mx = _interp_matrix(w, stride, wc)
    fl = jnp.einsum('yh,bhw->byw', my, fl,
                    preferred_element_type=jnp.float32)
    return jnp.einsum('xw,byw->byx', mx, fl,
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=('out_size', 'regularization', 'max_displacement',
                              'clamp_flow', 'flow_grid_stride'))
def sparse_image_warp_cropped(image, source_control_points,
                              dest_control_points, crop_offset, out_size,
                              regularization=0.0, max_displacement=8,
                              clamp_flow=True, flow_grid_stride=4):
    '''Jittered-crop-fused sparse warp: equivalent to cropping ``image`` at
    per-image integer ``crop_offset`` to ``out_size`` and then applying
    ``sparse_image_warp(method='two_pass')``, but the cropped intermediate
    never materializes — the crop rides the Pallas resample's dynamic slice
    bases (ops/pallas/warp_kernel.py:_kernel_crop).

    Control points are in the CROP frame (the frame the composed chain
    random_crop -> random_warp draws them in, reference data.py:677-763).
    At ``flow_grid_stride=1`` the realized flow matches the composed path
    bit-near-exactly; at stride>1 both paths approximate the same exact
    spline within the documented sub-0.15 px interpolation bound (their
    coarse grids differ by the per-image crop shift mod stride).

    Args:
        image: [B, h_in, w_in, C] uncropped window.
        crop_offset: [B, 2] int32 (oy, ox) with 0 <= off <= in - out.
        out_size: static (h_out, w_out).
    '''
    image = image.astype(jnp.float32)
    b, h_in, w_in, _ = image.shape
    h_out, w_out = out_size
    stride = int(flow_grid_stride)
    d = float(max_displacement)

    values = (dest_control_points - source_control_points).astype(jnp.float32)
    scale = 1.0 / float(max(h_out, w_out))   # crop frame, as the composed path

    hc = -(-(h_out - 1) // stride) + 1
    wc = -(-(w_out - 1) // stride) + 1
    wce = -(-(w_in - 1) // stride) + 1
    # extended grid: original-column coords j; per-image crop-x = j - ox
    gy_e = jax.lax.broadcasted_iota(jnp.float32, (hc, wce), 0) * stride
    gx_e = jax.lax.broadcasted_iota(jnp.float32, (hc, wce), 1) * stride
    # crop-frame grid for the horizontal-pass flow (static, shared)
    gy_c = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 0) * stride
    gx_c = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 1) * stride

    def flow_one(train_pts, train_vals, ox):
        tp = train_pts.astype(jnp.float32) * scale
        wgt, v = _solve_spline(tp, train_vals, regularization)
        # E1: both components on the ox-shifted extended grid
        q_e = jnp.stack(
            [gy_e.reshape(-1), (gx_e - ox).reshape(-1)], axis=-1) * scale
        fl_e = _evaluate_spline(q_e, tp, wgt, v).reshape(hc, wce, 2)
        if clamp_flow:
            fl_e = jnp.clip(fl_e, -d, d)
        # E2: two-pass composition correction (fy at the source column),
        # same construction as sparse_image_warp's flow_one
        q2 = jnp.stack(
            [gy_e.reshape(-1),
             (gx_e - ox + fl_e[..., 1]).reshape(-1)], axis=-1) * scale
        fy = _evaluate_spline(q2, tp, wgt, v)[:, 0].reshape(hc, wce)
        # E3: fx on the crop grid (what the horizontal pass consumes)
        q_c = jnp.stack(
            [gy_c.reshape(-1), gx_c.reshape(-1)], axis=-1) * scale
        fx = _evaluate_spline(q_c, tp, wgt, v)[:, 1].reshape(hc, wc)
        if clamp_flow:
            fx = jnp.clip(fx, -d, d)
        return fy, fx

    fy, fx = jax.vmap(flow_one)(
        dest_control_points, values,
        crop_offset[:, 1].astype(jnp.float32))
    if stride > 1:
        fy = _upsample_plane(fy, h_out, w_in, stride)
        fx = _upsample_plane(fx, h_out, w_out, stride)

    from .pallas.warp_kernel import dense_image_warp_crop_pallas
    fn = functools.partial(
        dense_image_warp_crop_pallas, out_size=tuple(out_size),
        max_displacement=int(max_displacement),
        interpret=mesh_lib.pallas_interpret())
    mesh = mesh_lib.spmd_batch_mesh(b)
    if mesh is not None and jax.device_count() != 1:
        from jax.sharding import PartitionSpec as P
        fn = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P('data'), P('data'), P('data'), P('data')),
            out_specs=P('data'), check_vma=False)
    return fn(image, fy, fx, crop_offset)


def fused_crop_warp_ok(in_shape, out_size, max_displacement):
    '''Eligibility of the crop-fused Pallas resample: single TPU device or
    shard_mapped over the announced SPMD mesh; CPU only under interpret-mode
    testing; VMEM footprint within budget.'''
    try:
        from . import gates
        if gates.forced_off():
            return False
        if jax.default_backend() == 'cpu' and not mesh_lib.pallas_interpret():
            return False
        if (jax.device_count() != 1
                and mesh_lib.spmd_batch_mesh(in_shape[0]) is None):
            return False
        from .pallas.warp_kernel import supported_crop
        return supported_crop(in_shape, out_size, max_displacement)
    except Exception:
        return False


def _pallas_resample_ok(shape, max_displacement):
    '''Use the fused Pallas resample on a single TPU device or shard_mapped
    over the engine-announced SPMD mesh; fall back to the XLA select path
    on CPU (unless interpret-mode testing) and under spatial partitioning.'''
    try:
        from . import gates
        if gates.forced_off():
            return False
        if jax.default_backend() == 'cpu' and not mesh_lib.pallas_interpret():
            return False
        if (jax.device_count() != 1
                and mesh_lib.spmd_batch_mesh(shape[0]) is None):
            return False
        from .pallas.warp_kernel import supported
        return supported(shape, max_displacement)
    except Exception:
        return False
