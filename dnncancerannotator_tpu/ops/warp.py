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


@functools.partial(jax.jit, static_argnames=('regularization',))
def sparse_image_warp(image, source_control_points, dest_control_points,
                      regularization=0.0):
    '''Warp so that pixels at source control points land on dest points.

    Args:
        image: [B, H, W, C] float array.
        source_control_points: [B, N, 2] (y, x) locations.
        dest_control_points: [B, N, 2] (y, x) locations.

    Returns:
        warped image [B, H, W, C].
    '''
    image = image.astype(jnp.float32)
    b, h, w, _ = image.shape

    # flow(dest) must equal dest - source so that out(dest) = img(source)
    values = (dest_control_points - source_control_points).astype(jnp.float32)

    def flow_one(train_pts, train_vals):
        wgt, v = _solve_spline(train_pts.astype(jnp.float32), train_vals)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
        grid = jnp.stack([gy, gx], axis=-1)  # [HW, 2]
        return _evaluate_spline(grid, train_pts.astype(jnp.float32),
                                wgt, v).reshape(h, w, 2)

    flow = jax.vmap(flow_one)(dest_control_points, values)
    return dense_image_warp(image, flow)
