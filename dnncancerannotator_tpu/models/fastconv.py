'''TPU-fast convolution paths for small channel counts.

The segmentation models here use very small channel widths (unet.yaml starts
at 3 filters). XLA:TPU lowers such convs to MXU matmuls padded to 128-wide
operands, wasting >95% of the systolic array — measured ~1.3 ms per conv
backward at [8,256,256,5->3]. For small channels a **stencil formulation**
(kh*kw shifted slices, each contracted over the tiny channel dims) stays on
the VPU and is ~2.5x faster with bit-exact results; large-channel convs fall
back to the regular XLA conv, which is already MXU-efficient.

``Conv2DFast`` / ``ConvTranspose2DFast`` are drop-in flax modules with
nn.Conv-compatible parameter names ('kernel', 'bias') so checkpoints are
interchangeable with the plain modules.
'''

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.sharding import PartitionSpec as P

from ..parallel import mesh as mesh_lib

# use the stencil path when the padded-MXU waste dominates
_SMALL_CHANNEL_LIMIT = 32


# shared batch-sharding eligibility check (also used by the tconv/pool/
# flatchain kernels via this name)
_conv_spmd_mesh = mesh_lib.spmd_batch_mesh


def _shard_map_batch(fn, mesh, n_batch_in, n_out, reduced_out=()):
    '''shard_map ``fn`` over the mesh ``data`` axis: the first
    ``n_batch_in`` args are batch-sharded on dim 0, the rest replicated;
    outputs listed in ``reduced_out`` are psum-reduced weight/bias
    gradients, the others batch-sharded.'''
    def local(*args):
        outs = fn(*args)
        outs = outs if isinstance(outs, tuple) else (outs,)
        return tuple(
            jax.lax.psum(o, 'data') if i in reduced_out else o
            for i, o in enumerate(outs))

    def wrapped(*args):
        in_specs = tuple(P('data') if i < n_batch_in else P()
                         for i in range(len(args)))
        out_specs = tuple(P() if i in reduced_out else P('data')
                          for i in range(n_out))
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker (jax>=0.7) otherwise rejects
        outs = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)
        return outs[0] if n_out == 1 else outs

    return wrapped


def _pallas_conv_ok(xshape, wshape, nchw=False, bwd=False):
    '''Use the fused Pallas conv on a single TPU device or — under an
    engine-announced SPMD mesh (mesh_lib.pallas_spmd) — shard_mapped over
    the ``data`` axis; fall back to the XLA stencil on CPU (unless the
    interpret-mode test override is set) and under spatial partitioning.'''
    try:
        from ..ops import gates
        if gates.forced_off():
            return False
        if jax.default_backend() == 'cpu' and not mesh_lib.pallas_interpret():
            return False
        if nchw:
            b, _, h, wd = xshape
        else:
            b, h, wd, _ = xshape
        if jax.device_count() != 1 and _conv_spmd_mesh(b) is None:
            return False
        kh, kw, ci, co = wshape
        from ..ops.pallas.conv_kernel import supported
        return supported(b, h, wd, kh, kw, ci, co, bwd=bwd)
    except Exception:
        return False


def _conv_geometry(h, w, kh, kw, stride, padding):
    '''Resolve (pads, out_h, out_w) for SAME/VALID or explicit pad pairs.'''
    sy, sx = stride
    if isinstance(padding, str) and padding.upper() == 'SAME':
        out_h = -(-h // sy)
        out_w = -(-w // sx)
        pad_h = max((out_h - 1) * sy + kh - h, 0)
        pad_w = max((out_w - 1) * sx + kw - w, 0)
        pads = ((pad_h // 2, pad_h - pad_h // 2),
                (pad_w // 2, pad_w - pad_w // 2))
    elif isinstance(padding, str):  # VALID
        out_h = (h - kh) // sy + 1
        out_w = (w - kw) // sx + 1
        pads = ((0, 0), (0, 0))
    else:  # explicit ((top, bottom), (left, right))
        pads = (tuple(padding[0]), tuple(padding[1]))
        out_h = (h + pads[0][0] + pads[0][1] - kh) // sy + 1
        out_w = (w + pads[1][0] + pads[1][1] - kw) // sx + 1
    return pads, out_h, out_w


def _stencil_conv2d_raw(x, w, stride, pads, out_h, out_w, nchw=False):
    kh, kw, ci, co = w.shape
    b = x.shape[0]
    sy, sx = stride
    if nchw:
        xp = jnp.pad(x, ((0, 0), (0, 0), pads[0], pads[1]))
    else:
        xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    if nchw and stride == (1, 1) and ci >= 8 and kh * kw > 1:
        # single-einsum form: stack the kh*kw shifted windows along C and
        # contract once with the tap-major-flattened kernel. The per-tap
        # 'bihw,io' einsums each relayout their operand C-major for the
        # dot (~10 us + launch apiece — the dominant 'copy' cluster in
        # the small-model profile); one big contraction pays that once
        # and feeds the MXU a kh*kw*ci-deep reduction instead of 9 thin
        # ones.
        patches = [
            lax.slice(xp, (0, 0, dy, dx), (b, ci, dy + out_h, dx + out_w))
            for dy in range(kh) for dx in range(kw)]
        big = jnp.concatenate(patches, axis=1)          # [B, kh*kw*Ci, H, W]
        out = jnp.einsum('bihw,io->bohw', big, w.reshape(kh * kw * ci, co),
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype) if out.dtype != x.dtype else out
    out = None
    for dy in range(kh):
        for dx in range(kw):
            if nchw:
                patch = lax.slice(
                    xp, (0, 0, dy, dx),
                    (b, ci, dy + (out_h - 1) * sy + 1,
                     dx + (out_w - 1) * sx + 1),
                    (1, 1, sy, sx))
                term = jnp.einsum('bihw,io->bohw', patch, w[dy, dx],
                                  preferred_element_type=jnp.float32)
            else:
                patch = lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + (out_h - 1) * sy + 1,
                     dx + (out_w - 1) * sx + 1, ci),
                    (1, sy, sx, 1))
                term = jnp.einsum('bhwi,io->bhwo', patch, w[dy, dx],
                                  preferred_element_type=jnp.float32)
            out = term if out is None else out + term
    return out.astype(x.dtype) if out.dtype != x.dtype else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _stencil_conv2d_s1(x, w, b, pads, relu, nchw=False):
    '''Stride-1 stencil conv (+bias, +optional fused relu) with hand-written
    backward.

    Autodiff of the shifted-slice forward emits pad-of-slice transposes and
    huge-contraction einsums that XLA schedules poorly (measured ~2x the
    forward cost beyond the theoretical FLOP ratio). Both gradients have
    exact stencil forms that reuse the fast forward:

    - d/dx: correlate the (relu-masked) cotangent with the spatially-flipped,
      io-transposed kernel, padded with (k-1-p) on each side (the standard
      conv transpose identity, here expressed as another stencil conv);
    - d/dw: per-tap contraction of the padded input window with the
      cotangent over (batch, y, x); d/db: per-channel cotangent sums.
    '''
    sp = (2, 3) if nchw else (1, 2)
    h, wd = x.shape[sp[0]], x.shape[sp[1]]
    kh, kw = w.shape[0], w.shape[1]
    out_h = h + pads[0][0] + pads[0][1] - kh + 1
    out_w = wd + pads[1][0] + pads[1][1] - kw + 1
    if _pallas_conv_ok(x.shape, w.shape, nchw):
        from ..ops.pallas.conv_kernel import stencil_conv2d_pallas
        fn = functools.partial(
            stencil_conv2d_pallas, pads=pads, relu=relu, nchw=nchw,
            interpret=mesh_lib.pallas_interpret())
        mesh = _conv_spmd_mesh(x.shape[0])
        if mesh is not None and jax.device_count() != 1:
            fn = _shard_map_batch(fn, mesh, n_batch_in=1, n_out=1)
        return fn(x, w, b).astype(x.dtype)
    out = _stencil_conv2d_raw(x, w, (1, 1), pads, out_h, out_w, nchw=nchw)
    bb = b.reshape(1, -1, 1, 1) if nchw else b
    out = out + bb.astype(out.dtype)
    return jnp.maximum(out, 0) if relu else out


def _stencil_s1_fwd(x, w, b, pads, relu, nchw=False):
    out = _stencil_conv2d_s1(x, w, b, pads, relu, nchw)
    return out, (x, w, out if relu else None)


def _stencil_s1_bwd(pads, relu, nchw, res, g):
    x, w, out = res
    kh, kw, ci, co = w.shape
    sp = (2, 3) if nchw else (1, 2)
    b, h, wd = x.shape[0], x.shape[sp[0]], x.shape[sp[1]]
    oh, ow = g.shape[sp[0]], g.shape[sp[1]]
    if relu:
        g = jnp.where(out > 0, g, 0).astype(g.dtype)
    if _pallas_conv_ok(x.shape, w.shape, nchw, bwd=True):
        from ..ops.pallas.conv_kernel import stencil_conv2d_bwd_pallas
        fn = functools.partial(stencil_conv2d_bwd_pallas, pads=pads,
                               nchw=nchw,
                               interpret=mesh_lib.pallas_interpret())
        mesh = _conv_spmd_mesh(x.shape[0])
        if mesh is not None and jax.device_count() != 1:
            # dx stays batch-sharded; dw/db are summed across shards
            fn = _shard_map_batch(fn, mesh, n_batch_in=2, n_out=3,
                                  reduced_out=(1, 2))
        dx, dw, db = fn(x, g, w)
        return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(x.dtype)
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
    gpads = ((kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
             (kw - 1 - pads[1][0], kw - 1 - pads[1][1]))
    dx = _stencil_conv2d_raw(g, wf, (1, 1), gpads, h, wd,
                             nchw=nchw).astype(x.dtype)
    taps = []
    if nchw:
        xp = jnp.pad(x, ((0, 0), (0, 0), pads[0], pads[1]))
        if ci >= 8 and kh * kw > 1:
            # same single-contraction trick as the forward (see
            # _stencil_conv2d_raw): one [kh*kw*Ci]-deep einsum instead of
            # kh*kw thin ones, one operand relayout instead of kh*kw
            patches = [
                lax.slice(xp, (0, 0, dy, dxx), (b, ci, dy + oh, dxx + ow))
                for dy in range(kh) for dxx in range(kw)]
            big = jnp.concatenate(patches, axis=1)
            dw = jnp.einsum('bihw,bohw->io', big, g,
                            preferred_element_type=jnp.float32)
            dw = dw.reshape(kh, kw, ci, co).astype(w.dtype)
            db = jnp.sum(g, axis=(0, 2, 3),
                         dtype=jnp.float32).astype(x.dtype)
            return dx, dw, db
        for dy in range(kh):
            for dxx in range(kw):
                patch = lax.slice(xp, (0, 0, dy, dxx),
                                  (b, ci, dy + oh, dxx + ow))
                taps.append(jnp.einsum('bihw,bohw->io', patch, g,
                                       preferred_element_type=jnp.float32))
        db = jnp.sum(g, axis=(0, 2, 3), dtype=jnp.float32).astype(x.dtype)
    else:
        xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
        for dy in range(kh):
            for dxx in range(kw):
                patch = lax.slice(xp, (0, dy, dxx, 0),
                                  (b, dy + oh, dxx + ow, ci))
                taps.append(jnp.einsum('bhwi,bhwo->io', patch, g,
                                       preferred_element_type=jnp.float32))
        db = jnp.sum(g, axis=(0, 1, 2), dtype=jnp.float32).astype(x.dtype)
    dw = jnp.stack(taps, 0).reshape(kh, kw, ci, co).astype(w.dtype)
    return dx, dw, db


_stencil_conv2d_s1.defvjp(_stencil_s1_fwd, _stencil_s1_bwd)


def _s1_eligible(stride, pads, kh, kw):
    return stride == (1, 1) and min(
        pads[0][0], pads[0][1], pads[1][0], pads[1][1]) >= 0 and \
        kh - 1 >= max(pads[0]) and kw - 1 >= max(pads[1])


def stencil_conv2d(x, w, stride=(1, 1), padding='SAME', bias=None,
                   relu=False, data_format='NHWC'):
    '''2D conv as kh*kw shifted multiply-accumulates (exact, VPU-friendly).

    Args:
        x: [B, H, W, Ci] (or [B, Ci, H, W] with data_format='NCHW' — the
            channel-major layout the Pallas kernels use natively, so no
            layout transposes are emitted);
        w: [kh, kw, Ci, Co]; stride: (sy, sx);
        padding: 'SAME' / 'VALID' / explicit ((top, bottom), (left, right));
        bias: optional [Co]; relu: fuse a relu into the conv.
    '''
    nchw = data_format == 'NCHW'
    kh, kw = w.shape[0], w.shape[1]
    sp = (2, 3) if nchw else (1, 2)
    h, wd = x.shape[sp[0]], x.shape[sp[1]]
    stride = tuple(stride)
    pads, out_h, out_w = _conv_geometry(h, wd, kh, kw, stride, padding)
    if _s1_eligible(stride, pads, kh, kw):
        b_arr = (jnp.zeros((w.shape[3],), x.dtype) if bias is None
                 else bias.astype(x.dtype))
        return _stencil_conv2d_s1(x, w, b_arr, pads, bool(relu), nchw)
    out = _stencil_conv2d_raw(x, w, stride, pads, out_h, out_w, nchw=nchw)
    if bias is not None:
        bb = bias.reshape(1, -1, 1, 1) if nchw else bias
        out = out + bb.astype(out.dtype)
    return jnp.maximum(out, 0) if relu else out


def stencil_conv_transpose2d(x, w, rate, data_format='NHWC'):
    '''ConvTranspose with kernel == stride == rate as interleaved einsums.

    Every output pixel receives exactly one input contribution, so the tconv
    is an einsum over the (rate, rate) phase grid followed by a spatial
    interleave — no scatter. Matches nn.ConvTranspose(kernel=rate,
    strides=rate) for SAME/VALID (identical when kernel == stride). Plain
    autodiff backward: a hand-written two-einsum VJP was tried and measured
    ~8% SLOWER end-to-end (the 6D phase-grid einsums lower to worse layouts
    than autodiff's own transpose).
    '''
    kh, kw, _, co = w.shape
    assert (kh, kw) == (rate, rate)
    # lax.conv_transpose (zeros-insertion + conv) applies the kernel
    # spatially flipped relative to the phase grid
    w = w[::-1, ::-1]
    if data_format == 'NCHW':
        b, ci, h, wd = x.shape
        out = jnp.einsum('bihw,deio->bohdwe', x, w,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return out.reshape(b, co, h * rate, wd * rate)
    b, h, wd, ci = x.shape
    # [B, H, W, rate, rate, Co]
    out = jnp.einsum('bhwi,deio->bhwdeo', x, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 1, 3, 2, 4, 5)  # [B, H, rate, W, rate, Co]
    return out.reshape(b, h * rate, wd * rate, co)


class Conv2DFast(nn.Module):
    '''Drop-in nn.Conv with an automatic small-channel stencil path.

    ``activation='relu'`` applies (and, on the Pallas path, fuses) a relu
    after bias — callers that pass it must not re-apply the activation.
    '''
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    dtype: Optional[Any] = None
    activation: Optional[str] = None
    data_format: str = 'NHWC'

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        nchw = self.data_format == 'NCHW'
        ca = 1 if nchw else -1
        # a tuple input means "conv of the channel-concat of the parts",
        # computed WITHOUT materializing the concat: conv(concat(a, b), k)
        # == conv(a, k[:, :, :ca]) + conv(b, k[:, :, ca:]). On TPU a
        # channel concat at a non-128-multiple lane offset (e.g. the
        # 64+64 skip join of the 64-filter UNet decoder) costs a full
        # lane-shuffle pass forward AND a split in the backward — the
        # split-kernel form keeps the exact parameter tree/math and skips
        # both (reference joins skips with Concatenate,
        # components.py:158-166).
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        ci = sum(p.shape[ca] for p in parts)
        kernel = self.param(
            'kernel', nn.initializers.glorot_uniform(),
            (kh, kw, ci, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        dtype = self.dtype or parts[0].dtype
        parts = tuple(p.astype(dtype) for p in parts)
        kernel = kernel.astype(dtype)
        relu = self.activation == 'relu'
        assert self.activation in (None, 'relu'), self.activation
        small = (ci <= _SMALL_CHANNEL_LIMIT
                 and self.features <= _SMALL_CHANNEL_LIMIT
                 and isinstance(self.padding, str))
        if small:
            x = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=ca))
            return stencil_conv2d(x, kernel, self.strides, self.padding,
                                  bias=bias, relu=relu,
                                  data_format=self.data_format)
        pad = (self.padding.upper() if isinstance(self.padding, str)
               else self.padding)
        dn = (self.data_format, 'HWIO', self.data_format)
        out = None
        off = 0
        for p in parts:
            c = p.shape[ca]
            k = lax.slice_in_dim(kernel, off, off + c, axis=2)
            y = lax.conv_general_dilated(p, k, self.strides, pad,
                                         dimension_numbers=dn)
            out = y if out is None else out + y
            off += c
        if bias is not None:
            bb = bias.reshape(1, -1, 1, 1) if nchw else bias
            out = out + bb.astype(out.dtype)
        return jnp.maximum(out, 0) if relu else out


class ConvTranspose2DFast(nn.Module):
    '''Drop-in nn.ConvTranspose for the kernel==stride upsampling case.'''
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any = 'SAME'
    use_bias: bool = True
    dtype: Optional[Any] = None
    data_format: str = 'NHWC'

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        nchw = self.data_format == 'NCHW'
        ci = x.shape[1] if nchw else x.shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.glorot_uniform(),
            (kh, kw, ci, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        small = (ci <= _SMALL_CHANNEL_LIMIT
                 and self.features <= _SMALL_CHANNEL_LIMIT
                 and (kh, kw) == tuple(self.strides))
        from ..ops.pallas import tconv_kernel
        if dtype == jnp.float32 and not small and tconv_kernel.tconv_pallas_ok(
                x.shape, self.kernel_size, self.strides, self.features,
                self.data_format, self.dtype):
            # fused Pallas tconv: dots + layout-identity interleave, zero
            # strided copies (opt-in DNNCA_PTCONV=1, see ops/pallas/
            # tconv_kernel.py); bias rides inside the kernel
            out = tconv_kernel.conv_transpose2x2_nhwc(
                x, kernel,
                bias if bias is not None else jnp.zeros(
                    (self.features,), jnp.float32),
                mesh_lib.pallas_interpret())
            return out
        from ..ops.pallas import flattconv
        if dtype == jnp.float32 and flattconv.tconv_flat_ok(
                x.shape, self.kernel_size, self.strides, self.features,
                self.data_format, self.dtype):
            # flatland tconv: interleaves via permutation-matrix dots and
            # block placement instead of the 6D einsum-interleave copies
            # (ops/pallas/flattconv.py); bias rides inside the kernel
            return flattconv.conv_transpose2x2_flat_nchw(
                x, kernel,
                bias if bias is not None else jnp.zeros(
                    (self.features,), jnp.float32),
                mesh_lib.pallas_interpret())
        if small:
            # positional: custom_vjp functions reject keyword arguments
            out = stencil_conv_transpose2d(x, kernel, kh, self.data_format)
        else:
            out = lax.conv_transpose(
                x, kernel, self.strides,
                self.padding.upper() if isinstance(self.padding, str)
                else self.padding,
                dimension_numbers=(self.data_format, 'HWIO',
                                   self.data_format))
        if bias is not None:
            bb = bias.reshape(1, -1, 1, 1) if nchw else bias
            out = out + bb.astype(out.dtype)
        return out


# ---------------------------------------------------------------------------
# Fused ConvChain cell (NCHW, Pallas): conv+bias+relu -> conv+bias+relu as
# one kernel per direction. Used by blocks.ConvChain when eligible; params
# are held by _ConvParams submodules named conv_0/conv_1 so the tree is
# identical to the unfused Conv2DFast path (checkpoints interchangeable).
# ---------------------------------------------------------------------------


class _ConvParams(nn.Module):
    '''Parameter holder matching Conv2DFast's param names/shapes.'''
    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, ci):
        kh, kw = self.kernel_size
        kernel = self.param('kernel', nn.initializers.glorot_uniform(),
                            (kh, kw, ci, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def flat_chain_ok(xshape, kernel_size, filters, padding, dtype):
    '''Static eligibility of the MXU "flatland" chain kernel
    (ops/pallas/flatchain.py). Default ON since the 2026-08-18 real-chip
    A/B measured +10.4% end-to-end on unet.yaml (1784 -> 1969 slices/s,
    both strategies; see RESULTS.md round 3). Opt out with
    deploy_options.flatchain: false (env DNNCA_FLATCHAIN overrides).'''
    from ..ops import gates
    if not gates.enabled('flatchain'):
        return False
    try:
        interp = mesh_lib.pallas_interpret()
        if jax.default_backend() == 'cpu' and not interp:
            return False
        if jax.device_count() != 1 and not interp \
                and _conv_spmd_mesh(xshape[0]) is None:
            return False
        from ..ops.pallas import flatchain
        kh = int(kernel_size)
        return flatchain.flat_chain_ok(
            xshape, kh, filters, padding, dtype)
    except Exception:
        return False


def chain_pallas_ok(xshape, kernel_size, filters, padding):
    '''Static (trace-time) eligibility of the fused NCHW chain kernel.'''
    try:
        from ..ops import gates
        if gates.forced_off():
            return False
        if jax.default_backend() == 'cpu' and not mesh_lib.pallas_interpret():
            return False
        b, ci, h, w = xshape
        if jax.device_count() != 1 and _conv_spmd_mesh(b) is None:
            return False
        if max(ci, filters) > _SMALL_CHANNEL_LIMIT:
            return False
        kh = kw = int(kernel_size)
        pads, oh, ow = _conv_geometry(h, w, kh, kw, (1, 1), padding)
        if (oh, ow) != (h, w):
            return False  # the chain kernel is size-preserving (SAME)
        from ..ops.pallas.conv_kernel import chain_supported
        return chain_supported(b, h, w, kh, kw, ci, filters, filters)
    except Exception:
        return False


def _chain_call(x, w1, b1, w2, b2, pads):
    from ..ops.pallas.conv_kernel import conv_chain_pallas
    fn = functools.partial(conv_chain_pallas, pads=pads,
                           interpret=mesh_lib.pallas_interpret())
    mesh = _conv_spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        fn = _shard_map_batch(fn, mesh, n_batch_in=1, n_out=2)
    return fn(x, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_chain_nchw(x, w1, b1, w2, b2, pads, need_dx=True):
    '''relu(conv(relu(conv(x, w1) + b1), w2) + b2), fused (NCHW).

    ``need_dx=False`` marks a first-layer chain whose d(loss)/d(input)
    is dead work: the fused backward kernel elides the dx stencil (XLA
    cannot DCE it out of the fused call) and returns zeros for dx.'''
    _, c2 = _chain_call(x, w1, b1, w2, b2, pads)
    return c2.astype(x.dtype)


def _chain_fwd(x, w1, b1, w2, b2, pads, need_dx):
    c1, c2 = _chain_call(x, w1, b1, w2, b2, pads)
    return c2.astype(x.dtype), (x, w1, w2, c1, c2)


def _chain_bwd(pads, need_dx, res, g):
    x, w1, w2, c1, c2 = res
    from ..ops.pallas.conv_kernel import conv_chain_bwd_pallas
    fn = functools.partial(conv_chain_bwd_pallas, pads=pads,
                           interpret=mesh_lib.pallas_interpret(),
                           need_dx=need_dx)
    mesh = _conv_spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        # dx batch-sharded; the four weight/bias grads summed across shards
        fn = _shard_map_batch(fn, mesh, n_batch_in=4, n_out=5,
                              reduced_out=(1, 2, 3, 4))
    dx, dw1, db1, dw2, db2 = fn(x, c1, c2, g.astype(jnp.float32), w1, w2)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(x.dtype),
            dw2.astype(w2.dtype), db2.astype(x.dtype))


conv_chain_nchw.defvjp(_chain_fwd, _chain_bwd)
