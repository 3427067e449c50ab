'''Whole encoder-level Pallas kernel: ConvChain + 2x2 maxpool fused.

One encoder level of the small U-Net (reference
annotator/models/tf_models/components.py:16-81: Conv2D x2 -> MaxPool2D(2))
currently runs as 2-3 kernels with an HBM round-trip between the chain and
the pool plus per-op scheduling gaps — the op-launch overhead that dominates
the small model (RESULTS.md round 2/3).

Same phase-space formulation as the decoder-level kernel
(ops/pallas/declevel.py): every full-resolution [C, H, W] plane is carried
as four half-resolution phase planes ``plane[p][q][y, x] = full[2y+p,
2x+q]``. The SAME 3x3 convs become phase stencils (identical madd count),
and the 2x2 stride-2 maxpool — the op that forced the extra kernel — is
just an elementwise max over the four phase planes of the conv output:
``pool[o] = max(phase(0,0), phase(0,1), phase(1,0), phase(1,1))``.

The backward replicates the pairwise-``jnp.maximum`` pool VJP of
ops/pooling.py exactly (rows first, then columns, 50/50 cotangent split at
exact ties — ties are common post-relu at 0), then runs the transposed
stencils for dw2/db2, dc1, dw1/db1 and (optionally) dx. ``input_grad=False``
elides the dx stencil — the encoder's level 0 consumes raw data.
All accumulation is in-place into refs; f32, NCHW, kernel 3, SAME,
stride 1, pool rate 2 only.
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .declevel import (_VMEM_LIMIT_BYTES, _phase_stencil, _phase_stencil_t,
                       phase_split, phase_merge)


def _wsizes(ci, f):
    n1 = 9 * ci * f
    n2 = 9 * f * f
    return n1, n2


def _bal(u, v):
    '''jnp.maximum's VJP weight for the ``u`` side: 1 if u>v, 0.5 at ties,
    0 if u<v (jax's _balanced_eq; ops/pooling.py docstring).'''
    return 0.5 * ((u >= v).astype(jnp.float32) + (u > v).astype(jnp.float32))


def _fwd_kernel(w_ref, x_ref, c1_ref, conv_ref, pool_ref,
                sh0_ref, sh1_ref, xp_ref, c1p_ref,
                *, ci, f, hh, ww):
    '''One image. x [1, 4*ci, hh, ww] phase-major (plane (p*2+q)*ci + c);
    outputs c1 [1, 4*f] (post-relu residual), conv [1, 4*f] (the skip,
    phase-major) and pool [1, f, hh, ww] (half-res, directly dense).

    SMEM weights: [w1 | b1 | w2 | b2]; w1 [3, 3, ci, f] row-major.
    '''
    n1, n2 = _wsizes(ci, f)
    base2 = n1 + f

    for k in range(4 * ci):
        xp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        xp_ref[k, 1:hh + 1, 1:ww + 1] = x_ref[0, k]

    # --- conv1 + relu
    for k in range(4):
        for o in range(f):
            c1_ref[0, k * f + o] = jnp.full((hh, ww), w_ref[n1 + o],
                                            jnp.float32)

    def emit1(r, s, dy, dx, i, window):
        for o in range(f):
            wv = w_ref[((dy * 3 + dx) * ci + i) * f + o]
            kk = (r * 2 + s) * f + o
            c1_ref[0, kk] = c1_ref[0, kk] + window * wv

    _phase_stencil(xp_ref, ci, f, hh, ww, sh0_ref, sh1_ref, emit1)
    for k in range(4 * f):
        act = jnp.maximum(c1_ref[0, k], 0.0)
        c1_ref[0, k] = act
        c1p_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        c1p_ref[k, 1:hh + 1, 1:ww + 1] = act

    # --- conv2 + relu
    for k in range(4):
        for o in range(f):
            conv_ref[0, k * f + o] = jnp.full((hh, ww), w_ref[base2 + n2 + o],
                                              jnp.float32)

    def emit2(r, s, dy, dx, i, window):
        for o in range(f):
            wv = w_ref[base2 + ((dy * 3 + dx) * f + i) * f + o]
            kk = (r * 2 + s) * f + o
            conv_ref[0, kk] = conv_ref[0, kk] + window * wv

    _phase_stencil(c1p_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit2)
    for k in range(4 * f):
        conv_ref[0, k] = jnp.maximum(conv_ref[0, k], 0.0)

    # --- 2x2 maxpool: elementwise max over the four phases
    for o in range(f):
        a = conv_ref[0, o]              # (p=0, q=0)
        c = conv_ref[0, f + o]          # (p=0, q=1)
        b = conv_ref[0, 2 * f + o]      # (p=1, q=0)
        d = conv_ref[0, 3 * f + o]      # (p=1, q=1)
        pool_ref[0, o] = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def _bwd_kernel(w_ref, x_ref, c1_ref, conv_ref, gs_ref, gp_ref,
                dx_ref, dw_ref,
                sh0_ref, sh1_ref, gpad_ref, pp_ref, aux_ref, acc_ref,
                *, ci, f, hh, ww, need_dx):
    '''One image: dx phases + both weight/bias grads (dw_ref SMEM,
    accumulated across the sequential batch grid).

    gs [1, 4*f] is the skip cotangent (phase-major), gp [1, f] the pool
    cotangent. Scratch roles over time: aux [4f] holds the relu-masked
    conv-output cotangent (dout), then the masked dc1; gpad their padded
    versions; pp padded c1 phases, then padded input phases; acc the
    transposed-stencil accumulator.
    '''
    n1, n2 = _wsizes(ci, f)
    base2 = n1 + f
    first = pl.program_id(0) == 0

    def wacc(idx, s):
        prev = jnp.where(first, 0.0, dw_ref[idx])
        dw_ref[idx] = prev + s

    def _flush(sums):
        for idx, val in sums.items():
            wacc(idx, val)

    # --- pool VJP (pairwise-maximum semantics: rows p first, then cols q)
    # + skip cotangent + relu mask -> dout (aux) and its padded copy (gpad)
    for o in range(f):
        a = conv_ref[0, o]              # (p=0, q=0)
        c = conv_ref[0, f + o]          # (p=0, q=1)
        b = conv_ref[0, 2 * f + o]      # (p=1, q=0)
        d = conv_ref[0, 3 * f + o]      # (p=1, q=1)
        m0 = jnp.maximum(a, b)
        m1 = jnp.maximum(c, d)
        gpool = gp_ref[0, o]
        g0 = gpool * _bal(m0, m1)
        g1 = gpool * _bal(m1, m0)
        gph = {0: g0 * _bal(a, b), 1: g1 * _bal(c, d),
               2: g0 * _bal(b, a), 3: g1 * _bal(d, c)}
        for k in range(4):
            kk = k * f + o
            tot = gs_ref[0, kk] + gph[k]
            g2 = jnp.where(conv_ref[0, kk] > 0, tot, 0.0)
            aux_ref[kk] = g2
            gpad_ref[kk] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
            gpad_ref[kk, 1:hh + 1, 1:ww + 1] = g2

    # --- dw2/db2: window(c1 phases) x dout
    for k in range(4 * f):
        pp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        pp_ref[k, 1:hh + 1, 1:ww + 1] = c1_ref[0, k]
    sums2 = {}

    def emit_dw2(r, s, dy, dx, i, window):
        for o in range(f):
            sm = jnp.sum(window * aux_ref[(r * 2 + s) * f + o])
            idx = base2 + ((dy * 3 + dx) * f + i) * f + o
            sums2[idx] = sums2.get(idx, 0.0) + sm

    _phase_stencil(pp_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit_dw2)
    _flush(sums2)
    for o in range(f):
        sm = (jnp.sum(aux_ref[o]) + jnp.sum(aux_ref[f + o])
              + jnp.sum(aux_ref[2 * f + o]) + jnp.sum(aux_ref[3 * f + o]))
        wacc(base2 + n2 + o, sm)

    # --- dc1 = transposed conv2 stencil of padded dout, relu-masked
    for k in range(4 * f):
        acc_ref[k] = jnp.zeros((hh, ww), jnp.float32)

    def emit_dc1(r, s, dy, dx, o, window, p, q):
        for i in range(f):
            wv = w_ref[base2 + ((dy * 3 + dx) * f + i) * f + o]
            kk = (p * 2 + q) * f + i
            acc_ref[kk] = acc_ref[kk] + window * wv

    _phase_stencil_t(gpad_ref, f, hh, ww, sh0_ref, sh1_ref, emit_dc1)
    for k in range(4 * f):
        masked = jnp.where(c1_ref[0, k] > 0, acc_ref[k], 0.0)
        aux_ref[k] = masked
        gpad_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        gpad_ref[k, 1:hh + 1, 1:ww + 1] = masked

    # --- dw1/db1: window(input phases) x dc1
    for k in range(4 * ci):
        pp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        pp_ref[k, 1:hh + 1, 1:ww + 1] = x_ref[0, k]
    sums1 = {}

    def emit_dw1(r, s, dy, dx, i, window):
        for o in range(f):
            sm = jnp.sum(window * aux_ref[(r * 2 + s) * f + o])
            idx = ((dy * 3 + dx) * ci + i) * f + o
            sums1[idx] = sums1.get(idx, 0.0) + sm

    _phase_stencil(pp_ref, ci, f, hh, ww, sh0_ref, sh1_ref, emit_dw1)
    _flush(sums1)
    for o in range(f):
        sm = (jnp.sum(aux_ref[o]) + jnp.sum(aux_ref[f + o])
              + jnp.sum(aux_ref[2 * f + o]) + jnp.sum(aux_ref[3 * f + o]))
        wacc(n1 + o, sm)

    # --- dx = transposed conv1 stencil of padded dc1 (elidable: level 0
    # consumes raw data)
    for k in range(4 * ci):
        dx_ref[0, k] = jnp.zeros((hh, ww), jnp.float32)
    if need_dx:
        def emit_dx(r, s, dy, dx, o, window, p, q):
            for i in range(ci):
                wv = w_ref[((dy * 3 + dx) * ci + i) * f + o]
                kk = (p * 2 + q) * ci + i
                dx_ref[0, kk] = dx_ref[0, kk] + window * wv

        _phase_stencil_t(gpad_ref, f, hh, ww, sh0_ref, sh1_ref, emit_dx)


def _pack_w(w1, b1, w2, b2):
    return jnp.concatenate([
        w1.astype(jnp.float32).reshape(-1), b1.astype(jnp.float32),
        w2.astype(jnp.float32).reshape(-1), b2.astype(jnp.float32)])


def _fwd_call(x, wvec, ci, f, interpret):
    b, _, hh, ww = x.shape
    c1, conv, pool = pl.pallas_call(
        functools.partial(_fwd_kernel, ci=ci, f=f, hh=hh, ww=ww),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * ci, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4 * f, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, 4 * f, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, f, hh, ww), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((4 * ci, hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * f, hh + 2, ww + 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(wvec, x)
    return c1, conv, pool


def _bwd_call(x, c1, conv, gs, gp, wvec, ci, f, need_dx, interpret):
    b, _, hh, ww = x.shape
    n1, n2 = _wsizes(ci, f)
    nw = n1 + f + n2 + f
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, ci=ci, f=f, hh=hh, ww=ww,
                          need_dx=need_dx),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * ci, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * ci, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4 * ci, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((nw,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((4 * f, hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * max(f, ci), hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * f, hh, ww), jnp.float32),
            pltpu.VMEM((4 * f, hh, ww), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(wvec, x, c1, conv, gs, gp)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def enc_level_nchw(x, w1, b1, w2, b2, input_grad=True, interpret=False):
    '''One fused encoder level: ``chain(x, w1, b1, w2, b2)`` (relu chain)
    followed by 2x2 stride-2 maxpool, NCHW f32, 3x3 SAME convs.

    Returns ``(skip, pooled)`` with skip [B, f, H, W] and pooled
    [B, f, H/2, W/2]. ``input_grad=False`` elides the dx stencil.
    '''
    (skip, pooled), _ = _enc_fwd(x, w1, b1, w2, b2, input_grad, interpret)
    return skip, pooled


def _enc_fwd(x, w1, b1, w2, b2, input_grad, interpret):
    ci = x.shape[1]
    f = w2.shape[3]
    xp = phase_split(x.astype(jnp.float32))
    wvec = _pack_w(w1, b1, w2, b2)
    fwd = functools.partial(_fwd_call, ci=ci, f=f, interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        fwd = fastconv._shard_map_batch(
            lambda x_, wv_: fwd(x_, wv_), mesh, n_batch_in=1, n_out=3)
    c1, convp, pool = fwd(xp, wvec)
    return (phase_merge(convp), pool), (xp, c1, convp, w1, w2)


def _enc_bwd(input_grad, interpret, res, g):
    xp, c1, convp, w1, w2 = res
    gs, gp = g
    ci = xp.shape[1] // 4
    f = w2.shape[3]
    gsp = phase_split(gs)
    wvec = _pack_w(w1, jnp.zeros((f,), jnp.float32), w2,
                   jnp.zeros((f,), jnp.float32))
    bwd = functools.partial(_bwd_call, ci=ci, f=f, need_dx=input_grad,
                            interpret=interpret)
    mesh = _spmd_mesh(xp.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        bwd = fastconv._shard_map_batch(
            lambda *a: bwd(*a), mesh, n_batch_in=5, n_out=2,
            reduced_out=(1,))
    dxp, dw = bwd(xp, c1, convp, gsp, gp, wvec)
    n1, n2 = _wsizes(ci, f)
    dw1 = dw[:n1].reshape(3, 3, ci, f)
    db1 = dw[n1:n1 + f]
    b2o = n1 + f
    dw2 = dw[b2o:b2o + n2].reshape(3, 3, f, f)
    db2 = dw[b2o + n2:]
    return (phase_merge(dxp), dw1, db1, dw2, db2)


enc_level_nchw.defvjp(_enc_fwd, _enc_bwd)


def _spmd_mesh(b):
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


def enc_level_ok(xshape, filters, kernel_size, rate, padding, dtype):
    '''Static eligibility for the fused encoder level.'''
    from .. import gates
    if not gates.enabled('enc_level'):
        return False
    if kernel_size != 3 or rate != 2 or padding != 'SAME':
        return False
    if dtype not in (None, jnp.float32, 'float32'):
        return False
    try:
        import jax as _jax
        from ...parallel import mesh as mesh_lib
        interp = mesh_lib.pallas_interpret()
        if _jax.default_backend() == 'cpu' and not interp:
            return False
        if _jax.device_count() != 1 and not interp \
                and _spmd_mesh(xshape[0]) is None:
            return False
        b, ci, h, w = xshape
        f = filters
        if h % 2 or w % 2:
            return False
        hh, ww = h // 2, w // 2
        if ww % 128 or hh % 8:
            return False
        # unrolled-term budget (compile time)
        if 36 * ci * f > 4096 or 36 * f * f > 4096:
            return False
        # VMEM: blocks + padded phase-plane scratches, double-buffered
        pad_plane = 4 * (hh + 2) * (ww + 2)
        plane = 4 * hh * ww
        per = (2 * plane * (8 * ci + 17 * f)           # in/out blocks x2
               + pad_plane * (8 * f + 4 * max(f, ci) + 2)
               + plane * 8 * f)
        return per < _VMEM_LIMIT_BYTES
    except Exception:
        return False
