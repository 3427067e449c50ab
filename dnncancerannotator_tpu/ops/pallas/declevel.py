'''Whole decoder-level Pallas kernel: tconv + skip-concat + ConvChain fused.

One decoder level of the small U-Net (reference
annotator/models/tf_models/components.py:84-166: ConvTranspose(2,2) ->
center-crop skip -> concat -> Conv2D x2) currently runs as 3-4 separate
kernels with HBM round-trips between them (tconv out ~6 MB, concat ~12 MB at
the 256^2 level) plus per-op scheduling gaps — the op-launch overhead that
dominates the small model (RESULTS.md round 2/3).

This kernel computes the whole level in ONE Pallas program per image, in
**phase space**: every full-resolution [C, H, W] plane is carried as four
half-resolution phase planes ``plane[p][q][y, x] = full[2y+p, 2x+q]``.
That representation makes every troublesome op trivial and *exact*:

- the stride-2 ConvTranspose is four independent 1x1-style contractions
  (output phase (p,q) = sum_ci x[ci] * wt[1-p, 1-q, ci, :] + bias — the
  kernel-flip convention of lax.conv_transpose) — NO spatial interleave
  exists anywhere;
- the channel concat is just iterating over both sources' phase planes;
- a SAME 3x3 conv at full resolution becomes, per output phase (r, s), a
  3x3 stencil over the phase planes with source phase p = (r+dy-1) mod 2
  and row offset (r+dy-1-p)/2 in {-1, 0, +1} — the standard padded-plane
  tap loop (same idiom as conv_kernel.py), identical madd count.

The skip arrives phase-decomposed and the output leaves phase-decomposed;
XLA performs the strided phase split/merge outside the kernel (strided
slices lower to cheap pad-interleaves on TPU — RESULTS.md round 2), so the
kernel itself contains zero relayouts, zero permutation-matrix copies, and
bit-exact float math per tap.

The backward emits dx, d(skip-phases) and all six weight/bias grads in one
kernel, recomputing the tconv phases in-kernel instead of saving them.
All accumulation is in-place into refs (value-style chains blow Mosaic's
VMEM stack at these unroll counts). f32, NCHW, kernel 3, SAME, stride 1,
rate 2 only.
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT_BYTES = 40 * 1024 * 1024


def _pm(r, d):
    '''Phase-space tap mapping: output phase ``r``, tap ``d`` (0..2) ->
    (source phase, padded-plane sublane/lane offset 0..2).'''
    v = r + d - 1
    p = v % 2
    return p, (v - p) // 2 + 1


def _wsizes(cb, cs, f):
    nt = 4 * cb * f          # wt [2, 2, cb, f]
    n1 = 9 * (f + cs) * f    # w1 [3, 3, f+cs, f]
    n2 = 9 * f * f           # w2 [3, 3, f, f]
    return nt, n1, n2


def _phase_stencil(src_ref, chans, f, hh, ww, sh0_ref, sh1_ref, emit):
    '''Shared phase-space 3x3 stencil driver.

    For each column phase ``s``/lane tap ``dx``/input plane ``i``, stage the
    two row-phase planes of source column (q, ox) into the aligned shift
    scratches, then hand each (r, dy) output-phase window to ``emit(r, s,
    dy, dx, i, window)``. One staged copy pair serves all six (r, dy)
    windows — the conv_kernel.py staging idiom lifted to phase space.
    '''
    for s in range(2):
        for dx in range(3):
            q, ox = _pm(s, dx)
            for i in range(chans):
                sh0_ref[:] = src_ref[q * chans + i, :, ox:ox + ww]
                sh1_ref[:] = src_ref[2 * chans + q * chans + i, :,
                                     ox:ox + ww]
                for r in range(2):
                    for dy in range(3):
                        p, oy = _pm(r, dy)
                        sh = sh0_ref if p == 0 else sh1_ref
                        emit(r, s, dy, dx, i, sh[oy:oy + hh])


def _phase_stencil_t(g_ref, f, hh, ww, sh0_ref, sh1_ref, emit):
    '''Transposed driver: stage the padded OUTPUT-phase cotangent planes at
    the complementary offsets (2-oy, 2-ox) and hand windows to
    ``emit(r, s, dy, dx, o, window)`` for scatter into input phases.'''
    for s in range(2):
        for dx in range(3):
            q, ox = _pm(s, dx)
            for o in range(f):
                for r in range(2):
                    # plane (r*2+s) channel o, lane offset 2-ox
                    sh = sh0_ref if r == 0 else sh1_ref
                    sh[:] = g_ref[(r * 2 + s) * f + o, :, 2 - ox:2 - ox + ww]
                for r in range(2):
                    sh = sh0_ref if r == 0 else sh1_ref
                    for dy in range(3):
                        p, oy = _pm(r, dy)
                        emit(r, s, dy, dx, o, sh[2 - oy:2 - oy + hh], p, q)


def _tconv_phases(w_ref, x_ref, dst_ref, cb, f, hh, ww, with_bias, nt):
    '''tconv phases -> padded planes of dst_ref (interior writes).'''
    for p in range(2):
        for q in range(2):
            for o in range(f):
                k = (p * 2 + q) * f + o
                dst_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
                acc = (jnp.full((hh, ww), w_ref[nt + o], jnp.float32)
                       if with_bias else jnp.zeros((hh, ww), jnp.float32))
                for i in range(cb):
                    wv = w_ref[(((1 - p) * 2 + (1 - q)) * cb + i) * f + o]
                    acc = acc + x_ref[0, i] * wv
                dst_ref[k, 1:hh + 1, 1:ww + 1] = acc


def _fwd_kernel(w_ref, x_ref, sp_ref, c1_ref, out_ref,
                sh0_ref, sh1_ref, upp_ref, spp_ref, c1p_ref,
                *, cb, cs, f, hh, ww):
    '''One image. x [1, cb, hh, ww]; sp [1, 4*cs, hh, ww] (phase-major:
    plane (p*2+q)*cs + c); outputs c1 [1, 4*f, hh, ww] (post-relu residual)
    and out [1, 4*f, hh, ww], both phase-major.

    SMEM weights: [wt | bt | w1 | b1 | w2 | b2]; w1's input-channel order is
    [tconv-out channels | skip channels] (the concat order, components.py:
    158-166).
    '''
    nt, n1, n2 = _wsizes(cb, cs, f)
    ct = f + cs
    base1 = nt + f
    base2 = base1 + n1 + f

    _tconv_phases(w_ref, x_ref, upp_ref, cb, f, hh, ww, True, nt)
    for k in range(4 * cs):
        spp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        spp_ref[k, 1:hh + 1, 1:ww + 1] = sp_ref[0, k]

    # --- conv1 (dual-source [up | skip]) + relu
    for k in range(4):
        for o in range(f):
            c1_ref[0, k * f + o] = jnp.full(
                (hh, ww), w_ref[base1 + n1 + o], jnp.float32)

    def emit1(ch0):
        def emit(r, s, dy, dx, i, window):
            for o in range(f):
                wv = w_ref[base1 + ((dy * 3 + dx) * ct + ch0 + i) * f + o]
                kk = (r * 2 + s) * f + o
                c1_ref[0, kk] = c1_ref[0, kk] + window * wv
        return emit

    _phase_stencil(upp_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit1(0))
    _phase_stencil(spp_ref, cs, f, hh, ww, sh0_ref, sh1_ref, emit1(f))
    for k in range(4 * f):
        act = jnp.maximum(c1_ref[0, k], 0.0)
        c1_ref[0, k] = act
        c1p_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        c1p_ref[k, 1:hh + 1, 1:ww + 1] = act

    # --- conv2 + relu
    for k in range(4):
        for o in range(f):
            out_ref[0, k * f + o] = jnp.full(
                (hh, ww), w_ref[base2 + n2 + o], jnp.float32)

    def emit2(r, s, dy, dx, i, window):
        for o in range(f):
            wv = w_ref[base2 + ((dy * 3 + dx) * f + i) * f + o]
            kk = (r * 2 + s) * f + o
            out_ref[0, kk] = out_ref[0, kk] + window * wv

    _phase_stencil(c1p_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit2)
    for k in range(4 * f):
        out_ref[0, k] = jnp.maximum(out_ref[0, k], 0.0)


def _bwd_kernel(w_ref, x_ref, sp_ref, c1_ref, out_ref, g_ref,
                dx_ref, dsp_ref, dw_ref,
                sh0_ref, sh1_ref, gp_ref, pp_ref, aux_ref, acc_ref,
                *, cb, cs, f, hh, ww):
    '''One image: dx + dskip-phases + all weight/bias grads (dw_ref SMEM,
    accumulated across the sequential batch grid).

    Scratch roles over time: aux [4f, hh, ww] holds aligned g2, then aligned
    (relu-masked) dc1; gp [4f, hh+2, ww+2] the padded versions of the same;
    pp [4*max(f,cs), hh+2, ww+2] holds padded c1, then padded tconv phases,
    then padded skip phases; acc [4f, hh, ww] is the in-place accumulator
    for dc1 and then for dup (the tconv-output cotangent).
    '''
    nt, n1, n2 = _wsizes(cb, cs, f)
    ct = f + cs
    base1 = nt + f
    base2 = base1 + n1 + f
    first = pl.program_id(0) == 0

    def wacc(idx, s):
        # exactly ONE call per idx per grid step: the first image seeds the
        # accumulator, later images add. Per-phase partial sums are folded
        # at trace time (``_flush``) before reaching here — a second call
        # for the same idx would re-seed and drop the earlier phases.
        prev = jnp.where(first, 0.0, dw_ref[idx])
        dw_ref[idx] = prev + s

    def _flush(sums):
        for idx, val in sums.items():
            wacc(idx, val)

    # g2 = relu'(out) * g
    for k in range(4 * f):
        g2 = jnp.where(out_ref[0, k] > 0, g_ref[0, k], 0.0)
        aux_ref[k] = g2
        gp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        gp_ref[k, 1:hh + 1, 1:ww + 1] = g2
    for k in range(4 * f):
        pp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        pp_ref[k, 1:hh + 1, 1:ww + 1] = c1_ref[0, k]

    # --- dw2/db2: window(c1 phases) x g2
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

    # --- dc1 = transposed conv2 stencil of padded g2, relu-masked
    for k in range(4 * f):
        acc_ref[k] = jnp.zeros((hh, ww), jnp.float32)

    def emit_dc1(r, s, dy, dx, o, window, p, q):
        for i in range(f):
            wv = w_ref[base2 + ((dy * 3 + dx) * f + i) * f + o]
            kk = (p * 2 + q) * f + i
            acc_ref[kk] = acc_ref[kk] + window * wv

    _phase_stencil_t(gp_ref, f, hh, ww, sh0_ref, sh1_ref, emit_dc1)
    for k in range(4 * f):
        masked = jnp.where(c1_ref[0, k] > 0, acc_ref[k], 0.0)
        aux_ref[k] = masked
        gp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        gp_ref[k, 1:hh + 1, 1:ww + 1] = masked

    # --- dw1 (up half): rebuild padded tconv phases into pp
    _tconv_phases(w_ref, x_ref, pp_ref, cb, f, hh, ww, True, nt)

    def emit_dw1(ch0, sums):
        def emit(r, s, dy, dx, i, window):
            for o in range(f):
                sm = jnp.sum(window * aux_ref[(r * 2 + s) * f + o])
                idx = base1 + ((dy * 3 + dx) * ct + ch0 + i) * f + o
                sums[idx] = sums.get(idx, 0.0) + sm
        return emit

    sums1 = {}
    _phase_stencil(pp_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit_dw1(0, sums1))
    _flush(sums1)
    for o in range(f):
        sm = (jnp.sum(aux_ref[o]) + jnp.sum(aux_ref[f + o])
              + jnp.sum(aux_ref[2 * f + o]) + jnp.sum(aux_ref[3 * f + o]))
        wacc(base1 + n1 + o, sm)

    # --- dup (into acc) and dskip (into dsp_ref): transposed conv1 stencil
    for k in range(4 * f):
        acc_ref[k] = jnp.zeros((hh, ww), jnp.float32)
    for k in range(4 * cs):
        dsp_ref[0, k] = jnp.zeros((hh, ww), jnp.float32)

    def emit_din(r, s, dy, dx, o, window, p, q):
        for i in range(f):
            wv = w_ref[base1 + ((dy * 3 + dx) * ct + i) * f + o]
            kk = (p * 2 + q) * f + i
            acc_ref[kk] = acc_ref[kk] + window * wv
        for i in range(cs):
            wv = w_ref[base1 + ((dy * 3 + dx) * ct + f + i) * f + o]
            kk = (p * 2 + q) * cs + i
            dsp_ref[0, kk] = dsp_ref[0, kk] + window * wv

    _phase_stencil_t(gp_ref, f, hh, ww, sh0_ref, sh1_ref, emit_din)

    # --- dw1 (skip half): padded skip phases into pp
    for k in range(4 * cs):
        pp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        pp_ref[k, 1:hh + 1, 1:ww + 1] = sp_ref[0, k]
    sums1s = {}
    _phase_stencil(pp_ref, cs, f, hh, ww, sh0_ref, sh1_ref,
                   emit_dw1(f, sums1s))
    _flush(sums1s)

    # --- tconv backward from dup (acc_ref): dx, dwt, dbt
    for i in range(cb):
        dx_ref[0, i] = jnp.zeros((hh, ww), jnp.float32)
        for p in range(2):
            for q in range(2):
                for o in range(f):
                    wv = w_ref[(((1 - p) * 2 + (1 - q)) * cb + i) * f + o]
                    dx_ref[0, i] = dx_ref[0, i] + \
                        acc_ref[(p * 2 + q) * f + o] * wv
    for p in range(2):
        for q in range(2):
            for i in range(cb):
                for o in range(f):
                    sm = jnp.sum(x_ref[0, i] * acc_ref[(p * 2 + q) * f + o])
                    wacc((((1 - p) * 2 + (1 - q)) * cb + i) * f + o, sm)
    for o in range(f):
        sm = (jnp.sum(acc_ref[o]) + jnp.sum(acc_ref[f + o])
              + jnp.sum(acc_ref[2 * f + o]) + jnp.sum(acc_ref[3 * f + o]))
        wacc(nt + o, sm)


def _pack_w(wt, bt, w1, b1, w2, b2):
    return jnp.concatenate([
        wt.astype(jnp.float32).reshape(-1), bt.astype(jnp.float32),
        w1.astype(jnp.float32).reshape(-1), b1.astype(jnp.float32),
        w2.astype(jnp.float32).reshape(-1), b2.astype(jnp.float32)])


def phase_split(x):
    '''[B, C, H, W] -> phase-major [B, 4C, H/2, W/2] (plane (p*2+q)*C + c).'''
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return jnp.transpose(x, (0, 3, 5, 1, 2, 4)).reshape(
        b, 4 * c, h // 2, w // 2)


def phase_merge(xp):
    '''Inverse of phase_split.'''
    b, c4, hh, ww = xp.shape
    c = c4 // 4
    x = xp.reshape(b, 2, 2, c, hh, ww)
    return jnp.transpose(x, (0, 3, 4, 1, 5, 2)).reshape(
        b, c, hh * 2, ww * 2)


def _fwd_call(x, sp, wvec, cb, cs, f, interpret):
    b, _, hh, ww = x.shape
    c1, out = pl.pallas_call(
        functools.partial(_fwd_kernel, cb=cb, cs=cs, f=f, hh=hh, ww=ww),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cb, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cs, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4 * f, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, 4 * f, hh, ww), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((4 * f, hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * cs, hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * f, hh + 2, ww + 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(wvec, x, sp)
    return c1, out


def _bwd_call(x, sp, c1, out, g, wvec, cb, cs, f, interpret):
    b, _, hh, ww = x.shape
    nt, n1, n2 = _wsizes(cb, cs, f)
    nw = nt + f + n1 + f + n2 + f
    dx, dsp, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, cb=cb, cs=cs, f=f, hh=hh, ww=ww),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cb, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cs, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cb, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cs, hh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cb, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, 4 * cs, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((nw,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((hh + 2, ww), jnp.float32),
            pltpu.VMEM((4 * f, hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * max(f, cs), hh + 2, ww + 2), jnp.float32),
            pltpu.VMEM((4 * f, hh, ww), jnp.float32),
            pltpu.VMEM((4 * f, hh, ww), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(wvec, x, sp, c1, out, g)
    return dx, dsp, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def dec_level_nchw(x, skip, wt, bt, w1, b1, w2, b2, interpret=False):
    '''One fused decoder level:
    ``chain(concat(tconv(x, wt)+bt, skip), w1, b1, w2, b2)`` (relu chain),
    NCHW f32, tconv kernel=stride=2, convs 3x3 SAME stride 1.

    w1's input-channel axis is ordered [tconv-out | skip] (concat order).
    Returns [B, f, H, W] where (H, W) = skip's spatial size = 2x x's.
    '''
    out, _ = _dec_fwd(x, skip, wt, bt, w1, b1, w2, b2, interpret)
    return out


def _dec_fwd(x, skip, wt, bt, w1, b1, w2, b2, interpret):
    cb = x.shape[1]
    cs = skip.shape[1]
    f = w2.shape[3]
    sp = phase_split(skip.astype(jnp.float32))
    wvec = _pack_w(wt, bt, w1, b1, w2, b2)
    fwd = functools.partial(_fwd_call, cb=cb, cs=cs, f=f,
                            interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        fwd = fastconv._shard_map_batch(
            lambda x_, sp_, wv_: fwd(x_, sp_, wv_), mesh,
            n_batch_in=2, n_out=2)
    c1, outp = fwd(x.astype(jnp.float32), sp, wvec)
    return phase_merge(outp), (x.astype(jnp.float32), sp, c1, outp,
                               wt, bt, w1, w2)


def _dec_bwd(interpret, res, g):
    # bt rides along: the backward rebuilds the tconv phases (conv1's
    # input) in-kernel instead of saving them, and that rebuild needs the
    # real bias — dw1's up-half is input x dc1.
    x, sp, c1, outp, wt, bt, w1, w2 = res
    cb = x.shape[1]
    cs = sp.shape[1] // 4
    f = w2.shape[3]
    gp = phase_split(g)
    wvec = _pack_w(wt, bt, w1,
                   jnp.zeros((f,), jnp.float32), w2,
                   jnp.zeros((f,), jnp.float32))
    bwd = functools.partial(_bwd_call, cb=cb, cs=cs, f=f,
                            interpret=interpret)
    mesh = _spmd_mesh(x.shape[0])
    if mesh is not None and jax.device_count() != 1:
        from ...models import fastconv
        bwd = fastconv._shard_map_batch(
            lambda *a: bwd(*a), mesh, n_batch_in=5, n_out=3,
            reduced_out=(2,))
    dx, dsp, dw = bwd(x, sp, c1, outp, gp, wvec)
    nt, n1, n2 = _wsizes(cb, cs, f)
    ct = f + cs
    dwt = dw[:nt].reshape(2, 2, cb, f)
    dbt = dw[nt:nt + f]
    b1o = nt + f
    dw1 = dw[b1o:b1o + n1].reshape(3, 3, ct, f)
    db1 = dw[b1o + n1:b1o + n1 + f]
    b2o = b1o + n1 + f
    dw2 = dw[b2o:b2o + n2].reshape(3, 3, f, f)
    db2 = dw[b2o + n2:]
    return (dx, phase_merge(dsp), dwt, dbt, dw1, db1, dw2, db2)


dec_level_nchw.defvjp(_dec_fwd, _dec_bwd)


def _spmd_mesh(b):
    from ...models import fastconv
    return fastconv._conv_spmd_mesh(b)


def dec_level_ok(xshape, skipshape, filters, kernel_size, rate, padding,
                 dtype):
    '''Static eligibility for the fused decoder level.

    QUARANTINED on real TPU (round 4): the Mosaic-compiled backward
    produces dx/dskip off by rel ~1.5e-1 at the production shape
    (x [8,6,128,128]) while interpret mode matches the composed XLA path
    to 5e-7 at the identical shape — a compile-level divergence, not
    kernel math (tools/chip_declevel.py; RESULTS.md round 4). Since the
    sibling enclevel kernel — numerically perfect on chip — still LOSES
    21% in-model (fusion-barrier effect at level scale), fixing the
    miscompile buys nothing; the kernel stays available for interpret
    (CPU test) runs only.
    '''
    from .. import gates
    if not gates.enabled('dec_level'):
        return False
    try:
        from ...parallel import mesh as mesh_lib
        if not mesh_lib.pallas_interpret():
            return False
    except Exception:
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
        b, cb, hh, ww = xshape
        _, cs, h, w = skipshape
        f = filters
        if (h, w) != (2 * hh, 2 * ww) or hh % 2 or ww % 2:
            return False
        if ww % 128 or hh % 8:
            return False
        # unrolled-term budget (compile time): conv1 is the big one
        if 36 * (f + cs) * f > 4096 or 4 * cb * f > 512:
            return False
        # VMEM: blocks + padded phase-plane scratches, double-buffered
        pad_plane = 4 * (hh + 2) * (ww + 2)
        plane = 4 * hh * ww
        per = (2 * plane * (cb + 4 * cs + 12 * f)      # in/out blocks
               + pad_plane * (8 * f + 4 * max(f, cs) + 2)
               + plane * 8 * f)
        return per < _VMEM_LIMIT_BYTES
    except Exception:
        return False
