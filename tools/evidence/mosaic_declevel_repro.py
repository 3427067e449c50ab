#!/usr/bin/env python
'''Standalone repro: Mosaic miscompile of the fused decoder-level backward.

Self-contained — no repo imports. The kernel below is the backward of the
(now removed) whole-decoder-level kernel `ops/pallas/declevel.py` (git
history: e452fa9/656f319). Run on a real TPU, the SAME pallas kernel on
the SAME inputs produces different dx/dskip under Mosaic compilation vs
interpret mode:

    TPU v5e via axon relay, jax 0.8.x, 2026-08-20:
      dx     rel-err compiled-vs-interpret ~1.7e-1
      dskip  rel-err compiled-vs-interpret ~1.2e-1
      dw     (SMEM-accumulated weight grads) match to ~1e-7

    Interpret mode matches an independent XLA composition of the same
    math to 5e-7 (RESULTS.md round 4), so interpret is correct and the
    Mosaic compilation is the divergent one.

Usage (on TPU):  python tools/evidence/mosaic_declevel_repro.py
Optional shape args: --b 8 --cb 6 --cs 3 --f 3 --hh 128 --ww 128
Stage knobs (for minimization): --skip-dw2 --skip-dw1 --skip-dwt
drop the weight-grad stages that are NOT needed to reproduce the
dx/dskip divergence.

Kernel construct inventory (suspects): padded [C, H+2, W+2] VMEM scratch
planes written interior-only; lane-offset reads `ref[k, :, ox:ox+W]`
staged into aligned (H+2, W) scratches; sublane-window reads
`sh[oy:oy+H]` inside fully-unrolled tap loops; in-place accumulation
into VMEM scratches; SMEM vector accumulated across a sequential grid.
'''
import argparse
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pm(r, d):
    v = r + d - 1
    p = v % 2
    return p, (v - p) // 2 + 1


def _wsizes(cb, cs, f):
    return 4 * cb * f, 9 * (f + cs) * f, 9 * f * f


def _phase_stencil(src_ref, chans, f, hh, ww, sh0_ref, sh1_ref, emit):
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
    for s in range(2):
        for dx in range(3):
            q, ox = _pm(s, dx)
            for o in range(f):
                for r in range(2):
                    sh = sh0_ref if r == 0 else sh1_ref
                    sh[:] = g_ref[(r * 2 + s) * f + o, :, 2 - ox:2 - ox + ww]
                for r in range(2):
                    sh = sh0_ref if r == 0 else sh1_ref
                    for dy in range(3):
                        p, oy = _pm(r, dy)
                        emit(r, s, dy, dx, o, sh[2 - oy:2 - oy + hh], p, q)


def _tconv_phases(w_ref, x_ref, dst_ref, cb, f, hh, ww, with_bias, nt):
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


def _bwd_kernel(w_ref, x_ref, sp_ref, c1_ref, out_ref, g_ref,
                dx_ref, dsp_ref, dw_ref,
                sh0_ref, sh1_ref, gp_ref, pp_ref, aux_ref, acc_ref,
                *, cb, cs, f, hh, ww, skip_dw2, skip_dw1, skip_dwt):
    nt, n1, n2 = _wsizes(cb, cs, f)
    ct = f + cs
    base1 = nt + f
    base2 = base1 + n1 + f
    first = pl.program_id(0) == 0

    def wacc(idx, s):
        prev = jnp.where(first, 0.0, dw_ref[idx])
        dw_ref[idx] = prev + s

    def _flush(sums):
        for idx, val in sums.items():
            wacc(idx, val)

    for k in range(4 * f):
        g2 = jnp.where(out_ref[0, k] > 0, g_ref[0, k], 0.0)
        aux_ref[k] = g2
        gp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
        gp_ref[k, 1:hh + 1, 1:ww + 1] = g2

    if not skip_dw2:
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

    # dc1 = transposed conv2 stencil of padded g2, relu-masked
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

    if not skip_dw1:
        _tconv_phases(w_ref, x_ref, pp_ref, cb, f, hh, ww, True, nt)
        sums1 = {}

        def emit_dw1(r, s, dy, dx, i, window):
            for o in range(f):
                sm = jnp.sum(window * aux_ref[(r * 2 + s) * f + o])
                idx = base1 + ((dy * 3 + dx) * ct + i) * f + o
                sums1[idx] = sums1.get(idx, 0.0) + sm

        _phase_stencil(pp_ref, f, f, hh, ww, sh0_ref, sh1_ref, emit_dw1)
        _flush(sums1)
        for o in range(f):
            sm = (jnp.sum(aux_ref[o]) + jnp.sum(aux_ref[f + o])
                  + jnp.sum(aux_ref[2 * f + o]) + jnp.sum(aux_ref[3 * f + o]))
            wacc(base1 + n1 + o, sm)

    # dup (into acc) and dskip: transposed conv1 stencil
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

    if not skip_dw1:
        for k in range(4 * cs):
            pp_ref[k] = jnp.zeros((hh + 2, ww + 2), jnp.float32)
            pp_ref[k, 1:hh + 1, 1:ww + 1] = sp_ref[0, k]
        sums1s = {}

        def emit_dw1s(r, s, dy, dx, i, window):
            for o in range(f):
                sm = jnp.sum(window * aux_ref[(r * 2 + s) * f + o])
                idx = base1 + ((dy * 3 + dx) * ct + f + i) * f + o
                sums1s[idx] = sums1s.get(idx, 0.0) + sm

        _phase_stencil(pp_ref, cs, f, hh, ww, sh0_ref, sh1_ref, emit_dw1s)
        _flush(sums1s)

    # tconv backward from dup: dx (+ dwt/dbt unless skipped)
    for i in range(cb):
        dx_ref[0, i] = jnp.zeros((hh, ww), jnp.float32)
        for p in range(2):
            for q in range(2):
                for o in range(f):
                    wv = w_ref[(((1 - p) * 2 + (1 - q)) * cb + i) * f + o]
                    dx_ref[0, i] = dx_ref[0, i] + \
                        acc_ref[(p * 2 + q) * f + o] * wv
    if not skip_dwt:
        for p in range(2):
            for q in range(2):
                for i in range(cb):
                    for o in range(f):
                        sm = jnp.sum(x_ref[0, i]
                                     * acc_ref[(p * 2 + q) * f + o])
                        wacc((((1 - p) * 2 + (1 - q)) * cb + i) * f + o, sm)
        for o in range(f):
            sm = (jnp.sum(acc_ref[o]) + jnp.sum(acc_ref[f + o])
                  + jnp.sum(acc_ref[2 * f + o]) + jnp.sum(acc_ref[3 * f + o]))
            wacc(nt + o, sm)


def _bwd_call(x, sp, c1, out, g, wvec, cb, cs, f, interpret, skips):
    b, _, hh, ww = x.shape
    nt, n1, n2 = _wsizes(cb, cs, f)
    nw = nt + f + n1 + f + n2 + f
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cb=cb, cs=cs, f=f, hh=hh, ww=ww,
                          **skips),
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
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(wvec, x, sp, c1, out, g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=8)
    ap.add_argument('--cb', type=int, default=6)
    ap.add_argument('--cs', type=int, default=3)
    ap.add_argument('--f', type=int, default=3)
    ap.add_argument('--hh', type=int, default=128)
    ap.add_argument('--ww', type=int, default=128)
    ap.add_argument('--skip-dw2', action='store_true')
    ap.add_argument('--skip-dw1', action='store_true')
    ap.add_argument('--skip-dwt', action='store_true')
    a = ap.parse_args()
    skips = dict(skip_dw2=a.skip_dw2, skip_dw1=a.skip_dw1,
                 skip_dwt=a.skip_dwt)

    rng = np.random.RandomState(0)
    b, cb, cs, f, hh, ww = a.b, a.cb, a.cs, a.f, a.hh, a.ww
    nt, n1, n2 = _wsizes(cb, cs, f)
    nw = nt + f + n1 + f + n2 + f
    args = (
        jnp.asarray(rng.randn(b, cb, hh, ww), jnp.float32),
        jnp.asarray(rng.randn(b, 4 * cs, hh, ww), jnp.float32),
        jnp.asarray(np.abs(rng.randn(b, 4 * f, hh, ww)) - 0.3, jnp.float32),
        jnp.asarray(rng.randn(b, 4 * f, hh, ww), jnp.float32),
        jnp.asarray(rng.randn(b, 4 * f, hh, ww), jnp.float32),
        jnp.asarray(rng.randn(nw) * 0.2, jnp.float32),
    )

    print(f'backend={jax.default_backend()} shape b={b} cb={cb} cs={cs} '
          f'f={f} hh={hh} ww={ww} skips={skips}')
    ri = _bwd_call(*args, cb, cs, f, True, skips)
    ri = [np.asarray(t) for t in ri]
    rc = _bwd_call(*args, cb, cs, f, False, skips)
    rc = [np.asarray(t) for t in rc]

    bad = False
    for name, i_, c_ in zip(['dx', 'dskip', 'dw'], ri, rc):
        err = float(np.max(np.abs(i_ - c_)))
        scale = float(np.max(np.abs(i_))) + 1e-9
        flag = 'DIVERGED' if err / scale > 1e-4 else 'ok'
        bad |= flag == 'DIVERGED'
        print(f'  {name}: maxabs {err:.3e} rel {err / scale:.2e} {flag}')
    print('MISCOMPILE REPRODUCED' if bad else 'no divergence')


if __name__ == '__main__':
    main()
