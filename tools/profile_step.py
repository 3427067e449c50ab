'''Profile the unet.yaml train step on the real chip: capture a
jax.profiler trace of the resident-input scan step and histogram the
device ops (count, total device time, inferred scheduling gaps).

Usage: python tools/profile_step.py [--steps 10] [--out /tmp/prof]
'''

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def build_engine(size=256, batch=8, steps_per_call=10, model='small',
                 precision=None):
    import yaml
    from dnncancerannotator_tpu import engine as engine_lib

    model_options = {
        'small': dict(n_filters_first=3, n_downsample=3, rate=2,
                      kernel_size=3, conv_stride=1, bn=False,
                      padding='same'),
        # unet_big.yaml: the production-scale 31M-param model
        'big': dict(n_filters_first=64, n_downsample=4, rate=2,
                    kernel_size=3, conv_stride=1, bn=True,
                    padding='same'),
    }[model]
    cfg = {
        'model': 'UNetAnnotator',
        'model_options': model_options,
        'deploy_options': {
            'optimizer': 'adam',
            'loss': {'class_name': 'WeightedCrossentropy',
                     'config': {'weight_mul': 3.0}},
            'enable_multigpu': False,
            'steps_per_call': steps_per_call,
            **({'precision': precision} if precision else {}),
        },
    }
    cfg = yaml.safe_load(yaml.safe_dump(cfg))
    return engine_lib.Engine(cfg, seed=0), size, batch


class _DS:
    slice_types = ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')
    augment_methods = [
        ('random_crop', dict(output_size=(256, 256))),
        ('random_flip', {}),
        ('random_contrast', dict(target_channels=[0, 1, 2, 3, 4])),
        ('random_warp', {}),
    ]
    batch_size = 8
    feature_shape = (8, 256, 256, 5)

    def __init__(self, batch=8):
        self.batch_size = batch
        self.feature_shape = (batch, 256, 256, 5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/prof')
    p.add_argument('--steps', type=int, default=10)
    p.add_argument('--top', type=int, default=30)
    p.add_argument('--model', default='small', choices=('small', 'big'))
    p.add_argument('--precision', default=None)
    p.add_argument('--dump-hlo', default=None,
                   help='write the optimized train-step HLO to this path')
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--copies', action='store_true',
                   help='per-copy accounting (shape/bytes need --dump-hlo)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    eng, size, batch = build_engine(steps_per_call=args.steps,
                                    model=args.model,
                                    precision=args.precision)
    batch = args.batch
    eng.build((batch, 256, 256, 5))
    # device-resident data tensor: N slices of (size+12)^2 x 6 channels
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (64, size + 12, size + 12, 6), np.uint8)
    sample_shape = data.shape[1:]
    # the resident pool rides flat channel-major [N, C*h*w]
    # (see _make_resident_train_step / engine.train device_put)
    data_dev = jax.device_put(
        jnp.asarray(np.ascontiguousarray(
            data.transpose(0, 3, 1, 2)).reshape(64, -1)), eng._rep)
    starts = jax.device_put(jnp.zeros((1,), jnp.int32), eng._rep)
    counts = jax.device_put(jnp.full((1,), 64, jnp.int32), eng._rep)
    key = jax.random.PRNGKey(0)

    step = eng._make_resident_train_step(_DS(batch), 1, False, args.steps,
                                         sample_shape)
    if args.dump_hlo:
        # the AOT lower().compile() is a SECOND full compile on top of the
        # jit warm-up (~10 min each through a cold relay) — reuse a prior
        # dump when present (the compile is deterministic, so instance
        # names still match the trace)
        if os.path.exists(args.dump_hlo) and os.path.getsize(args.dump_hlo):
            print('reusing existing HLO at', args.dump_hlo)
        else:
            txt = step.lower(eng.state, data_dev, starts, counts,
                             key).compile().as_text()
            with open(args.dump_hlo, 'w') as f:
                f.write(txt)
            print('wrote optimized HLO to', args.dump_hlo, len(txt),
                  'bytes')
    # warm up / compile
    state, losses, probs, y = step(eng.state, data_dev, starts, counts, key)
    float(np.asarray(losses)[-1])

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    state, losses, probs, y = step(state, data_dev, starts, counts, key)
    float(np.asarray(losses)[-1])
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(
        args.out, '**', '*.trace.json.gz'), recursive=True)
    assert traces, 'no trace captured'
    trace = json.load(gzip.open(sorted(traces)[-1]))
    events = trace['traceEvents']

    # find the device lane: pid whose name mentions TPU/device, else the
    # pid with the most complete events that isn't python/host
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name' and 'args' in e}
    cand = [pid for pid, name in pid_names.items()
            if 'TPU' in name or 'Device' in name or '/device' in name.lower()]
    complete = [e for e in events if e.get('ph') == 'X']
    if cand:
        dev_events = [e for e in complete if e['pid'] in cand]
    else:
        by_pid = collections.Counter(e['pid'] for e in complete)
        host_pids = {pid for pid, name in pid_names.items()
                     if 'python' in name.lower() or 'Host' in name}
        pid = max((p for p in by_pid if p not in host_pids),
                  key=lambda p: by_pid[p])
        dev_events = [e for e in complete if e['pid'] == pid]
        cand = [pid]
    print('device pids:', {p: pid_names.get(p) for p in cand})

    # only the bottom-most lane (actual op executions have names like
    # fusion.N, scan loops add nesting; use tid with most events)
    by_tid = collections.Counter(e['tid'] for e in dev_events)
    tid = max(by_tid, key=lambda t: by_tid[t])
    ops = sorted((e for e in dev_events if e['tid'] == tid),
                 key=lambda e: e['ts'])
    total_ops = len(ops)
    t0, t1 = ops[0]['ts'], max(e['ts'] + e['dur'] for e in ops)
    busy = sum(e['dur'] for e in ops)
    span = t1 - t0
    print(f'device lane tid={tid}: {total_ops} op events, span '
          f'{span/1e3:.3f} ms, busy {busy/1e3:.3f} ms, gaps '
          f'{(span-busy)/1e3:.3f} ms')

    agg = collections.defaultdict(lambda: [0, 0.0])
    for e in ops:
        # strip trailing .N indices for grouping
        name = e['name']
        base = name.rstrip('0123456789.')
        agg[base][0] += 1
        agg[base][1] += e['dur']
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f'{"op":40s} {"count":>6s} {"total_us":>10s}')
    for name, (cnt, dur) in rows[:args.top]:
        print(f'{name[:40]:40s} {cnt:6d} {dur:10.1f}')
    print(f'... {len(rows)} distinct op groups, '
          f'{args.steps} inner steps -> {total_ops/args.steps:.0f} '
          'ops/step')

    # second view: top individual instances (exact names, with any HLO
    # detail the trace carries) — 'fusion' above is a grab-bag
    inst = collections.defaultdict(lambda: [0, 0.0, ''])
    for e in ops:
        rec = inst[e['name']]
        rec[0] += 1
        rec[1] += e['dur']
        if not rec[2] and e.get('args'):
            rec[2] = str(e['args'].get('long_name')
                         or e['args'].get('hlo_op') or '')[:100]
    print()
    print(f'{"instance":36s} {"count":>5s} {"total_us":>9s}  detail')
    for name, (cnt, dur, detail) in sorted(
            inst.items(), key=lambda kv: -kv[1][1])[:args.top]:
        print(f'{name[:36]:36s} {cnt:5d} {dur:9.1f}  {detail}')

    if args.copies:
        _copy_accounting(inst, args)


def _copy_accounting(inst, args):
    '''Per-copy accounting (VERDICT r4 #4): every copy/transpose/bitcast
    instance with its device time and, when --dump-hlo was given, its
    shape and bytes from the optimized HLO text.'''
    import re
    shapes = {}
    if args.dump_hlo and os.path.exists(args.dump_hlo):
        pat = re.compile(
            r'%?([\w.-]+) = ([a-z0-9]+)\[([0-9,]*)\][^=]*? '
            r'(copy|transpose|bitcast)\(')
        for m in pat.finditer(open(args.dump_hlo).read()):
            name, dtype, dims, _ = m.groups()
            n = 1
            for d in dims.split(','):
                if d:
                    n *= int(d)
            bits = int(re.sub('[a-z]', '', dtype) or 32)
            shapes[name] = (f'{dtype}[{dims}]', n * bits // 8)
    rows = [(name, cnt, dur) for name, (cnt, dur, _) in inst.items()
            if name.split('.')[0] in ('copy', 'transpose', 'bitcast',
                                      'copy-start', 'copy-done')]
    rows.sort(key=lambda r: -r[2])
    tot = sum(r[2] for r in rows)
    print(f'\n== copy bucket: {len(rows)} instances, {tot:.1f} us total '
          f'({tot / args.steps:.1f} us/step) ==')
    print(f'{"instance":24s} {"count":>5s} {"us":>8s} {"us/step":>8s} '
          f'{"shape":>24s} {"MB":>7s} {"GB/s":>7s}')
    for name, cnt, dur in rows:
        shape, nbytes = shapes.get(name, ('?', 0))
        bw = (2 * nbytes * cnt / 1e9) / (dur / 1e6) if dur and nbytes else 0
        print(f'{name[:24]:24s} {cnt:5d} {dur:8.1f} '
              f'{dur / args.steps:8.2f} {shape[:24]:>24s} '
              f'{nbytes / 1e6:7.2f} {bw:7.0f}')


if __name__ == '__main__':
    main()
    os._exit(0)
