#!/usr/bin/env python
'''Tracked benchmark for the production-scale model (configs/unet_big.yaml:
64 filters, 4 levels, BN, 31M params; batch 8 @ 256^2, full augmentation).

Same differential-timing methodology as bench.py (whole-chunk legs, MIN
over repeats; see bench.py:101-122). Prints ONE JSON line:

  {"metric": "train_throughput_unet_big", "value": N,
   "unit": "slices/s/chip", "precision": "bfloat16", "conv_mfu": F}

``conv_mfu`` counts 3x analytic forward conv FLOPs (fwd + dx + dw) against
the 197 TF/s bf16 chip peak — the methodology RESULTS.md round 2 documents
(the f32 row also uses the bf16 peak: XLA:TPU lowers f32 convs with bf16
multiplies by default, so a separate f32 peak would be fictitious).

Env knobs:
  BENCH_BIG_PRECISION=float32|bfloat16   (default: the config's bfloat16)
  BENCH_SPC, BENCH_TMPDIR                 as bench.py
'''
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuse the synth data + operating point)

BATCH = bench.BATCH
CROP = bench.CROP
WARMUP = 10
STEPS = 120
PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16


def conv_flops_per_step(n_filters_first=64, n_down=4, rate=2, k=3,
                        size=CROP, batch=BATCH):
    '''Analytic conv FLOPs for one train step of the UNet topology:
    2*H*W*Cin*Cout*k^2 per conv forward, x3 for fwd+dx+dw, x batch.
    Mirrors models/unet.py topology (2 convs per level, tconv + 2 convs
    per decoder level, 1x1 head).'''
    total = 0
    f, cin, s = n_filters_first, 5, size
    enc = []
    for _ in range(n_down):
        total += s * s * cin * f * k * k + s * s * f * f * k * k
        enc.append((f, s))
        cin, s, f = f, s // rate, f * rate
    # bottom level
    total += s * s * cin * f * k * k + s * s * f * f * k * k
    # decoder: tconv (rate^2 kernel) + 2 convs at each level
    for (fe, se) in reversed(enc):
        total += se * se * f * fe * rate * rate // (rate * rate)  # tconv
        total += se * se * (fe + fe) * fe * k * k + se * se * fe * fe * k * k
        f = fe
    total += size * size * f * 1  # 1x1 head
    return 2 * total * 3 * batch


def main():
    import threading

    def _abort():
        sys.stderr.write('bench_unet_big watchdog: no result after 1500s\n')
        os._exit(3)

    wd = threading.Timer(1500, _abort)
    wd.daemon = True
    wd.start()

    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu import data as data_lib
    from dnncancerannotator_tpu.utils import config as config_lib

    tmpdir = os.environ.get('BENCH_TMPDIR', '/tmp/dnnca_bench')
    os.makedirs(tmpdir, exist_ok=True)
    paths = bench._synth_data(tmpdir)

    cfg = config_lib.load_config(os.path.join(REPO, 'configs/unet_big.yaml'))
    precision = os.environ.get('BENCH_BIG_PRECISION',
                               cfg['deploy_options'].get('precision',
                                                         'bfloat16'))
    spc = int(os.environ.get('BENCH_SPC', '10'))
    assert STEPS % (4 * spc) == 0, f'BENCH_SPC={spc} must divide {STEPS//4}'
    cfg['deploy_options'] = dict(
        bench.CONFIG['deploy_options'], precision=precision,
        steps_per_call=spc)

    ds = data_lib.train_ds(paths, **bench.TRAIN_OPTS)
    eng = engine_lib.Engine(cfg)
    eng.train(ds, max_steps=WARMUP, save_freq=1 << 30, auto_resume=False,
              log_every=1 << 30)

    short, long = STEPS // 4, STEPS
    total, t_s, t_l = WARMUP, [], []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.train(ds, max_steps=total + short, save_freq=1 << 30,
                  auto_resume=False, log_every=1 << 30)
        t_s.append(time.perf_counter() - t0)
        total += short
    for _ in range(3):
        t0 = time.perf_counter()
        eng.train(ds, max_steps=total + long, save_freq=1 << 30,
                  auto_resume=False, log_every=1 << 30)
        t_l.append(time.perf_counter() - t0)
        total += long
    print(f'bench raw: shorts={t_s} longs={t_l}', file=sys.stderr)
    dt = max(min(t_l) - min(t_s), 1e-6)
    rate = (long - short) * BATCH / dt
    ms_step = 1000.0 * dt / (long - short)
    mfu = conv_flops_per_step() * (rate / BATCH) / PEAK_BF16
    print(json.dumps({
        'metric': 'train_throughput_unet_big',
        'value': round(rate, 2),
        'unit': 'slices/s/chip',
        'precision': precision,
        'ms_per_step': round(ms_step, 2),
        'conv_mfu': round(mfu, 3),
    }), flush=True)
    os._exit(0)


if __name__ == '__main__':
    main()
