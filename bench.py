#!/usr/bin/env python
'''Benchmark: training throughput (MRI slices/sec/chip) at the unet.yaml
operating point (batch 8, 256x256 crops from 512x512 exams, 5 MRI sequences,
weighted-BCE, Adam, full augmentation chain incl. thin-plate warp).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "slices/s/chip", "vs_baseline": N}

``vs_baseline`` compares against a TF-CPU reference throughput measured once
on this host with an equivalent Keras U-Net training loop (the reference
framework is TF; its published baseline is absent, see BASELINE.md). The
measured baseline is cached in bench_baseline.json.
'''

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = 8
CROP = 256
BASE = 512
CHANNELS = 6  # 5 sequences + label
WARMUP = 10
STEPS = 400
BASELINE_CACHE = os.path.join(REPO, 'bench_baseline.json')

CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': {
        'n_filters_first': 3, 'n_downsample': 3, 'rate': 2, 'kernel_size': 3,
        'conv_stride': 1, 'bn': False, 'padding': 'same',
    },
    'deploy_options': {
        'optimizer': 'adam',
        'LearningRateScheduler':
            'lambda epoch, current_lr: 0.001 * 0.96 ** (epoch // 1000)',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': True,
    },
}

TRAIN_OPTS = dict(
    batch_size=BATCH, buffer_size=64, normalize_exams=True,
    output_size=(CROP, CROP),
    slice_types=('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'),
    augment_options={'random_crop': None, 'random_flip': None,
                     'random_contrast': None, 'random_warp': None},
)


def _synth_data(tmpdir):
    '''Small synthetic 512^2 exam tfrecords (cached).'''
    cancer = os.path.join(tmpdir, 'bench_cancer.tfrecords')
    healthy = os.path.join(tmpdir, 'bench_healthy.tfrecords')
    if os.path.exists(cancer) and os.path.exists(healthy):
        return [cancer, healthy]
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from tests import util_synth
    tree = os.path.join(tmpdir, 'bench_tree')
    util_synth.make_exam_tree(tree, n_patients=2, n_slices=4, size=BASE)
    from dnncancerannotator_tpu.data import generate_tfrecords
    generate_tfrecords(tree, cancer, category='cancer',
                       output_size=(BASE, BASE))
    generate_tfrecords(tree, healthy, category='healthy',
                       output_size=(BASE, BASE))
    return [cancer, healthy]


def measure_tpu():
    '''Time the real user path: ``Engine.train`` with the device-resident
    input pipeline and a 10-step lax.scan device loop. Each chunk syncs via
    host readback of its losses, so the timing is honest end-to-end.'''
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu import data as data_lib

    tmpdir = os.environ.get('BENCH_TMPDIR', '/tmp/dnnca_bench')
    os.makedirs(tmpdir, exist_ok=True)
    paths = _synth_data(tmpdir)
    config = dict(CONFIG)
    # BENCH_SPC: A/B override for the device-loop chunk length (host
    # dispatch ~4 ms amortizes over steps_per_call steps)
    spc = int(os.environ.get('BENCH_SPC', '25'))
    # The differential legs (STEPS//4 and STEPS) must be whole chunks:
    # a remainder chunk adds a dispatch/compile asymmetry between the
    # short and long timings that biases the subtracted rate.
    assert STEPS % (4 * spc) == 0, (
        f'BENCH_SPC={spc} must divide STEPS//4={STEPS // 4}')
    config['deploy_options'] = dict(
        CONFIG['deploy_options'], steps_per_call=spc)
    ds = data_lib.train_ds(paths, **TRAIN_OPTS)
    eng = engine_lib.Engine(config)

    eng.train(ds, max_steps=WARMUP, save_freq=1 << 30, auto_resume=False,
              log_every=1 << 30)  # compile + warmup

    # differential timing: train() calls differing only in step count — the
    # per-call fixed setup (dataset load, device_put) cancels exactly. Both
    # the short and long measurements repeat and take their MIN: relay
    # stalls only ever slow a call down, and an inflated *short* time would
    # otherwise shrink the denominator and overstate the rate.
    short, long = STEPS // 4, STEPS
    total = WARMUP
    t_shorts, t_longs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.train(ds, max_steps=total + short, save_freq=1 << 30,
                  auto_resume=False, log_every=1 << 30)
        t_shorts.append(time.perf_counter() - t0)
        total += short
    for _ in range(3):
        t0 = time.perf_counter()
        results = eng.train(ds, max_steps=total + long, save_freq=1 << 30,
                            auto_resume=False, log_every=1 << 30)
        t_longs.append(time.perf_counter() - t0)
        total += long
    print(f'bench raw: shorts={t_shorts} longs={t_longs}', file=sys.stderr)
    rate = (long - short) * BATCH / max(min(t_longs) - min(t_shorts), 1e-6)
    return rate, results.history['loss'][-1]


def measure_tf_cpu_baseline():
    '''Equivalent Keras U-Net train loop on CPU (reference framework/topology,
    in-memory random data, no augmentation — a favorable-to-TF baseline).'''
    os.environ['CUDA_VISIBLE_DEVICES'] = '-1'
    import numpy as np
    import tensorflow as tf
    tf.config.set_visible_devices([], 'GPU')

    def unet(n_filters_first=3, n_down=3, rate=2, k=3):
        inp = tf.keras.Input((CROP, CROP, CHANNELS - 1))
        x = inp
        skips = []
        f = n_filters_first
        for _ in range(n_down):
            x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
            x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
            skips.append(x)
            x = tf.keras.layers.MaxPool2D(rate)(x)
            f = int(f * rate)
        for skip in reversed(skips):
            f = skip.shape[-1]
            x = tf.keras.layers.Conv2DTranspose(f, rate, strides=rate, padding='same')(x)
            x = tf.keras.layers.Concatenate()([x, skip])
            x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
            x = tf.keras.layers.Conv2D(f, k, padding='same', activation='relu')(x)
        out = tf.keras.layers.Conv2D(1, 1, activation='sigmoid')(x)
        return tf.keras.Model(inp, out)

    model = unet()
    model.compile(optimizer=tf.keras.optimizers.Adam(0.001),
                  loss=tf.keras.losses.BinaryCrossentropy())
    rng = np.random.default_rng(0)
    x = rng.random((BATCH, CROP, CROP, CHANNELS - 1), np.float32)
    y = (rng.random((BATCH, CROP, CROP, 1)) > 0.9).astype(np.float32)

    model.train_on_batch(x, y)  # build + trace
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        model.train_on_batch(x, y)
    elapsed = time.perf_counter() - t0
    return steps * BATCH / elapsed


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)['tf_cpu_slices_per_sec']
    value = measure_tf_cpu_baseline()
    with open(BASELINE_CACHE, 'w') as f:
        json.dump({'tf_cpu_slices_per_sec': value,
                   'note': 'Keras U-Net (unet.yaml topology) train_on_batch '
                           'on host CPU, batch 8 @ 256^2, no augmentation'},
                  f)
    return value


def main():
    # The axon relay can stop granting chips for an hour or more, during
    # which jax device init blocks indefinitely; fail loudly instead of
    # hanging the driver's bench run (25 min >> the normal ~3 min bench).
    import threading

    def _abort():
        sys.stderr.write('bench watchdog: no result after 1500s '
                         '(TPU relay unreachable or hung)\n')
        sys.stderr.flush()
        os._exit(3)

    watchdog = threading.Timer(1500, _abort)
    watchdog.daemon = True
    watchdog.start()
    throughput, last_loss = measure_tpu()
    baseline = get_baseline()
    print(json.dumps({
        'metric': 'train_throughput_unet_yaml',
        'value': round(throughput, 2),
        'unit': 'slices/s/chip',
        'vs_baseline': round(throughput / baseline, 2),
    }), flush=True)
    # interpreter teardown has been observed to hang in the relayed
    # backend's atexit cleanup after heavy use; the JSON line above is the
    # whole contract, so exit hard once it is out
    os._exit(0)


if __name__ == '__main__':
    main()
