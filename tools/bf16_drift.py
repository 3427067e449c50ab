'''bf16-vs-f32 Dice drift for the production-scale model (unet_big).

Trains the same unet_big config twice on identical synthetic 512-size
tfrecords (same seed, same data order): once f32, once with
``deploy_options.precision: bfloat16``. Evaluates both checkpoints with
the reference metric suite (metrics.yaml) and writes ``BF16_DRIFT.md``
with the paired numbers. This is the evidence behind making bf16 the
default for the big model (the reference trains f32 end-to-end,
/root/reference/Dockerfile:13-14; beating it at scale needs bf16 with a
quantified accuracy cost).

Usage: python tools/bf16_drift.py --out /tmp/bf16drift [--steps 2000]
'''

import argparse
import csv
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, '..')
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))

CONFIG_DIR = os.path.join(ROOT, 'configs')


def _stack(extra=()):
    return [
        f'{CONFIG_DIR}/unet_big.yaml',
        f'{CONFIG_DIR}/additionals/data_options.yaml',
        f'{CONFIG_DIR}/additionals/deploy_options.yaml',
        f'{CONFIG_DIR}/additionals/tpu_steps_per_call.yaml',
        *extra,
    ]


def make_data(out):
    from util_synth import make_exam_tree, SLICE_TYPES
    from dnncancerannotator_tpu.data import generate_tfrecords

    exam, margin = 512, 168  # lesions survive the 512 -> 256 center crop
    for split, n_patients, seed in (('train', 4, 0), ('val', 2, 7)):
        tree = os.path.join(out, f'tree_{split}')
        make_exam_tree(tree, n_patients=n_patients, n_slices=6,
                       size=exam, seed=seed,
                       center_box=(margin, exam - margin),
                       r_range=(16, 32))
        for category in ('cancer', 'healthy'):
            rec = os.path.join(out, f'{split}_{category}.tfrecords')
            generate_tfrecords(tree, rec, category=category,
                               slice_types=SLICE_TYPES,
                               output_size=(exam, exam))


def run_one(label, out, steps, extra_cfg, seed=0):
    '''Train + evaluate one precision arm in a subprocess (fresh compile
    cache and device state per arm).'''
    import subprocess
    code = (
        'import sys; sys.path.insert(0, %r)\n'
        'from tools.bf16_drift import train_eval\n'
        'train_eval(%r, %r, %d, %r, seed=%d)\n'
        % (ROOT, label, out, steps, extra_cfg, seed)
    )
    r = subprocess.run([sys.executable, '-c', code], cwd=ROOT)
    assert r.returncode == 0, f'{label} arm failed rc={r.returncode}'


def train_eval(label, out, steps, extra_cfg, seed=0):
    import shutil
    import time
    from dnncancerannotator_tpu.runs import train as train_mod
    from dnncancerannotator_tpu.runs import evaluate as eval_mod

    save = os.path.join(out, label)
    # idempotent re-runs: a prior interrupted arm may have left a tag dir
    shutil.rmtree(os.path.join(save, 'tfevents', 'drift'),
                  ignore_errors=True)
    data = [os.path.join(out, 'train_cancer.tfrecords'),
            os.path.join(out, 'train_healthy.tfrecords')]
    val = [os.path.join(out, 'val_cancer.tfrecords'),
           os.path.join(out, 'val_healthy.tfrecords')]
    t0 = time.time()
    train_mod.train(
        config=_stack(extra_cfg), save_path=save, data_path=data,
        max_steps=steps, save_freq=steps, seed=seed)
    t1 = time.time()
    eval_mod.evaluate(
        save_path=save, data_path=val,
        config=[f'{CONFIG_DIR}/additionals/metrics.yaml'],
        tag='drift', export_csv=True, skip_visualization=True)
    sweep = threshold_sweep(save, val)
    # steady-state device rate: resume-train a short timed continuation
    # (compile served from the jit cache warmed by the run above)
    t2 = time.time()
    train_mod.train(
        config=_stack(extra_cfg), save_path=save, data_path=data,
        max_steps=steps + 200, save_freq=steps + 200, seed=seed)
    rate = 200 * 8 / (time.time() - t2)
    with open(os.path.join(save, 'wall.json'), 'w') as f:
        json.dump({'train_wall_s': t1 - t0, 'steps': steps,
                   'resume200_slices_per_s': rate, **sweep}, f)


def threshold_sweep(save, val_paths, n_thresholds=37):
    '''Dice over a threshold sweep on the val set (the re-tuned-threshold
    deployment option from BF16_DRIFT v1's calibration diagnosis).

    Returns {'best_threshold', 'best_f1', 'f1_at_0.8'} computed from the
    final checkpoint's probability maps with the pixel-metric convention
    (pred positive = prob > t, reference metrics.py semantics).
    '''
    import numpy as np
    import yaml as yaml_lib
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu import data as data_lib

    with open(os.path.join(save, 'options.yaml')) as f:
        cfg = yaml_lib.safe_load(f)['config']
    eng = engine_lib.Engine(cfg)
    ds = data_lib.eval_ds(val_paths, **cfg['data_options']['eval'])
    eng.build(ds.feature_shape, abstract=True)
    ckpts = eng.get_ckpts(os.path.join(save, 'checkpoints'))
    eng.load(ckpts[max(ckpts)])

    label_idx = list(ds.slice_types).index('label')
    probs = np.asarray(eng.predict(ds))[..., 0]          # [N, H, W]
    ys = np.concatenate([b['slices'][..., label_idx]
                         for b in ds.batches()], 0) / 255.0
    y = (ys > 0.5).ravel()
    p = probs.ravel()
    thresholds = np.linspace(0.025, 0.975, n_thresholds)
    f1s = []
    for t in thresholds:
        pred = p > t
        tp = float(np.sum(pred & y))
        f1s.append(2 * tp / max(np.sum(pred) + np.sum(y), 1e-7))
    f1s = np.asarray(f1s)
    best = int(np.argmax(f1s))
    pred = p > 0.8
    tp = float(np.sum(pred & y))
    return {
        'best_threshold': float(thresholds[best]),
        'best_f1': float(f1s[best]),
        'f1_at_0.8': float(2 * tp / max(np.sum(pred) + np.sum(y), 1e-7)),
    }


def read_results(out, label):
    path = os.path.join(out, label, 'tfevents', 'drift', 'results.csv')
    with open(path) as f:
        rows = list(csv.DictReader(f))
    last = rows[-1]
    wall = json.load(open(os.path.join(out, label, 'wall.json')))
    return last, wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/bf16drift')
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--skip-existing', action='store_true')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if not (args.skip_existing
            and os.path.exists(os.path.join(args.out,
                                            'val_healthy.tfrecords'))):
        make_data(args.out)
    arms = (
        ('f32', (), 0),
        ('bf16', (f'{CONFIG_DIR}/additionals/bf16.yaml',), 0),
        # variance control: same precision, different seed — the scale
        # of run-to-run noise the bf16 delta must be judged against
        ('f32-seed1', (), 1),
        # selective-precision policies (VERDICT r3 #2): bf16 convs with an
        # f32 head; additionally an f32 full-resolution level
        ('bf16-f32head',
         (f'{CONFIG_DIR}/additionals/bf16_f32head.yaml',), 0),
        ('bf16-f32l0',
         (f'{CONFIG_DIR}/additionals/bf16_f32level0.yaml',), 0),
    )
    for label, extra, seed in arms:
        if args.skip_existing and os.path.exists(
                os.path.join(args.out, label, 'wall.json')):
            continue
        run_one(label, args.out, args.steps, tuple(extra), seed=seed)

    results = {label: read_results(args.out, label)
               for label, _, _ in arms}
    f32 = results['f32'][0]
    keys = ['loss', 'pixel/F1-score', 'pixel/precision', 'pixel/recall',
            'pixel/AUPRC', 'pixel/AUROC', 'region/F1-score']
    labels = [label for label, _, _ in arms]
    lines = [
        '# BF16_DRIFT — unet_big (31M params): precision policies vs f32, '
        'same data / seed / steps',
        '',
        f'{args.steps} steps, batch 8, 256-crop synthetic 512-size exams, '
        'full augmentation; generated by tools/bf16_drift.py. '
        '`f32-seed1` is the variance control (same precision as f32, '
        'different seed); `bf16-f32head` runs bf16 convs with a float32 '
        '1x1 head; `bf16-f32l0` additionally keeps the full-resolution '
        'level f32 (configs/additionals/bf16_f32*.yaml).',
        '',
        '| metric | ' + ' | '.join(labels) + ' |',
        '|---|' + '---|' * len(labels),
    ]
    for k in keys:
        row = [f'{float(results[label][0][k]):.4f}' for label in labels]
        lines.append(f'| {k} | ' + ' | '.join(row) + ' |')
    lines.append(
        '| Dice delta vs f32 | ' + ' | '.join(
            f'{float(results[label][0]["pixel/F1-score"]) - float(f32["pixel/F1-score"]):+.4f}'
            for label in labels) + ' |')
    lines.append(
        '| Dice @ re-tuned threshold | ' + ' | '.join(
            (f'{results[label][1]["best_f1"]:.4f} '
             f'(t={results[label][1]["best_threshold"]:.2f})'
             if 'best_f1' in results[label][1] else 'n/a')
            for label in labels) + ' |')
    lines.append(
        '| end-to-end rate (slices/s, 200-step resume incl. host) | '
        + ' | '.join(
            (f'{results[label][1]["resume200_slices_per_s"]:.0f}'
             if 'resume200_slices_per_s' in results[label][1] else 'n/a')
            for label in labels) + ' |')
    report = os.path.join(ROOT, 'BF16_DRIFT.md')
    with open(report, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))
    print('\nNOTE: append the decision paragraph to BF16_DRIFT.md after '
          'reading the numbers (the call is data-dependent).')


if __name__ == '__main__':
    main()
