'''Warp-bank accuracy drift: banked vs fresh-per-step warp augmentation.

The warp-bank gate (data/augment.py:build_warp_bank) replaces random_warp's
fresh per-sample TPS warp (reference data.py:628-644) with draws from a
finite precomputed field bank — a distribution approximation. Before the
gate default can flip on a throughput win, this script quantifies the
accuracy cost with the same protocol as BF16_DRIFT.md: identical synthetic
data / init / steps / data order, three arms —

  base       warp_bank off, seed 0   (production semantics)
  bank       warp_bank on,  seed 0   (the candidate)
  base-seed1 warp_bank off, seed 1   (variance control: the scale of
                                      run-to-run noise the bank delta must
                                      be judged against)

— each trained at the bench operating point (unet.yaml, 256-crop, full
augmentation) and evaluated with the reference metric suite (metrics.yaml)
plus a threshold-sweep Dice. Writes WARPBANK_DRIFT.md.

Usage: python tools/warpbank_drift.py --out /tmp/wbdrift [--steps 2000]
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
        f'{CONFIG_DIR}/unet.yaml',
        f'{CONFIG_DIR}/additionals/data_options.yaml',
        f'{CONFIG_DIR}/additionals/deploy_options.yaml',
        f'{CONFIG_DIR}/additionals/tpu_steps_per_call.yaml',
        *extra,
    ]


def run_one(label, out, steps, extra_cfg, seed=0):
    '''Train + evaluate one arm in a subprocess (fresh compile cache and
    device state per arm).'''
    import subprocess
    code = (
        'import sys; sys.path.insert(0, %r)\n'
        'from tools.warpbank_drift import train_eval\n'
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
    from tools.bf16_drift import threshold_sweep

    save = os.path.join(out, label)
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
    with open(os.path.join(save, 'wall.json'), 'w') as f:
        json.dump({'train_wall_s': t1 - t0, 'steps': steps, **sweep}, f)


def read_results(out, label):
    path = os.path.join(out, label, 'tfevents', 'drift', 'results.csv')
    with open(path) as f:
        rows = list(csv.DictReader(f))
    wall = json.load(open(os.path.join(out, label, 'wall.json')))
    return rows[-1], wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/wbdrift')
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--skip-existing', action='store_true')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if not (args.skip_existing
            and os.path.exists(os.path.join(args.out,
                                            'val_healthy.tfrecords'))):
        from tools.bf16_drift import make_data
        make_data(args.out)

    bank_cfg = (f'{CONFIG_DIR}/additionals/warp_bank.yaml',)
    arms = (
        ('base', (), 0),
        ('bank', bank_cfg, 0),
        ('base-seed1', (), 1),
    )
    for label, extra, seed in arms:
        if args.skip_existing and os.path.exists(
                os.path.join(args.out, label, 'wall.json')):
            continue
        run_one(label, args.out, args.steps, tuple(extra), seed=seed)

    results = {label: read_results(args.out, label) for label, _, _ in arms}
    base = results['base'][0]
    keys = ['loss', 'pixel/F1-score', 'pixel/precision', 'pixel/recall',
            'pixel/AUPRC', 'pixel/AUROC', 'region/F1-score']
    labels = [label for label, _, _ in arms]
    lines = [
        '# WARPBANK_DRIFT — banked vs fresh-per-step warp augmentation, '
        'same data / init / steps',
        '',
        f'{args.steps} steps, unet.yaml at the bench operating point '
        '(256-crop, batch 8, full augmentation), synthetic 512-size exams; '
        'generated by tools/warpbank_drift.py. `base-seed1` is the '
        'variance control (bank off, different seed).',
        '',
        '| metric | ' + ' | '.join(labels) + ' |',
        '|---|' + '---|' * len(labels),
    ]
    for k in keys:
        row = [f'{float(results[label][0][k]):.4f}' for label in labels]
        lines.append(f'| {k} | ' + ' | '.join(row) + ' |')
    lines.append(
        '| Dice delta vs base | ' + ' | '.join(
            f'{float(results[label][0]["pixel/F1-score"]) - float(base["pixel/F1-score"]):+.4f}'
            for label in labels) + ' |')
    lines.append(
        '| Dice @ re-tuned threshold | ' + ' | '.join(
            f'{results[label][1]["best_f1"]:.4f} '
            f'(t={results[label][1]["best_threshold"]:.2f})'
            for label in labels) + ' |')
    report = os.path.join(ROOT, 'WARPBANK_DRIFT.md')
    with open(report, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))
    print('\nNOTE: append the decision paragraph to WARPBANK_DRIFT.md after '
          'reading the numbers (the call is data-dependent).')


if __name__ == '__main__':
    main()
