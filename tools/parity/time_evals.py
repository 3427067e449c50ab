'''Eval-path wall-clock head-to-head: the reference's evaluate loop vs ours.

Complements PARITY_RUN.md's accuracy head-to-head (which proved metric
parity to 1e-7 but never compared eval SPEED). Reuses the run_parity.py
phase machinery: one synthetic dataset, both sides trained the same small
number of steps (eval speed does not depend on weight quality), then each
side's full evaluate driver — metrics.yaml operating point (pixel suite +
region-based confusion at resize 0.5 + both PR-curve resolutions) over
every checkpoint — is timed end-to-end (process wall-clock, including
startup/compile: that is what a user waits for).

Usage:
    python tools/parity/time_evals.py --out /tmp/evaltime [--steps 100]

Writes <out>/eval_timing.json and prints a markdown table for
PARITY_RUN.md. Run each side twice: the second run of ours hits the
persistent XLA compile cache, separating compile cost from steady-state.
'''
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, '..', '..'))
sys.path.insert(0, HERE)

from run_parity import CPU_ENV, TF_ENV, run  # noqa: E402


def timed(label, argv, extra_env=None, timeout=7200):
    t0 = time.perf_counter()
    run(label, argv, extra_env, timeout=timeout)
    dt = time.perf_counter() - t0
    print(f'=== {label}: {dt:.1f}s', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--size', type=int, default=256)
    args = p.parse_args()

    out = os.path.abspath(args.out)
    data_dir = os.path.join(out, 'data')
    train_recs = [os.path.join(data_dir, 'train_cancer.tfrecords'),
                  os.path.join(data_dir, 'train_healthy.tfrecords')]
    val_recs = [os.path.join(data_dir, 'val_cancer.tfrecords'),
                os.path.join(data_dir, 'val_healthy.tfrecords')]
    jaxside = os.path.join(HERE, 'jaxside.py')
    refside = os.path.join(HERE, 'refside.py')
    size = ['--size', str(args.size)]
    py = sys.executable

    if not os.path.exists(os.path.join(data_dir, 'val_healthy.tfrecords')):
        run('data', [py, jaxside, 'data', '--out', data_dir] + size, CPU_ENV)
    init_npz = os.path.join(out, 'init_weights.npz')
    if not os.path.exists(init_npz):
        run('initdump', [py, jaxside, 'initdump', '--out', init_npz] + size,
            CPU_ENV)
    if not os.path.exists(os.path.join(out, 'tf', 'checkpoints')):
        run('tf-train', [py, refside, 'train', '--data', *train_recs,
                         '--save', os.path.join(out, 'tf'),
                         '--init-npz', init_npz, '--steps', str(args.steps),
                         '--freq', str(args.steps)] + size,
            TF_ENV, timeout=2 * 3600)
    if not os.path.exists(os.path.join(out, 'jax', 'checkpoints')):
        run('jax-train', [py, jaxside, 'train', '--data', *train_recs,
                          '--save', os.path.join(out, 'jax'),
                          '--steps', str(args.steps),
                          '--freq', str(args.steps)] + size,
            timeout=3600)

    timing = {'steps': args.steps, 'size': args.size}
    timing['tf_eval_s'] = timed(
        'tf-eval (reference, CPU)',
        [py, refside, 'eval', '--data', *val_recs,
         '--save', os.path.join(out, 'tf')] + size, TF_ENV)

    for attempt in ('cold', 'warm'):
        # avoid_overwrite renames the prior CSV, so re-running is safe
        timing[f'jax_eval_{attempt}_s'] = timed(
            f'jax-eval ({attempt}, TPU)',
            [py, jaxside, 'eval', '--data', *val_recs,
             '--save', os.path.join(out, 'jax')] + size)

    with open(os.path.join(out, 'eval_timing.json'), 'w') as f:
        json.dump(timing, f, indent=1)

    print('\n| evaluate driver | wall-clock (s) |')
    print('|---|---|')
    print(f"| TF reference (CPU, its own engine.py loop) "
          f"| {timing['tf_eval_s']:.1f} |")
    print(f"| this framework (TPU, cold incl. compile) "
          f"| {timing['jax_eval_cold_s']:.1f} |")
    print(f"| this framework (TPU, warm compile cache) "
          f"| {timing['jax_eval_warm_s']:.1f} |")


if __name__ == '__main__':
    main()
