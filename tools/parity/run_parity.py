'''Orchestrator for the TF-vs-JAX head-to-head parity run.

Usage:
    python tools/parity/run_parity.py --out /tmp/parity \
        [--steps 600] [--freq 200] [--size 256] [--skip-existing]

Produces PARITY_RUN.md at the repo root:
  1. builds one synthetic tfrecords dataset (train + val);
  2. trains the TF reference (CPU, legacy Keras, shims/README.md) and this
     framework (TPU) on the SAME records for the SAME steps with the SAME
     config stack (unet.yaml + data/deploy/nowarp overlays);
  3. evaluates every checkpoint of both with the metrics.yaml suite,
     each through its own evaluate path -> results.csv each;
  4. loads the TF-trained weights into our model and re-evaluates with OUR
     driver (plus a forward probability float-diff) -> export agreement;
  5. writes the report with the Dice/IoU deltas vs the 1% north star.

Each phase is skipped when its primary artifact already exists (resume
after a failure with --skip-existing).
'''

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, '..', '..'))

CPU_ENV = {
    'PALLAS_AXON_POOL_IPS': '',
    'JAX_PLATFORMS': 'cpu',
}
TF_ENV = {
    'TF_USE_LEGACY_KERAS': '1',
    'PYTHONPATH': f'{HERE}/shims:/root/reference',
    'TF_CPP_MIN_LOG_LEVEL': '2',
}


def run(label, argv, extra_env=None, timeout=3600):
    env = dict(os.environ)
    env.update(extra_env or {})
    print(f'=== {label}: {" ".join(argv)}', flush=True)
    subprocess.run(argv, env=env, cwd=REPO, check=True, timeout=timeout)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=600)
    p.add_argument('--freq', type=int, default=200)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--skip-existing', action='store_true')
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

    def exists(*parts):
        return args.skip_existing and os.path.exists(os.path.join(out, *parts))

    if not exists('data', 'val_healthy.tfrecords'):
        run('data', [sys.executable, jaxside, 'data', '--out', data_dir]
            + size, CPU_ENV)

    init_npz = os.path.join(out, 'init_weights.npz')
    if not (args.skip_existing and os.path.exists(init_npz)):
        run('initdump', [sys.executable, jaxside, 'initdump',
                         '--out', init_npz] + size, CPU_ENV)

    if not exists('tf', 'checkpoints'):
        run('tf-train', [sys.executable, refside, 'train',
                         '--data', *train_recs,
                         '--save', os.path.join(out, 'tf'),
                         '--init-npz', init_npz,
                         '--steps', str(args.steps),
                         '--freq', str(args.freq)] + size,
            TF_ENV, timeout=4 * 3600)
    if not exists('tf', 'results.csv'):
        run('tf-eval', [sys.executable, refside, 'eval',
                        '--data', *val_recs,
                        '--save', os.path.join(out, 'tf')] + size,
            TF_ENV, timeout=2 * 3600)
    if not exists('tf', 'weights.npz'):
        run('tf-dump', [sys.executable, refside, 'dump',
                        '--data', *val_recs,
                        '--save', os.path.join(out, 'tf'),
                        '--out', os.path.join(out, 'tf', 'weights.npz')]
            + size, TF_ENV)

    if not exists('jax', 'checkpoints'):
        run('jax-train', [sys.executable, jaxside, 'train',
                          '--data', *train_recs,
                          '--save', os.path.join(out, 'jax'),
                          '--steps', str(args.steps),
                          '--freq', str(args.freq)] + size,
            timeout=2 * 3600)
    if not exists('jax', 'tfevents', 'parity', 'results.csv'):
        run('jax-eval', [sys.executable, jaxside, 'eval',
                         '--data', *val_recs,
                         '--save', os.path.join(out, 'jax')] + size,
            timeout=2 * 3600)

    if not exists('xeval', 'tfevents', 'parity', 'results.csv'):
        run('xeval', [sys.executable, jaxside, 'xeval',
                      '--npz', os.path.join(out, 'tf', 'weights.npz'),
                      '--data', *val_recs,
                      '--save', os.path.join(out, 'xeval')] + size,
            CPU_ENV, timeout=2 * 3600)

    run('report', [sys.executable, jaxside, 'report', '--out', out], CPU_ENV)


if __name__ == '__main__':
    main()
