'''Elastic scale-up/down via checkpoint-restart.

JAX has no dynamic process membership inside a running program; the
TPU-native elasticity story is: checkpoints are topology-independent
(model/optimizer state is replicated on the mesh, Orbax restores it onto
whatever devices exist at restart) and the device-resident input samples
with a *global-step-indexed* PRNG (engine.py `_make_resident_train_step`),
so a run that checkpoints under one device topology and resumes under
another walks the exact same data order and loss trajectory as an
uninterrupted run. Combined with the SIGTERM preemption checkpoint
(tests/test_preemption.py) this gives scale-up AND scale-down without
losing a step — the reference (single-host MirroredStrategy,
/root/reference/annotator/engine.py:255-268) has no analog.

The test trains 3 steps on an 8-device mesh, then resumes the same
save dir for 3 more on a 4-device mesh (a "half the hosts left"
restart), and checks the combined loss trajectory against a straight
6-step 8-device run.
'''

import os
import subprocess
import sys

import numpy as np

from tests import util_synth
from tests.conftest import scrubbed_cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN = r'''
import sys, yaml
import numpy as np
from dnncancerannotator_tpu import engine as engine_lib
from dnncancerannotator_tpu import data as data_lib

save_path, max_steps, cancer, healthy = sys.argv[1:5]
CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': dict(n_filters_first=2, n_downsample=2, rate=2,
                          kernel_size=3, conv_stride=1, bn=False,
                          padding='same'),
    'deploy_options': {
        'optimizer': 'adam',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': True,
    },
    'data_options': {'train': {
        'batch_size': 8, 'buffer_size': 16, 'output_size': [32, 32],
        'base_size': 64,
        'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
        'augment_options': {'random_crop': None, 'random_flip': None},
    }},
}
cfg = yaml.safe_load(yaml.safe_dump(CONFIG))
ds = data_lib.train_ds([cancer, healthy], **cfg['data_options']['train'])
eng = engine_lib.Engine(cfg, seed=5)
results = eng.train(ds, save_path=save_path, max_steps=int(max_steps),
                    save_freq=3, log_every=1 << 30)
print('ELASTIC_LOSSES', results.history['loss'], flush=True)
'''


def _run(save, steps, recs, n_devices):
    p = subprocess.run(
        [sys.executable, '-c', RUN, save, str(steps), recs[0], recs[1]],
        env=scrubbed_cpu_env(n_devices=n_devices), cwd=REPO,
        capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    for line in p.stdout.splitlines():
        if line.startswith('ELASTIC_LOSSES'):
            return eval(line.split(None, 1)[1])
    raise AssertionError(p.stdout[-1000:])


def test_scale_down_resume_matches_uninterrupted(tmp_path):
    recs = util_synth.make_tfrecords(str(tmp_path), size=64)
    recs = tuple(str(r) for r in recs)

    straight = _run(str(tmp_path / 'straight'), 6, recs, n_devices=8)
    assert len(straight) == 6

    first = _run(str(tmp_path / 'elastic'), 3, recs, n_devices=8)
    # topology change: resume the same save dir on half the devices
    second = _run(str(tmp_path / 'elastic'), 6, recs, n_devices=4)
    assert len(first) == 3 and len(second) == 3, (first, second)

    np.testing.assert_allclose(first + second, straight, rtol=2e-4)
