'''Two-process multi-host validation: the full train step over a global
8-device mesh spanning 2 processes (gloo CPU collectives) must reproduce
single-process math. This exercises the same code path a TPU pod uses after
``jax.distributed.initialize`` (parallel/multihost.py).'''

import os
import subprocess
import sys

import numpy as np

from tests.conftest import scrubbed_cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import sys
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize("localhost:12361", 2, int(sys.argv[1]))
import numpy as np, yaml
from dnncancerannotator_tpu import engine as engine_lib
from dnncancerannotator_tpu.parallel import mesh as mesh_lib
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.device_count() == 8 and jax.local_device_count() == 4

CONFIG = {
    "model": "UNetAnnotator",
    "model_options": dict(n_filters_first=2, n_downsample=2, rate=2,
                          kernel_size=3, conv_stride=1, bn=False,
                          padding="same"),
    "deploy_options": {
        "optimizer": "adam",
        "loss": {"class_name": "WeightedCrossentropy",
                 "config": {"weight_mul": 3.0}},
        "enable_multigpu": True,
    },
}

class DS:
    slice_types = ("TRA", "ADC", "label")
    augment_methods = [("random_crop", dict(output_size=(16, 16))),
                       ("random_flip", {})]
    feature_shape = (8, 16, 16, 2)

eng = engine_lib.Engine(CONFIG, seed=7)
eng.build(DS.feature_shape)
step = eng._make_train_step(DS())
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
losses = []
for _ in range(2):
    raw = rng.integers(0, 255, (8, 24, 24, 3), np.uint8)
    # every process holds the identical global batch; jax places the
    # addressable shards
    raw_dev = jax.make_array_from_process_local_data(
        mesh_lib.batch_sharding(eng.mesh), raw[jax.process_index()*4:
                                               (jax.process_index()+1)*4])
    eng.state, loss, _, _ = step(eng.state, raw_dev, key)
    losses.append(float(loss))
print("MULTIHOST_LOSSES", jax.process_index(), losses, flush=True)
'''

SINGLE = r'''
import jax, numpy as np
from dnncancerannotator_tpu import engine as engine_lib
from dnncancerannotator_tpu.parallel import mesh as mesh_lib

CONFIG = {
    "model": "UNetAnnotator",
    "model_options": dict(n_filters_first=2, n_downsample=2, rate=2,
                          kernel_size=3, conv_stride=1, bn=False,
                          padding="same"),
    "deploy_options": {
        "optimizer": "adam",
        "loss": {"class_name": "WeightedCrossentropy",
                 "config": {"weight_mul": 3.0}},
        "enable_multigpu": False,
    },
}

class DS:
    slice_types = ("TRA", "ADC", "label")
    augment_methods = [("random_crop", dict(output_size=(16, 16))),
                       ("random_flip", {})]
    feature_shape = (8, 16, 16, 2)

eng = engine_lib.Engine(CONFIG, seed=7)
eng.build(DS.feature_shape)
step = eng._make_train_step(DS())
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
losses = []
for _ in range(2):
    raw = rng.integers(0, 255, (8, 24, 24, 3), np.uint8)
    raw_dev, _ = mesh_lib.shard_batch(eng.mesh, raw)
    eng.state, loss, _, _ = step(eng.state, raw_dev, key)
    losses.append(float(loss))
print("SINGLE_LOSSES", losses, flush=True)
'''


def test_two_process_train_matches_single():
    env = scrubbed_cpu_env(n_devices=4)
    procs = [subprocess.Popen(
        [sys.executable, '-c', WORKER, str(i)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    def losses_of(out):
        for line in out.splitlines():
            if line.startswith('MULTIHOST_LOSSES'):
                return eval(line.split(None, 2)[2])
        raise AssertionError(out[-1000:])

    l0, l1 = losses_of(outs[0]), losses_of(outs[1])
    np.testing.assert_allclose(l0, l1, rtol=1e-6)  # replicas agree

    single = subprocess.run(
        [sys.executable, '-c', SINGLE], env=scrubbed_cpu_env(n_devices=1),
        cwd=REPO, capture_output=True, text=True, timeout=540)
    assert single.returncode == 0, single.stderr[-2000:]
    for line in single.stdout.splitlines():
        if line.startswith('SINGLE_LOSSES'):
            ls = eval(line.split(None, 1)[1])
            break
    else:
        raise AssertionError(single.stdout[-1000:])
    np.testing.assert_allclose(l0, ls, rtol=2e-4)  # multihost == single-dev
