'''Preemption safety: SIGTERM mid-train checkpoints and resumes cleanly.'''

import os
import signal
import threading
import time

import numpy as np
import pytest
import yaml

from tests import util_synth

CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': {
        'n_filters_first': 2, 'n_downsample': 2, 'rate': 2, 'kernel_size': 3,
        'conv_stride': 1, 'bn': False, 'padding': 'same',
    },
    'deploy_options': {
        'optimizer': 'adam',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': False,
    },
    'data_options': {
        'train': {
            'batch_size': 4, 'buffer_size': 16, 'normalize_exams': True,
            'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_flip': None},
            'base_size': 64,
        },
        'eval': {
            'batch_size': 4, 'output_size': [32, 32],
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
        },
    },
}


def test_sigterm_checkpoints_and_resumes(tmp_path):
    from dnncancerannotator_tpu.runs.train import train

    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    config_path = str(tmp_path / 'cfg.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(CONFIG, f)
    save_path = str(tmp_path / 'run')

    # Deliver SIGTERM only while the engine's preemption handler is
    # installed (a blind N-second timer raced engine setup: on a contended
    # run the signal landed before/after the handler and the DEFAULT
    # disposition killed the whole pytest process with exit 143).
    initial_handler = signal.getsignal(signal.SIGTERM)

    def kill_when_handler_live(grace=2.0, timeout=600.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if signal.getsignal(signal.SIGTERM) is not initial_handler:
                time.sleep(grace)  # let a few steps run first
                os.kill(os.getpid(), signal.SIGTERM)
                return

            time.sleep(0.25)

    killer = threading.Thread(target=kill_when_handler_live, daemon=True)
    killer.start()
    results = train(
        config=[config_path], save_path=save_path,
        data_path=[cancer, healthy], max_steps=100000, save_freq=50000,
        validate=False)
    # the only way train() exits (100000 steps take minutes) is the SIGTERM
    # checkpoint path; make sure the killer can't linger into the resume
    killer.join(timeout=30)
    assert not killer.is_alive()

    stopped_at = results.epoch[-1]
    assert 0 < stopped_at < 100000, stopped_at
    ckpts = [d for d in os.listdir(os.path.join(save_path, 'checkpoints'))
             if d.startswith('ckpt-')]
    steps = sorted(int(d.split('-')[1]) for d in ckpts)
    assert steps and steps[-1] == stopped_at, (steps, stopped_at)

    # resume: continues from the preemption checkpoint, not from scratch
    results2 = train(
        config=[config_path], save_path=save_path,
        data_path=[cancer, healthy], max_steps=stopped_at + 2, save_freq=10,
        validate=False)
    assert results2.epoch[0] == stopped_at + 1
    assert results2.epoch[-1] == stopped_at + 2
    assert np.isfinite(results2.history['loss']).all()
