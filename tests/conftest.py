'''Test harness setup.

The suite runs on whatever platform is available (the driver may provide a
single TPU chip or plain CPU). Multi-device sharding coverage lives in
tests/test_multichip.py, which launches subprocesses on a virtual 8-device
CPU mesh with a scrubbed environment (the container's sitecustomize registers
the TPU PJRT plugin at interpreter startup, so in-process env mutation is too
late).
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scrubbed_cpu_env(n_devices=8):
    '''Environment for a subprocess running on an n-device virtual CPU mesh.'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_devices}'
    return env
