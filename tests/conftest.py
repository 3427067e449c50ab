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

# Parity/golden tests compare *implementations* (Pallas kernel vs XLA op,
# JAX model vs TF golden data), so the XLA side must be an f32-true oracle.
# On TPU, XLA's DEFAULT f32 matmul/conv precision is bf16-MXU passes
# (~1e-3 rel error) — with CPU-calibrated 1e-5 tolerances that made 30
# tests fail on the real chip while passing on CPU (VERDICT round 4 #1;
# the enclevel f64-oracle adjudication in RESULTS.md round 4 proved the
# default-precision oracle, not the kernels, was the divergent side).
# 'highest' forces full-f32 MXU passes on TPU and is a no-op on CPU.
# Production speed is measured by bench.py at production precision, not
# by the test suite. Tests that intend bf16 math use bf16 *dtypes*,
# which this flag does not touch.
import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')


def scrubbed_cpu_env(n_devices=8):
    '''Environment for a subprocess running on an n-device virtual CPU mesh.'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_devices}'
    return env
