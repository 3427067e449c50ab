'''Device mesh and sharding helpers.

The reference's only parallelism is single-host synchronous data parallelism
via ``tf.distribute.MirroredStrategy`` + NCCL all-reduce (reference:
annotator/engine.py:260-263, utils/nn.py:12-23). The TPU-native replacement is
a ``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis: gradient
reduction becomes an XLA ``psum`` over ICI inserted automatically by GSPMD —
no user-visible collectives, and the reference's manual per-replica batch
splitting (``to_distributed``) disappears into sharding annotations.

The mesh is built ``(data, model)`` so a tensor/model axis is available for
future sharding without changing call sites; ``model=1`` by default.
Multi-host use: call ``jax.distributed.initialize()`` before ``create_mesh``
and the same code spans hosts (DP over DCN+ICI).
'''

import contextlib
import os
import threading
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TLS = threading.local()


@contextlib.contextmanager
def pallas_spmd(mesh: Mesh):
    '''Trace-time announcement that Pallas kernels may run under SPMD.

    The engine wraps its step bodies in this context; kernel gates
    (models/fastconv._pallas_conv_ok, ops/warp._pallas_resample_ok) consult
    it and, when a mesh is active, wrap their ``pallas_call`` in
    ``jax.shard_map`` over the ``data`` axis instead of falling back to the
    slow XLA paths (the TPU-native analog of per-replica cuDNN kernels
    under MirroredStrategy, reference engine.py:260-263).
    '''
    prev = getattr(_TLS, 'spmd_mesh', None)
    _TLS.spmd_mesh = mesh
    try:
        yield
    finally:
        _TLS.spmd_mesh = prev


def current_spmd_mesh() -> Optional[Mesh]:
    '''The announced SPMD mesh, or None.

    Returns None under spatial partitioning (model axis > 1): the stencil
    kernels read whole image planes, so H-sharded operands would need halo
    exchanges the kernels do not implement — XLA's stencil path (with
    GSPMD-inserted halos) handles that case.
    '''
    mesh = getattr(_TLS, 'spmd_mesh', None)
    if mesh is None or mesh.shape.get('model', 1) != 1:
        return None
    return mesh


def spmd_batch_mesh(b):
    '''Mesh to shard_map a Pallas kernel over (batch split on ``data``),
    or None when no SPMD context is active / the batch does not divide.'''
    mesh = current_spmd_mesh()
    if mesh is not None and b % mesh.shape['data'] == 0:
        return mesh
    return None


@contextlib.contextmanager
def pallas_single_device():
    '''Caller guarantee that the enclosed jitted computation runs on ONE
    device (inputs committed to a single device), so Pallas kernels are
    safe even when ``jax.device_count() > 1`` — used by the region metrics,
    which always run their confusion pass on one chip.'''
    prev = getattr(_TLS, 'single_dev', False)
    _TLS.single_dev = True
    try:
        yield
    finally:
        _TLS.single_dev = prev


def pallas_single_device_active() -> bool:
    return bool(getattr(_TLS, 'single_dev', False))


def pallas_interpret() -> bool:
    '''CPU interpret-mode override for Pallas kernels (tests): set
    DNNCA_PALLAS_INTERPRET=1 to run the kernels through the Pallas
    interpreter instead of falling back to the XLA paths.'''
    return os.environ.get('DNNCA_PALLAS_INTERPRET', '') not in ('', '0')


def create_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
                devices=None) -> Mesh:
    '''Build a (data, model) mesh over the available devices.'''
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    '''Shard [B, H, W, C] batches: batch over ``data``; when the mesh has a
    non-trivial ``model`` axis, additionally shard the H (spatial) dimension
    over it — 2D spatial partitioning for resolutions beyond per-chip HBM
    (the segmentation analog of sequence parallelism; XLA inserts the conv
    halo exchanges automatically).'''
    if mesh.shape['model'] > 1:
        return NamedSharding(mesh, P('data', 'model'))
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, pad_to: Optional[int] = None):
    '''Place a host batch on the mesh, sharded along axis 0.

    Pads the batch up to ``pad_to`` (the static batch size a jitted step
    was compiled for) and then to a multiple of the data-axis size, both
    by repeating the last element (the reference gives the remainder to
    the last replica, utils/nn.py:17-19; with GSPMD the batch must divide
    evenly, so we pad and let callers mask with the returned count).
    Returns (device_array, n_valid).
    '''
    n = batch.shape[0]
    d = mesh.shape['data']
    target = max(pad_to or n, n)
    target += (-target) % d
    if target > n:
        batch = np.concatenate(
            [batch, np.repeat(batch[-1:], target - n, 0)], 0)
    return jax.device_put(batch, batch_sharding(mesh)), n
