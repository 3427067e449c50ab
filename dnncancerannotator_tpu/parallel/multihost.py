'''Multi-host (TPU pod / multi-worker) initialization.

The reference is single-host only (MirroredStrategy in-graph replication,
SURVEY.md §2.3); this framework is multi-host-ready: the mesh in
``parallel/mesh.py`` spans all ``jax.devices()`` — local and remote — once
``jax.distributed`` is initialized, and the GSPMD collectives ride ICI within
a slice / DCN across slices with no further code changes.

Enable by setting ``DNNCA_MULTIHOST=1`` in every worker's environment (on
TPU pods ``jax.distributed.initialize()`` auto-discovers coordinator and
process ids; elsewhere set the standard JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID variables).
'''

import logging
import os

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize():
    '''Initialize jax.distributed when multi-host mode is requested.'''
    global _initialized
    if _initialized or os.environ.get('DNNCA_MULTIHOST') != '1':
        return False
    import jax
    jax.distributed.initialize()
    _initialized = True
    logger.info('jax.distributed initialized: process %d/%d, %d devices '
                '(%d local)', jax.process_index(), jax.process_count(),
                jax.device_count(), jax.local_device_count())
    return True


def is_primary():
    '''True on the process that should write checkpoints / summaries.'''
    import jax
    return jax.process_index() == 0
