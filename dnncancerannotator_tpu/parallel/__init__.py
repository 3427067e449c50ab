from . import mesh, multihost
from .mesh import batch_sharding, create_mesh, replicated, shard_batch
from .multihost import maybe_initialize
