"""Device mesh construction.

The reference distributes map tiles over MPI ranks with a rank-0
coordinator (``nemo/startUp.py:389-404``).  Here tiles are a batch axis
sharded over a 1-d ``jax.sharding.Mesh``; survey-level reductions
(RMS-table histograms, candidate counts - the reference's MPI gathers at
``pipelines.py:291-331``) become ``psum``/``all_gather`` collectives over
ICI inside the compiled step.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


TILE_AXIS = "tiles"


def get_mesh(n_devices=None, devices=None):
    """1-d mesh over the tile axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def tile_sharding(mesh):
    """Shard the leading (tile) axis, replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(TILE_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())
