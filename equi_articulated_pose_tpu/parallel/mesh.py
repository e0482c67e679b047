"""Device-mesh helpers.

TPU-native replacement for the reference's NCCL process-group setup
(``trainer_unsup_arti_align.py:52-58``; SURVEY.md §2.4 / §5.8): a 1-D
``jax.sharding.Mesh`` over all chips with a ``data`` axis for data
parallelism.  Collectives ride ICI inside jit/shard_map — no process groups,
no barriers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def initialize_multihost():
    """Multi-host bring-up (DCN): the analog of init_process_group.  No-op on
    a single host."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
