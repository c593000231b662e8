"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(/root/reference/new_train.py:771-776). The TPU-native equivalent is a 1-D
`data` mesh: batches sharded over the axis, parameters replicated, gradient
all-reduce inserted by XLA's SPMD partitioner over ICI (SURVEY.md §2.11).
A `gop` axis alias is provided for inference GOP-parallel sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(
    num_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place leading-axis-sharded arrays on the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
