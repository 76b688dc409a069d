"""Device-mesh helpers: data parallelism + node-axis sharding.

The reference is strictly single-process single-GPU (SURVEY.md §2:
"Parallelism strategies in the reference: none").  The TPU build scales two
ways, both expressed as jax.sharding annotations so XLA places the
collectives on ICI:

* **dp** — data parallelism over the trajectory/batch axis: shard the batch,
  replicate parameters; XLA inserts the gradient psum in the backward pass.
* **node** — node-axis sharding for large meshes (the message-passing analog
  of sequence parallelism): shard [B, N, ...] node tensors along N.  Dense
  [N, k] gather across shards lowers to all-gather of the (small) feature
  table or halo exchanges, handled by XLA from the sharding annotations.

No hand-written collectives: annotate in/out shardings, jit, let the
compiler schedule.  (See jax-ml.github.io/scaling-book for the recipe.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("dp", "node"),
              shape: Optional[tuple] = None) -> Mesh:
    """1-D (dp) or 2-D (dp, node) device mesh.

    By default all devices go to dp and the node axis is 1 (pure data
    parallelism — the right default for reference-sized meshes).  Pass
    ``shape=(dp, node)`` to split devices across both axes, e.g.
    ``make_mesh(8, shape=(4, 2))``.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    devs = np.asarray(devices[:n]).reshape(shape)
    return Mesh(devs, axis_names)


def shard_batch(mesh: Mesh, tree):
    """Shard axis 0 (batch/trajectory) across 'dp'; device_put the tree."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_nodes(mesh: Mesh, tree, node_axis: int = 1):
    """Shard the node axis across the 'node' mesh axis (batch on dp)."""
    spec = [None] * (node_axis + 1)
    spec[0] = "dp"
    spec[node_axis] = "node"
    sharding = NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
