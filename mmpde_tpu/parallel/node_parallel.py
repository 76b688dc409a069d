"""Explicit node-axis parallelism via shard_map.

The scaling axis of this workload is the mesh-node count (SURVEY.md §5:
the message-passing analog of sequence parallelism).  Two ways to shard the
node axis of [B, N, ...] tensors:

1. **Automatic** (parallel/mesh.py + tests/test_parallel.py): annotate
   shardings, let XLA insert collectives.  Right default.
2. **Explicit** (this module): shard_map with a hand-placed all_gather of
   the (small) feature table per layer, keeping every per-edge tensor and
   per-node MLP strictly local to its shard.  This is the building block for
   halo-exchange message passing on meshes too large for one chip's HBM:
   each device holds N/D nodes; only the gathered H-wide table (N x H)
   crosses ICI, never the [N, k, H] edge tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                  # jax >= 0.4.35: public API
    from jax import shard_map
except ImportError:                   # older jax: experimental home
    from jax.experimental.shard_map import shard_map


def sharded_gather_nodes(mesh: Mesh, x: jnp.ndarray, nbr: jnp.ndarray,
                         axis_name: str = "node") -> jnp.ndarray:
    """Neighbor gather with the node axis sharded.

    x [B, N, F] and nbr [B, N, k] (GLOBAL node indices), both sharded along
    N over ``axis_name``.  Each shard all-gathers the feature table over ICI
    and gathers its local neighbors from it; output [B, N, k, F] stays
    node-sharded.
    """

    def body(x_l, nbr_l):
        # x_l [B, N/D, F]; reassemble the global table (tiled all-gather)
        x_full = jax.lax.all_gather(x_l, axis_name, axis=1, tiled=True)
        return jax.vmap(lambda xf, nb: xf[nb])(x_full, nbr_l)

    spec = P(None, axis_name, None)
    out_spec = P(None, axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=out_spec)(x, nbr)


def sharded_segment_mean(mesh: Mesh, edge_vals: jnp.ndarray,
                         axis_name: str = "node") -> jnp.ndarray:
    """Mean over the neighbor axis of a node-sharded [B, N, k, F] tensor.

    Purely local (each node's incoming edges live on its shard) — no
    collective needed; provided for symmetry with scatter-based layouts.
    """
    def body(e_l):
        return jnp.mean(e_l, axis=2)

    return shard_map(body, mesh=mesh,
                     in_specs=P(None, axis_name, None, None),
                     out_specs=P(None, axis_name, None))(edge_vals)
