from mmpde_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, shard_nodes,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "shard_nodes"]
