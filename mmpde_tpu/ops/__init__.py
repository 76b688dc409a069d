from mmpde_tpu.ops.monitor import diff_x, diff_y, monitor, monitor_stats
from mmpde_tpu.ops.interpolate import (
    idw_grid, idw_points, uniform_grid, idw_points_single,
)
from mmpde_tpu.ops.knn import (knn_indices, knn_query,
                               knn_via_candidates, radius_neighbors)
from mmpde_tpu.ops.bucket_knn import bucket_knn
from mmpde_tpu.ops.sampling import gumbel_topk_choice, boundary_points

__all__ = [
    "diff_x", "diff_y", "monitor", "monitor_stats",
    "idw_grid", "idw_points", "idw_points_single", "uniform_grid",
    "knn_indices", "knn_query", "knn_via_candidates", "radius_neighbors",
    "bucket_knn",
    "gumbel_topk_choice", "boundary_points",
]
