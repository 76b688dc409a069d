"""Grid-bucketed kNN: scalable nearest-neighbor search for moving meshes.

The locality-restricted search (``ops.knn.knn_via_candidates``) removes the
O(Q*N) distance pass from the hot loop, but its static candidate table is
built with ONE dense O(N^2) pass and assumes the point set is a smooth
deformation of a static layout.  This module removes both limits: points are
hashed into a G x G uniform cell grid (classic spatial hashing), each
query's candidates are the points in its (2w+1)^2 surrounding cells, and the
k nearest are selected by top-k over that static-capacity candidate set.

Everything is static-shape and jit/vmap/shard_map-friendly:
  * bucket fill = one argsort over cell ids + searchsorted run-starts
    (O(N log N), no scatter contention, no dynamic shapes);
  * candidate gather = [Q, (2w+1)^2 * M] index gather with -1 padding
    masked to +inf distance;
  * selection = exact lax.top_k over the candidate axis.

Correctness envelope (validated in tests/test_bucket_knn.py):
  * the (2w+1)^2 cell window must cover the true kNN radius — holds when
    cell_size >= that radius, i.e. G chosen so avg points/cell ~ k/2;
  * cells overflowing ``capacity`` truncate (arbitrary members kept) — use
    capacity ~4x the mean occupancy so real meshes (bounded density
    contrast; the DMM's equidistribution objective bounds it by
    construction) never hit it.

The reference has no analog — its large-N story is sklearn on CPU
(data_creator_2d.py:66-78).  This is the designed-for-TPU extension that
makes moved-mesh graph construction viable at 100k+ nodes (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_buckets(points: jnp.ndarray, n_side: int, capacity: int,
                  lo=0.0, hi=1.0):
    """Hash points into an n_side x n_side cell table.

    points [N, 2] in [lo, hi]^2 (clamped) -> (table [n_side^2, capacity]
    int32 point indices padded with -1, cell_of [N] int32 cell ids).
    """
    n = points.shape[0]
    scale = n_side / (hi - lo)
    ij = jnp.clip(((points - lo) * scale).astype(jnp.int32), 0, n_side - 1)
    cid = ij[:, 0] * n_side + ij[:, 1]                       # [N]
    order = jnp.argsort(cid)                                 # stable
    sorted_cid = cid[order]
    # rank of each point within its cell run
    starts = jnp.searchsorted(sorted_cid, jnp.arange(n_side * n_side),
                              side="left")                   # [G^2]
    rank = jnp.arange(n) - starts[sorted_cid]                # [N]
    keep = rank < capacity
    table = jnp.full((n_side * n_side, capacity), -1, dtype=jnp.int32)
    # overflow entries scatter to an out-of-bounds row and are dropped
    row = jnp.where(keep, sorted_cid, n_side * n_side)
    table = table.at[row, jnp.clip(rank, 0, capacity - 1)].set(
        order.astype(jnp.int32), mode="drop")
    return table, cid


def bucket_knn(points: jnp.ndarray, query: jnp.ndarray, k: int,
               n_side: int | None = None, capacity: int | None = None,
               window: int = 2, lo: float = 0.0, hi: float = 1.0,
               exclude_idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """k nearest ``points`` for each ``query`` via grid bucketing.

    points [N, 2], query [Q, 2] -> int32 [Q, k] indices into points.
    O(N log N + Q * (2*window+1)^2 * capacity) — no N x N anything.

    n_side defaults to sqrt(2N/k) (avg ~k/2 points per cell ⇒ cell size
    ~1.25x the expected kNN radius); capacity defaults to 4x the mean
    occupancy.  The default window=2 (5x5 cells) covers ~2.5x the expected
    kNN radius — exact in practice incl. Poisson-sparse regions (tests
    assert full recall on uniform-random and DMM-deformed sets); window=1
    is the cheap variant (~0.99+ recall).  ``exclude_idx`` [Q] masks one
    point index per query (kNN-graph loop=False semantics).
    """
    n = points.shape[0]
    if n_side is None:
        n_side = max(2, int((2.0 * n / max(k, 1)) ** 0.5))
    if capacity is None:
        capacity = max(k, 4 * (n // (n_side * n_side) + 1))
    table, _ = build_buckets(points, n_side, capacity, lo, hi)

    scale = n_side / (hi - lo)
    qij = jnp.clip(((query - lo) * scale).astype(jnp.int32), 0, n_side - 1)
    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)
    ci = qij[:, 0:1] + offs[None, :]                         # [Q, 2w+1]
    cj = qij[:, 1:2] + offs[None, :]
    in_i = (ci >= 0) & (ci < n_side)
    in_j = (cj >= 0) & (cj < n_side)
    w = offs.shape[0]
    cells = (jnp.clip(ci, 0, n_side - 1)[:, :, None] * n_side
             + jnp.clip(cj, 0, n_side - 1)[:, None, :])      # [Q, w, w]
    valid = in_i[:, :, None] & in_j[:, None, :]
    cand = table[cells.reshape(-1, w * w)]                   # [Q, w*w, M]
    cand = jnp.where(valid.reshape(-1, w * w)[:, :, None], cand, -1)
    cand = cand.reshape(query.shape[0], -1)                  # [Q, w*w*M]

    cpts = points[jnp.maximum(cand, 0)]                      # [Q, C, 2]
    diff = cpts - query[:, None, :]
    d = jnp.sum(diff * diff, axis=-1)
    d = jnp.where(cand < 0, jnp.inf, d)
    if exclude_idx is not None:
        d = jnp.where(cand == exclude_idx[:, None], jnp.inf, d)
    _, sel = jax.lax.top_k(-d, k)
    idx = jnp.take_along_axis(cand, sel, axis=1)
    # If a query's cell window held fewer than k valid candidates (empty
    # cells / capacity truncation), top_k selects +inf padding whose index
    # is -1, which would silently wrap to points[-1] in downstream gathers.
    # Fall back to that query's nearest valid neighbor (top_k sorts by
    # ascending distance, so column 0 is valid whenever any candidate is).
    idx = jnp.where(idx < 0, jnp.maximum(idx[:, :1], 0), idx)
    return idx.astype(jnp.int32)
