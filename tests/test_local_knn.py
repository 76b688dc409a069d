"""Locality-restricted kNN (ops.knn_via_candidates) vs the dense search.

The moved mesh is a smooth deformation of the original layout, so a node's
moved kNN stays inside its static candidate neighborhood.  These tests pin
that claim on synthetic deformations with density contrast comparable to
trained DMM meshes (strong sinusoidal compression), for the three uses:
moved-graph edges (both sides move), mode-'1' (uniform src, moved query)
and mode-'2' (moved src, uniform query).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpde_tpu import ops
from mmpde_tpu.ops.interpolate import uniform_grid


def _deform(grid, amp):
    """Smooth area-contracting deformation (density contrast ~(1+2pi*amp)^2).

    amp=0.04 on a 48x48 grid displaces up to ~2 cells and yields ~2.4x
    density contrast, comparable to trained Burgers DMM meshes.
    """
    x, y = grid[:, 0], grid[:, 1]
    dx = amp * jnp.sin(2 * jnp.pi * x) * jnp.cos(jnp.pi * y)
    dy = amp * jnp.sin(2 * jnp.pi * y) * jnp.cos(jnp.pi * x)
    return grid + jnp.stack([dx, dy], -1)


def _sets(idx):
    return [set(row.tolist()) for row in np.asarray(idx)]


def _same_distances(points, query, got, want, atol=1e-6):
    """Selections are equivalent iff their sorted neighbor distances match
    (uniform grids have large equidistant shells, so tie-broken index sets
    legitimately differ)."""
    p, q = np.asarray(points), np.asarray(query)

    def dists(idx):
        d = p[np.asarray(idx)] - q[:, None, :]
        return np.sort(np.sum(d * d, axis=-1), axis=1)

    return np.allclose(dists(got), dists(want), atol=atol)


def test_candidates_full_set_matches_dense():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (64, 2))
    q = jax.random.uniform(jax.random.PRNGKey(1), (32, 2))
    cand = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None], (32, 64))
    got = ops.knn_via_candidates(pts, q, cand, 7)
    want = ops.knn_query(pts, q, 7)
    assert _sets(got) == _sets(want)


def test_moved_graph_edges_exact_under_smooth_deformation():
    grid = uniform_grid(48)
    n = grid.shape[0]
    cand = ops.knn_query(grid, grid, 192)          # static, self at rank 0
    self_idx = jnp.arange(n, dtype=jnp.int32)
    for amp in (0.0, 0.02, 0.04):
        moved = _deform(grid, amp)
        got = ops.knn_via_candidates(moved, moved, cand, 35,
                                     exclude_idx=self_idx)
        want = ops.knn_indices(moved, 35)
        assert _same_distances(moved, moved, got, want), f"amp={amp}"


def test_one_sided_queries_exact_under_smooth_deformation():
    grid = uniform_grid(48)
    cand = ops.knn_query(grid, grid, 384)          # 2x headroom: one side fixed
    for amp in (0.02, 0.04):
        moved = _deform(grid, amp)
        # mode '1': uniform sources, moved queries
        got1 = ops.knn_via_candidates(grid, moved, cand, 30)
        want1 = ops.knn_query(grid, moved, 30)
        assert _same_distances(grid, moved, got1, want1), f"mode1 amp={amp}"
        # mode '2': moved sources, uniform queries
        got2 = ops.knn_via_candidates(moved, grid, cand, 30)
        want2 = ops.knn_query(moved, grid, 30)
        assert _same_distances(moved, grid, got2, want2), f"mode2 amp={amp}"


def test_exclude_idx_drops_self_loops():
    grid = uniform_grid(8)
    n = grid.shape[0]
    cand = ops.knn_query(grid, grid, 16)
    got = ops.knn_via_candidates(grid, grid, cand, 5,
                                 exclude_idx=jnp.arange(n, dtype=jnp.int32))
    assert not np.any(np.asarray(got) == np.arange(n)[:, None])


def test_pipeline_local_knn_matches_dense(monkeypatch):
    """GraphPipeline's gated paths agree with the defaults on a moved mesh."""
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline

    pde = burgers(grid_size=(11, 24, 24))
    pde.movingmesh_grid_size = (11, 24, 24)
    pde.ori_grid_size = (11, 24, 24)
    pipe = GraphPipeline(pde, neighbors=12, time_window=1, t_resolution=11)
    moved = _deform(pipe.grid, 0.03)

    monkeypatch.setenv("MMPDE_LOCAL_KNN", "1")
    monkeypatch.setenv("MMPDE_LOCAL_KNN_CAND", "96")
    cand = pipe._local_cand(pipe._local_knn_cand())
    got = ops.knn_via_candidates(moved, moved, cand, pipe.n,
                                 exclude_idx=jnp.arange(pipe.n_nodes,
                                                        dtype=jnp.int32))
    want = ops.knn_indices(moved, pipe.n)
    assert _same_distances(moved, moved, got, want)
    monkeypatch.setenv("MMPDE_LOCAL_KNN", "0")
    assert pipe._local_knn_cand() == 0


def test_local_cand_first_use_inside_jit(monkeypatch):
    """The candidate table must stay concrete even when its first use is
    inside a jit trace (regression: a cached tracer leaked from the first
    traced caller into every later trace)."""
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline

    pde = burgers(grid_size=(11, 24, 24))
    pde.movingmesh_grid_size = (11, 24, 24)
    pde.ori_grid_size = (11, 24, 24)
    pipe = GraphPipeline(pde, neighbors=12, time_window=1, t_resolution=11)
    monkeypatch.setenv("MMPDE_LOCAL_KNN", "1")
    monkeypatch.setenv("MMPDE_LOCAL_KNN_CAND", "96")

    @jax.jit
    def first(moved):
        cand = pipe._local_cand(pipe._local_knn_cand())
        return ops.knn_via_candidates(moved, moved, cand, pipe.n)

    moved = _deform(pipe.grid, 0.03)
    first(moved)
    assert not isinstance(
        pipe._cand_cache[min(96, pipe.n_nodes)], jax.core.Tracer)

    @jax.jit
    def second(moved):
        cand = pipe._local_cand(pipe._local_knn_cand())
        return ops.knn_via_candidates(moved, moved, cand, pipe.n)

    second(moved)  # raised UnexpectedTracerError before the fix
