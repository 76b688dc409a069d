"""Grid-bucketed kNN (ops/bucket_knn.py) vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpde_tpu.ops.bucket_knn import bucket_knn, build_buckets
from mmpde_tpu.ops.knn import knn_query


def _oracle_sets(points, query, k):
    d = np.sum((np.asarray(query)[:, None, :]
                - np.asarray(points)[None, :, :]) ** 2, axis=-1)
    return np.argsort(d, axis=1)[:, :k]


def _recall(got, want_sets):
    got = np.asarray(got)
    hits = sum(len(set(g) & set(w)) for g, w in zip(got, want_sets))
    return hits / got.size


def test_bucket_knn_exact_on_uniform_points():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, size=(2000, 2)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 1, size=(500, 2)).astype(np.float32))
    got = bucket_knn(pts, q, 10)
    want = _oracle_sets(pts, q, 10)
    assert _recall(got, want) == 1.0


def test_bucket_knn_matches_dense_as_sets_selfquery():
    """Moved-mesh use: query == points (graph construction)."""
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 1, size=(1500, 2)).astype(np.float32))
    got = bucket_knn(pts, pts, 8)
    dense = knn_query(pts, pts, 8)
    # same neighbor SETS (ordering of exact ties may differ)
    for g, d in zip(np.asarray(got), np.asarray(dense)):
        assert set(g) == set(d)


def test_bucket_knn_on_deformed_mesh():
    """DMM-like smooth deformation of a uniform grid: density contrast but
    bounded — the production moved-mesh case."""
    n_side = 48
    xs = np.linspace(0, 1, n_side)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel()], -1)
    # smooth area-concentrating map (mimics monitor-driven movement)
    moved = grid + 0.06 * np.stack(
        [np.sin(2 * np.pi * grid[:, 0]) * np.cos(np.pi * grid[:, 1]),
         np.sin(2 * np.pi * grid[:, 1])], -1)
    moved = np.clip(moved, 0, 1).astype(np.float32)
    pts = jnp.asarray(moved)
    got = bucket_knn(pts, pts, 35)
    want = _oracle_sets(pts, pts, 35)
    assert _recall(got, want) == 1.0


def test_bucket_knn_exclude_idx():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(0, 1, size=(400, 2)).astype(np.float32))
    self_idx = jnp.arange(400, dtype=jnp.int32)
    got = bucket_knn(pts, pts, 5, exclude_idx=self_idx)
    assert not np.any(np.asarray(got) == np.arange(400)[:, None])


def test_build_buckets_overflow_drops_not_corrupts():
    """All points in one cell, tiny capacity: the table must keep exactly
    ``capacity`` members of that cell and no -1 poisoning elsewhere."""
    pts = jnp.asarray(np.full((50, 2), 0.5, dtype=np.float32))
    table, cid = build_buckets(pts, 4, 8)
    t = np.asarray(table)
    c = int(np.asarray(cid)[0])
    assert np.all(np.asarray(cid) == c)
    row = t[c]
    assert np.sum(row >= 0) == 8  # capacity kept, overflow dropped
    mask = np.ones(16, dtype=bool)
    mask[c] = False
    assert np.all(t[mask] == -1)  # no other row touched


def test_bucket_knn_jit_and_grad_safety():
    """jits cleanly with static shapes; indices usable inside a jitted
    pipeline."""
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(0, 1, size=(800, 2)).astype(np.float32))

    @jax.jit
    def f(p):
        nbr = bucket_knn(p, p, 6)
        return jnp.mean(p[nbr])

    v = f(pts)
    assert np.isfinite(float(v))


def test_pipeline_bucket_knn_matches_dense(monkeypatch):
    """MMPDE_BUCKET_KNN=1 must reproduce the default moved-graph edges
    (same neighbor sets) through the GraphPipeline surface."""
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline

    nt, nx = 6, 12
    pde = burgers(grid_size=(nt, nx, nx), tmax=10.0)
    pde.movingmesh_grid_size = (nt, nx, nx)
    pde.ori_grid_size = (nt, nx, nx)
    pipe = GraphPipeline(pde, neighbors=5, time_window=1, t_resolution=nt)
    rng = np.random.default_rng(5)
    mesh = jnp.asarray(
        np.clip(np.asarray(pipe.grid)[None]
                + 0.02 * rng.normal(size=(2, nx * nx, 2)), 0, 1)
        .astype(np.float32))

    monkeypatch.delenv("MMPDE_BUCKET_KNN", raising=False)
    monkeypatch.delenv("MMPDE_LOCAL_KNN", raising=False)
    self_idx = jnp.arange(pipe.n_nodes, dtype=jnp.int32)
    import mmpde_tpu.ops as ops
    dense = jax.vmap(lambda p: ops.knn_indices(p, pipe.n))(mesh)

    monkeypatch.setenv("MMPDE_BUCKET_KNN", "1")
    bucket = jax.vmap(lambda p: ops.bucket_knn(
        p, p, pipe.n, exclude_idx=self_idx))(mesh)
    assert pipe._use_bucket_knn()
    for b in range(2):
        for g, d in zip(np.asarray(bucket[b]), np.asarray(dense[b])):
            assert set(g) == set(d)


@pytest.mark.parametrize("window", [1, 2])
def test_bucket_knn_larger_window_only_improves(window):
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(0, 1, size=(1200, 2)).astype(np.float32))
    got = bucket_knn(pts, pts, 20, window=window)
    want = _oracle_sets(pts, pts, 20)
    r = _recall(got, want)
    assert r >= (0.995 if window == 1 else 1.0)
