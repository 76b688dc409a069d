"""Unit tests for the numerics kernel layer against numpy/scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast  # per-commit quick lane (see pytest.ini)
from scipy.spatial import cKDTree

from mmpde_tpu.ops import (
    diff_x, diff_y, monitor, monitor_stats,
    idw_grid, idw_points, uniform_grid,
    knn_indices, knn_query, radius_neighbors,
    gumbel_topk_choice, boundary_points,
)


def test_diff_ops_match_numpy():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(3, 8, 8)).astype(np.float32)
    dx = np.zeros_like(u)
    dx[:, :-1, :] = np.diff(u, axis=-2)
    dx[:, -1, :] = dx[:, -2, :]
    dy = np.zeros_like(u)
    dy[:, :, :-1] = np.diff(u, axis=-1)
    dy[:, :, -1] = dy[:, :, -2]
    np.testing.assert_allclose(diff_x(jnp.asarray(u)), dx, rtol=1e-6)
    np.testing.assert_allclose(diff_y(jnp.asarray(u)), dy, rtol=1e-6)


def test_monitor_closed_form():
    # u(x, y) = x on an s-point grid: ux = 1, uy = 0, alpha = 1 => m = 101
    s = 16
    x = np.linspace(0, 1, s)
    u = np.broadcast_to(x[:, None], (1, s, s)).astype(np.float32)
    ux, uy, alpha, m, rhs = monitor_stats(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ux), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uy), 0.0, atol=1e-6)
    # reference convention: means sum the s^2 grid values / (s-1)^2
    scale = s**2 / (s - 1) ** 2
    m_exp = 1.0 + 1.0 / (0.01 * scale)
    np.testing.assert_allclose(np.asarray(alpha), scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m), m_exp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rhs), m_exp * scale, rtol=1e-5)
    # generic alpha broadcast
    np.testing.assert_allclose(
        np.asarray(monitor(jnp.asarray(2.0), jnp.asarray(3.0), jnp.asarray(4.0))),
        1.0 + 5.0 / 0.02, rtol=1e-6)


def test_idw_grid_softmax_oracle():
    rng = np.random.default_rng(1)
    n, b, q = 12, 2, 7
    u = rng.normal(size=(b, n, n)).astype(np.float32)
    query = rng.uniform(size=(b, q, 2)).astype(np.float32)
    out = np.asarray(idw_grid(jnp.asarray(u), jnp.asarray(query)))

    grid = np.asarray(uniform_grid(n))
    for i in range(b):
        for j in range(q):
            d = -np.linalg.norm(grid - query[i, j], axis=-1) * n
            w = np.exp(d - d.max())
            w /= w.sum()
            ref = (u[i].reshape(-1) * w).sum()
            np.testing.assert_allclose(out[i, j], ref, rtol=1e-4)


def test_idw_grid_sharp_limit_hits_node_value():
    # With a very sharp kernel, querying exactly at a grid node returns u there.
    n = 9
    rng = np.random.default_rng(2)
    u = rng.normal(size=(1, n, n)).astype(np.float32)
    query = jnp.asarray([[[3 / (n - 1), 5 / (n - 1)]]], dtype=jnp.float32)
    out = idw_grid(jnp.asarray(u), query, scale=2000.0)
    np.testing.assert_allclose(float(out[0, 0]), u[0, 3, 5], rtol=1e-4)


def test_idw_points_matches_grid_version():
    # Scattered interpolation with grid sources == grid interpolation.
    n = 8
    rng = np.random.default_rng(3)
    u = rng.normal(size=(2, n * n)).astype(np.float32)
    src = np.broadcast_to(np.asarray(uniform_grid(n)), (2, n * n, 2))
    q = rng.uniform(size=(2, 5, 2)).astype(np.float32)
    a = idw_points(jnp.asarray(u), jnp.asarray(src), jnp.asarray(q), scale=float(n))
    b = idw_grid(jnp.asarray(u.reshape(2, n, n)), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_idw_is_differentiable_in_query():
    n = 8
    u = jnp.asarray(np.random.default_rng(4).normal(size=(1, n, n)),
                    dtype=jnp.float32)

    def f(q):
        return idw_grid(u, q.reshape(1, 1, 2))[0, 0]

    g = jax.grad(f)(jnp.asarray([0.3, 0.4]))
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check
    eps = 1e-3
    q0 = np.asarray([0.3, 0.4])
    fd = (f(jnp.asarray([0.3 + eps, 0.4])) - f(jnp.asarray([0.3 - eps, 0.4]))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2)


def test_knn_against_ckdtree():
    rng = np.random.default_rng(5)
    pts = rng.uniform(size=(200, 2)).astype(np.float32)
    k = 8
    idx = np.asarray(knn_indices(jnp.asarray(pts), k))
    tree = cKDTree(pts)
    _, ref = tree.query(pts, k=k + 1)  # includes self
    for i in range(len(pts)):
        assert set(idx[i]) == set(ref[i][ref[i] != i][:k]), f"node {i}"


def test_knn_query_against_ckdtree():
    rng = np.random.default_rng(6)
    pts = rng.uniform(size=(150, 2)).astype(np.float32)
    q = rng.uniform(size=(40, 2)).astype(np.float32)
    k = 5
    idx = np.asarray(knn_query(jnp.asarray(pts), jnp.asarray(q), k))
    _, ref = cKDTree(pts).query(q, k=k)
    for i in range(len(q)):
        assert set(idx[i]) == set(ref[i])


def test_radius_neighbors_mask():
    pts = np.asarray([[0.0, 0.0], [0.1, 0.0], [0.5, 0.5], [0.9, 0.9]],
                     dtype=np.float32)
    idx, mask = radius_neighbors(jnp.asarray(pts), radius=0.2, max_k=3)
    idx, mask = np.asarray(idx), np.asarray(mask)
    # node 0 has exactly one neighbor within 0.2 (node 1)
    assert mask[0].sum() == 1 and idx[0][mask[0]][0] == 1
    # node 3 has none
    assert mask[3].sum() == 0


def test_gumbel_topk_is_weighted_without_replacement():
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray([0.8, 0.1, 0.05, 0.05])
    logits = jnp.log(probs)
    counts = np.zeros(4)
    n_trials = 2000
    keys = jax.random.split(key, n_trials)
    sample = jax.jit(lambda k: gumbel_topk_choice(k, logits, 2))
    draws = np.asarray(jax.vmap(sample)(keys))
    for d in draws:
        assert len(set(d.tolist())) == 2  # without replacement
        counts[d] += 1
    # index 0 (p=0.8) must appear in nearly every pair
    assert counts[0] / n_trials > 0.93
    assert counts[1] > counts[2]


def test_boundary_points_layout():
    l, r, b, t = boundary_points(16)
    for arr in (l, r, b, t):
        assert arr.shape == (4, 2)
    assert np.all(np.asarray(l)[:, 0] == 0.0)
    assert np.all(np.asarray(r)[:, 0] == 1.0)
    assert np.all(np.asarray(b)[:, 1] == 0.0)
    assert np.all(np.asarray(t)[:, 1] == 1.0)


def test_knn_query_uniform_grid_matches_general():
    from mmpde_tpu.ops.knn import knn_query_uniform_grid
    rng = np.random.default_rng(7)
    n_side, k = 24, 30
    grid = uniform_grid(n_side)
    q = jnp.asarray(rng.uniform(0.02, 0.98, size=(100, 2)), jnp.float32)
    fast = np.asarray(knn_query_uniform_grid(n_side, q, k))
    ref = np.asarray(knn_query(grid, q, k))
    for i in range(len(q)):
        assert set(fast[i].tolist()) == set(ref[i].tolist()), i


def test_knn_query_uniform_grid_edge_queries():
    from mmpde_tpu.ops.knn import knn_query_uniform_grid
    n_side, k = 16, 30
    grid = uniform_grid(n_side)
    q = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.0]],
                    jnp.float32)
    fast = np.asarray(knn_query_uniform_grid(n_side, q, k))
    ref = np.asarray(knn_query(grid, q, k))
    for i in range(len(q)):
        assert set(fast[i].tolist()) == set(ref[i].tolist()), i


def test_weighted_choice_wrapper():
    from mmpde_tpu.ops.sampling import weighted_choice
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray([0.9, 0.05, 0.05])
    draws = np.asarray(jax.vmap(
        lambda k: weighted_choice(k, probs, 1))(jax.random.split(key, 500)))
    assert (draws == 0).mean() > 0.8
