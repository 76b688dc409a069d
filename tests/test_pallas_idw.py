"""Pallas IDW kernel vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmpde_tpu.ops import idw_points, idw_grid, uniform_grid
from mmpde_tpu.ops.pallas_idw import idw_points_pallas


def test_pallas_idw_matches_reference():
    rng = np.random.default_rng(0)
    b, n, q, c = 2, 300, 70, 3
    val = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(b, n, 2)), jnp.float32)
    query = jnp.asarray(rng.uniform(size=(b, q, 2)), jnp.float32)
    out = idw_points_pallas(val, src, query, 17.0, True)
    for i in range(b):
        d = np.linalg.norm(np.asarray(src[i])[None, :, :]
                           - np.asarray(query[i])[:, None, :], axis=-1)
        e = np.exp(-17.0 * d - (-17.0 * d).max(-1, keepdims=True))
        w = e / e.sum(-1, keepdims=True)
        expected = w @ np.asarray(val[i])
        np.testing.assert_allclose(np.asarray(out[i]), expected, rtol=2e-4,
                                   atol=1e-5)


def test_pallas_idw_grid_equivalence():
    rng = np.random.default_rng(1)
    nside = 16
    b, q = 2, 40
    u = jnp.asarray(rng.normal(size=(b, nside, nside)), jnp.float32)
    query = jnp.asarray(rng.uniform(size=(b, q, 2)), jnp.float32)
    ref = idw_grid(u, query)
    grid = uniform_grid(nside)
    out = idw_points_pallas(u.reshape(b, -1, 1),
                            jnp.broadcast_to(grid[None], (b, nside * nside, 2)),
                            query, float(nside), True)[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=1e-5)


def test_pallas_idw_gradients_flow():
    rng = np.random.default_rng(2)
    b, n, q = 1, 100, 20
    val = jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(b, n, 2)), jnp.float32)
    query = jnp.asarray(rng.uniform(size=(b, q, 2)), jnp.float32)

    def loss(v, qq):
        return jnp.sum(idw_points_pallas(v, src, qq, 10.0, True) ** 2)

    gv, gq = jax.grad(loss, argnums=(0, 1))(val, query)
    assert np.all(np.isfinite(np.asarray(gv)))
    assert np.all(np.isfinite(np.asarray(gq)))
    # finite-difference check on a query coordinate
    eps = 1e-3
    qp = query.at[0, 3, 0].add(eps)
    qm = query.at[0, 3, 0].add(-eps)
    fd = (loss(val, qp) - loss(val, qm)) / (2 * eps)
    np.testing.assert_allclose(float(gq[0, 3, 0]), float(fd), rtol=5e-2,
                               atol=1e-4)
