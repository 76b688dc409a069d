"""DMM loss/sampler tests: analytic Monge-Ampere oracle, sampler shapes."""

import pytest

pytestmark = pytest.mark.fast  # per-commit quick lane (see pytest.ini)
import jax
import jax.numpy as jnp
import numpy as np

from mmpde_tpu.dmm import sampler as S
from mmpde_tpu.dmm.loss import MALossConfig, ma_loss, boundary_loss
from mmpde_tpu.ops import monitor_stats


def _linear_interior(s=16, nu=2, nx=5, c=0.0):
    """Interior batch for u(x, y) = x with hand-placed collocation points."""
    xs = np.linspace(0, 1, s)
    u = np.broadcast_to(xs[:, None], (nu, s, s)).astype(np.float32)
    ux, uy, alpha, m, rhs = monitor_stats(jnp.asarray(u))
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (nu, nx, 2), minval=0.2, maxval=0.8)
    return S.InteriorBatch(jnp.asarray(u), ux, uy, alpha, m, rhs, pts)


def _dummy_boundary(nu=2, nb=4, s=16):
    pts = jnp.stack(list(jnp.zeros((4, nb, 2))))
    from mmpde_tpu.ops import boundary_points
    l, r, b, t = boundary_points(4 * nb)
    pts = jnp.stack([l, r, b, t])
    u = jnp.zeros((4, nu, s, s))
    return S.BoundaryBatch(pts, u)


def test_ma_loss_analytic_quadratic():
    """phi = c*(x^2+y^2)/2 with u(x,y) = x: every term has a closed form.

    grad phi = c*x, hess = c*I, moved = (1+c)*x; u has ux = 1, uy = 0
    everywhere so the pulled-back gradient is ~1 and
    LHS = (1 + (1+c)/(0.01*alpha)) * (1+c)^2.
    """
    s = 16
    c = 0.3
    interior = _linear_interior(s=s)
    boundary = _dummy_boundary(s=s)
    cfg = MALossConfig(loss_weight1=0.0)  # boundary off for the oracle

    def phi_fn(feat, x):
        return c * 0.5 * (x[0] ** 2 + x[1] ** 2)

    terms = ma_loss(None, None, interior, boundary, cfg, phi_fn=phi_fn)
    scale = s ** 2 / (s - 1) ** 2  # reference mean convention
    alpha = scale
    m_xi = 1.0 + (1.0 + c) / (0.01 * alpha)
    lhs = m_xi * (1.0 + c) ** 2
    rhs = (1.0 + 1.0 / (0.01 * alpha)) * scale
    expected_ratio = lhs / rhs
    np.testing.assert_allclose(np.asarray(terms.lhs_over_rhs),
                               expected_ratio, rtol=2e-2)
    np.testing.assert_allclose(float(terms.loss_in),
                               (expected_ratio - 1.0) ** 2, rtol=5e-2)
    assert float(terms.loss_convex) == 0.0


def test_ma_loss_convexity_penalty_fires():
    # phi with hessian diag = -2 => 1 + phi_xx = -1 => penalty = 2 per point
    interior = _linear_interior()
    boundary = _dummy_boundary()
    cfg = MALossConfig(loss_weight1=0.0)

    def phi_fn(feat, x):
        return -1.0 * (x[0] ** 2 + x[1] ** 2)

    terms = ma_loss(None, None, interior, boundary, cfg, phi_fn=phi_fn)
    np.testing.assert_allclose(float(terms.loss_convex), 2.0, rtol=1e-5)


def test_boundary_loss_zero_for_tangential_phi():
    """phi = x*(y-y^2) has dphi/dy = 0 on y=0 and y=1... actually use
    phi independent of the normal coordinate near each edge: phi = const
    gives exactly zero everywhere."""
    boundary = _dummy_boundary()
    cfg = MALossConfig()
    lb = boundary_loss(None, None, boundary, cfg,
                       phi_fn=lambda f, x: jnp.asarray(3.14))
    np.testing.assert_allclose(float(lb), 0.0, atol=1e-10)

    # phi = x^2: dphi/dx = 2x -> left edge 0, right edge 4; dphi/dy = 0
    lb2 = boundary_loss(None, None, boundary, cfg,
                        phi_fn=lambda f, x: x[0] ** 2)
    np.testing.assert_allclose(float(lb2), (0.0 + 4.0 + 0.0 + 0.0) / 4,
                               rtol=1e-5)


def test_sample_interior_concentrates_on_front():
    key = jax.random.PRNGKey(0)
    s = 32
    xs = jnp.linspace(0, 1, s)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    all_u = jnp.tanh(20 * (X - 0.5))[None].repeat(4, axis=0)
    batch = S.sample_interior(key, all_u, nx=64, nu=3)
    assert batch.x.shape == (3, 64, 2)
    assert batch.u.shape == (3, s, s)
    # most points should concentrate near the x=0.5 front
    frac = float(jnp.mean(jnp.abs(batch.x[..., 0] - 0.5) < 0.15))
    assert frac > 0.5, frac


def test_sample_boundary_shapes():
    key = jax.random.PRNGKey(1)
    all_u = jnp.ones((10, 8, 8))
    b = S.sample_boundary(key, all_u, nx=16, nu=3)
    assert b.points.shape == (4, 4, 2)
    assert b.u.shape == (4, 3, 8, 8)


def test_sample_interior_tri_shapes():
    key = jax.random.PRNGKey(2)
    n = 49  # 7x7
    mesh = jax.random.uniform(jax.random.PRNGKey(3), (n, 2))
    all_u = jnp.concatenate(
        [jnp.broadcast_to(mesh[None], (5, n, 2)),
         jax.random.normal(key, (5, n, 1)),
         jnp.zeros((5, n, 2))], axis=-1)
    batch = S.sample_interior_tri(key, all_u, mesh, nx=8, nu=2)
    assert batch.x.shape == (2, 8, 2)
    assert batch.u.shape == (2, n)
    assert batch.ux.shape == (2, 7, 7)
    assert np.all(np.isfinite(np.asarray(batch.m)))
