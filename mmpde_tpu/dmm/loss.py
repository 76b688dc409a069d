"""Monge-Ampere physics loss for DMM training.

Replicates the reference loss (mesh/dmm_utils.py:441-552):

  interior   LHS = m(xi) * ((1 + phi_xx)(1 + phi_yy) - phi_xy * phi_yx)
             loss_in = MSE(LHS / RHS, 1)
             where m(xi) is the monitor evaluated at the MOVED point using
             grad u pulled back through softmax-IDW interpolation and the
             Jacobian chain rule (u_xi_x = ux*(1+phi_xx) + uy*phi_yx, ...)
  boundary   MSE of the normal derivative of phi on each unit-square edge
             (left/right: dphi/dx = 0; bottom/top: dphi/dy = 0)
  convexity  mean(min(0, 1+phi_xx)^2 + min(0, 1+phi_yy)^2)
  total      w1 * bound + w0 * in + w2 * convex   (defaults 1000/1/1)

All phi derivatives come from jax.grad / jacfwd-over-grad of the scalar
trunk head (see dmm/geometry.py) — one fused XLA program instead of the
reference's six sequential autograd.grad calls.

``bound_constraint='hard'`` replicates the reference's non-default hard
constraint phi~ = x^2 y^2 (x-1)^2 (y-1)^2 * phi + (x^2 + y^2)/2
(mesh/dmm_utils.py:518,655) including its quirks; the default is 'soft'.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mmpde_tpu import ops
from mmpde_tpu.dmm.geometry import branch_features
from mmpde_tpu.dmm.sampler import BoundaryBatch, InteriorBatch
from mmpde_tpu.models.dmm import DMM


class MALossConfig(NamedTuple):
    loss_weight0: float = 1.0      # interior
    loss_weight1: float = 1000.0   # boundary
    loss_weight2: float = 1.0      # convexity
    loss_convex: bool = True
    bound_constraint: str = "soft"
    init_mesh: bool = False        # pretrain phi ~ 0 (identity mesh)


class MALossTerms(NamedTuple):
    total: jnp.ndarray
    loss_in: jnp.ndarray
    loss_bound: jnp.ndarray
    loss_convex: jnp.ndarray
    lhs_over_rhs: jnp.ndarray      # [nu, nx] residual ratios for test_equ


def _hard_wrap(phi_fn):
    def wrapped(ft, x):
        b = (x[0] ** 2) * (x[1] ** 2) * ((x[0] - 1.0) ** 2) * ((x[1] - 1.0) ** 2)
        return b * phi_fn(ft, x) + 0.5 * (x[0] ** 2 + x[1] ** 2)
    return wrapped


def _phi_fns(model: DMM, variables, cfg: MALossConfig, phi_fn=None):
    """phi_fn(feat, x[2]) -> scalar; overridable for analytic testing."""
    if phi_fn is None:
        phi_fn = lambda ft, x: model.apply(  # noqa: E731
            variables, ft, x, method=DMM.phi_given_branch)
    f = phi_fn
    if cfg.bound_constraint != "soft":
        f = _hard_wrap(f)
    grad = jax.grad(f, argnums=1)
    hess = jax.jacfwd(grad, argnums=1)
    return f, grad, hess


def boundary_loss(model: DMM, variables, batch: BoundaryBatch,
                  cfg: MALossConfig, grid=None, nbr=None,
                  phi_fn=None) -> jnp.ndarray:
    """Mean over the 4 edges of MSE(normal derivative, 0)."""
    _, grad_fn, _ = _phi_fns(model, variables, cfg, phi_fn)

    def edge_loss(u_e, pts_e, comp):
        if phi_fn is None:
            feat = branch_features(model, variables, u_e, grid, nbr,
                                   train=False)
        else:
            feat = jnp.zeros((u_e.shape[0], 1))
        per_q = jax.vmap(grad_fn, in_axes=(None, 0))
        g = jax.vmap(per_q, in_axes=(0, None))(feat, pts_e)  # [nu, nb, 2]
        return jnp.mean(g[..., comp] ** 2)

    l1 = edge_loss(batch.u[0], batch.points[0], 0)  # x = 0: dphi/dx
    l2 = edge_loss(batch.u[1], batch.points[1], 0)  # x = 1: dphi/dx
    l3 = edge_loss(batch.u[2], batch.points[2], 1)  # y = 0: dphi/dy
    l4 = edge_loss(batch.u[3], batch.points[3], 1)  # y = 1: dphi/dy
    return (l1 + l2 + l3 + l4) / 4.0


def ma_loss(model: DMM, variables, interior: InteriorBatch,
            boundary: BoundaryBatch, cfg: MALossConfig,
            grid=None, nbr=None, phi_fn=None) -> MALossTerms:
    """Full Monge-Ampere objective on one sampled batch."""
    f, grad_fn, hess_fn = _phi_fns(model, variables, cfg, phi_fn)

    if phi_fn is None:
        feat = branch_features(model, variables, interior.u, grid, nbr,
                               train=False)
    else:
        feat = jnp.zeros((interior.u.shape[0], 1))

    def per_query(ft, x):
        return grad_fn(ft, x), hess_fn(ft, x)

    inner = jax.vmap(per_query, in_axes=(None, 0))
    g, h = jax.vmap(inner, in_axes=(0, 0))(feat, interior.x)
    # g [nu, nx, 2]; h [nu, nx, 2, 2]

    if cfg.init_mesh:
        # pretraining toward the identity mesh (reference: train_MA_res
        # init_mesh branch, mesh/dmm_utils.py:522-525)
        loss_in = jnp.mean(g ** 2)
        lb = boundary_loss(model, variables, boundary, cfg, grid, nbr,
                           phi_fn) \
            if cfg.bound_constraint == "soft" else jnp.zeros(())
        total = cfg.loss_weight1 * lb + cfg.loss_weight0 * loss_in
        return MALossTerms(total, loss_in, lb, jnp.zeros(()),
                           jnp.ones_like(g[..., 0]))

    moved = interior.x + g                                # [nu, nx, 2]
    ux_m = ops.idw_grid(interior.ux, moved)               # [nu, nx]
    uy_m = ops.idw_grid(interior.uy, moved)

    pxx = h[..., 0, 0]
    pxy = h[..., 0, 1]
    pyx = h[..., 1, 0]
    pyy = h[..., 1, 1]

    u_xi_x = ux_m * (1.0 + pxx) + uy_m * pyx
    u_xi_y = ux_m * pxy + uy_m * (1.0 + pyy)
    m_xi = ops.monitor(interior.alpha[:, None], u_xi_x, u_xi_y)
    lhs = m_xi * ((1.0 + pxx) * (1.0 + pyy) - pxy * pyx)
    ratio = lhs / interior.rhs[:, None]

    loss_in = jnp.mean((ratio - 1.0) ** 2)
    loss_convex = jnp.mean(jnp.minimum(0.0, 1.0 + pxx) ** 2 +
                           jnp.minimum(0.0, 1.0 + pyy) ** 2)
    if cfg.bound_constraint == "soft":
        lb = boundary_loss(model, variables, boundary, cfg, grid, nbr, phi_fn)
    else:
        lb = jnp.zeros(())

    total = cfg.loss_weight1 * lb + cfg.loss_weight0 * loss_in
    if cfg.loss_convex:
        total = total + cfg.loss_weight2 * loss_convex
    return MALossTerms(total, loss_in, lb, loss_convex, ratio)
