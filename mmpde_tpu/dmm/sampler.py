"""Monitor-weighted collocation sampling for DMM training.

Device-native equivalents of the reference samplers
(mesh/dmm_utils.py:29-206): interior points are drawn from 40*nx uniform
candidates per snapshot with probability proportional to the interpolated
monitor — via Gumbel-top-k instead of host np.random.choice — and boundary
points are fixed equispaced edge nodes paired with independently resampled
snapshots.  Everything jit-compiles; a full sampling step is one XLA
program with no host synchronisation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mmpde_tpu import ops


class InteriorBatch(NamedTuple):
    u: jnp.ndarray        # [nu, s, s] (burgers) or [nu, n] (cy field)
    ux: jnp.ndarray       # [nu, s, s] gradient on the uniform grid
    uy: jnp.ndarray
    alpha: jnp.ndarray    # [nu]
    m: jnp.ndarray        # [nu, s, s] monitor on the grid
    rhs: jnp.ndarray      # [nu]
    x: jnp.ndarray        # [nu, nx, 2] collocation points


class BoundaryBatch(NamedTuple):
    points: jnp.ndarray   # [4, nb, 2]  (left, right, bottom, top)
    u: jnp.ndarray        # [4, nu, ...] snapshots per edge


def sample_interior(key, all_u: jnp.ndarray, nx: int, nu: int,
                    oversample: int = 40) -> InteriorBatch:
    """Burgers interior sampler (reference: sample_train_data,
    mesh/dmm_utils.py:29-54)."""
    k_u, k_cand, k_pick = jax.random.split(key, 3)
    u_idx = jax.random.randint(k_u, (nu,), 0, all_u.shape[0])
    u = all_u[u_idx]
    ux, uy, alpha, m, rhs = ops.monitor_stats(u)

    cand = jax.random.uniform(k_cand, (nu, oversample * nx, 2))
    p = ops.idw_grid(m, cand)                           # [nu, 40nx]
    logits = jnp.log(jnp.maximum(p, 1e-30))
    keys = jax.random.split(k_pick, nu)
    idx = jax.vmap(lambda k, lg: ops.gumbel_topk_choice(k, lg, nx))(
        keys, logits)                                   # [nu, nx]
    pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
    return InteriorBatch(u, ux, uy, alpha, m, rhs, pts)


def sample_boundary(key, all_u: jnp.ndarray, nx: int, nu: int) -> BoundaryBatch:
    """Boundary sampler (reference: sample_train_data_bound,
    mesh/dmm_utils.py:56-103): nx//4 equispaced points per edge, 4*nu
    independently resampled snapshots split across the edges."""
    u_idx = jax.random.randint(key, (4 * nu,), 0, all_u.shape[0])
    u = all_u[u_idx].reshape((4, nu) + all_u.shape[1:])
    left, right, bottom, top = ops.boundary_points(nx, dtype=jnp.float32)
    pts = jnp.stack([left, right, bottom, top])
    return BoundaryBatch(pts, u)


def _grid_gradients_tri(u: jnp.ndarray, mesh: jnp.ndarray, n_side: int):
    """d/dxi of the softmax-IDW interpolant of scattered u on a uniform grid.

    u [nu, n] field at mesh nodes, mesh [n, 2] -> (ux, uy) each
    [nu, n_side, n_side].  The reference differentiates interpolate_tri with
    torch.autograd (mesh/dmm_utils.py:129-148); here jax.grad of the scalar
    interpolant, vmapped over grid queries.
    """
    n = u.shape[-1]
    scale = jnp.sqrt(float(n))
    grid = ops.uniform_grid(n_side)

    def interp_scalar(ub, q):
        diff = mesh - q[None, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-24)
        w = jax.nn.softmax(-d * scale)
        return jnp.dot(w, ub)

    g = jax.grad(interp_scalar, argnums=1)
    per_u = jax.vmap(lambda ub: jax.vmap(lambda q: g(ub, q))(grid))
    grads = per_u(u)                                   # [nu, n_side^2, 2]
    gx = grads[..., 0].reshape(-1, n_side, n_side)
    gy = grads[..., 1].reshape(-1, n_side, n_side)
    return gx, gy


def sample_interior_tri(key, all_u: jnp.ndarray, mesh: jnp.ndarray,
                        nx: int, nu: int,
                        oversample: int = 40) -> InteriorBatch:
    """Cylinder interior sampler (reference: sample_train_data_tri,
    mesh/dmm_utils.py:106-167).

    all_u [M, n, C] with field at channel 2; mesh [n, 2] node coordinates.
    The monitor is built from the gradient of the IDW interpolant on an
    implicit sqrt(n)-point uniform grid.
    """
    k_u, k_cand, k_pick = jax.random.split(key, 3)
    field = all_u[:, :, 2]
    u_idx = jax.random.randint(k_u, (nu,), 0, field.shape[0])
    u = field[u_idx]                                   # [nu, n]
    n_side = int(round(float(field.shape[-1]) ** 0.5))

    ux, uy = _grid_gradients_tri(u, mesh, n_side)
    gnorm = jnp.sqrt(ux ** 2 + uy ** 2 + 1e-24)
    alpha = jnp.sum(gnorm, axis=(-2, -1)) / (n_side - 1) ** 2
    m = ops.monitor(alpha[:, None, None], ux, uy)
    rhs = jnp.sum(m, axis=(-2, -1)) / (n_side - 1) ** 2

    cand = jax.random.uniform(k_cand, (nu, oversample * nx, 2))
    ux_c = ops.idw_grid(ux, cand, scale=float(n_side))
    uy_c = ops.idw_grid(uy, cand, scale=float(n_side))
    p = ops.monitor(alpha[:, None], ux_c, uy_c)
    keys = jax.random.split(k_pick, nu)
    idx = jax.vmap(lambda k, lg: ops.gumbel_topk_choice(k, lg, nx))(
        keys, jnp.log(jnp.maximum(p, 1e-30)))
    pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
    return InteriorBatch(u, ux, uy, alpha, m, rhs, pts)


def sample_boundary_tri(key, all_u: jnp.ndarray, nx: int,
                        nu: int) -> BoundaryBatch:
    """Cylinder boundary sampler (reference: sample_train_data_bound_tri,
    mesh/dmm_utils.py:169-206) — field channel only."""
    u_idx = jax.random.randint(key, (4 * nu,), 0, all_u.shape[0])
    u = all_u[u_idx, :, 2].reshape(4, nu, -1)
    left, right, bottom, top = ops.boundary_points(nx, dtype=jnp.float32)
    pts = jnp.stack([left, right, bottom, top])
    return BoundaryBatch(pts, u)
