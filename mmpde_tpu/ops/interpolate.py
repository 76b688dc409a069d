"""Differentiable softmax-IDW interpolation.

The reference interpolates fields between meshes with a softmax over
negative scaled distances to every source point
(reference: mesh/dmm_utils.py:233-274, ``interpolate``/``interpolate_tri``/
``interpolate3``).  The reference materialises a [B, n^2, 2] distance tensor
per scalar query; here each batch element computes a [Q, n^2] weight matrix
and contracts it against the field on the MXU — a softmax-matmul identical
in structure to one attention head, which XLA maps well to TPU.

All functions are pure jnp and differentiable w.r.t. both the field and the
query coordinates (the DMM loss differentiates through the query path).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    """Dispatch the blocked Pallas kernel on TPU (override: MMPDE_PALLAS=0)."""
    if os.environ.get("MMPDE_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def uniform_grid(n: int, indexing: str = "ij") -> jnp.ndarray:
    """Flattened uniform grid over [0,1]^2, shape [n*n, 2].

    Point p = i*n + j has coordinates (x_i, y_j) ('ij' indexing) so that a
    row-major flattened field u[i, j] = u(x_i, y_j) lines up with it.

    NOTE divergence from reference: mesh/dmm_utils.py:241-243 builds the grid
    with np.meshgrid(indexing='xy') while flattening u row-major, which pairs
    u[i, j] with (x_j, y_i).  The reference is self-consistent under that
    implicit transpose; we use the consistent 'ij' convention everywhere.
    """
    xs = jnp.linspace(0.0, 1.0, n)
    gx, gy = jnp.meshgrid(xs, xs, indexing=indexing)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def _idw_weights(src: jnp.ndarray, query: jnp.ndarray, scale) -> jnp.ndarray:
    """softmax_q(-scale * ||src - query||) over source points.

    src: [n, 2], query: [Q, 2] -> [Q, n].  Epsilon-guarded norm: its
    gradient at an exact src/query collision is NaN otherwise (queries are
    moved-mesh points that can land on grid nodes).
    """
    diff = src[None, :, :] - query[:, None, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-24)
    return jax.nn.softmax(-d * scale, axis=-1)


def idw_points_single(u: jnp.ndarray, src: jnp.ndarray, query: jnp.ndarray,
                      scale) -> jnp.ndarray:
    """Interpolate one field sampled at scattered points.

    u: [n] field values, src: [n, 2] source coords, query: [Q, 2].
    Returns [Q].  (reference: interpolate_tri, mesh/dmm_utils.py:251-267,
    with scale = sqrt(n); reference interpolate uses scale = n.)
    """
    w = _idw_weights(src, query, scale)
    return w @ u


def idw_grid(u: jnp.ndarray, query: jnp.ndarray, scale=None) -> jnp.ndarray:
    """Batched softmax-IDW on uniform grids.

    u: [b, n, n] fields, query: [b, Q, 2] query points per field.
    Returns [b, Q].  Weight sharpness defaults to the reference's ``n``
    (reference: mesh/dmm_utils.py:244).
    """
    n = u.shape[-1]
    grid = uniform_grid(n)
    if scale is None:
        scale = float(n)

    if _use_pallas():
        from mmpde_tpu.ops.pallas_idw import idw_points_pallas
        b = u.shape[0]
        src = jnp.broadcast_to(grid[None], (b, n * n, 2))
        return idw_points_pallas(u.reshape(b, -1, 1), src, query,
                                 float(scale))[..., 0]

    def one(ub, qb):
        return idw_points_single(ub.reshape(-1), grid, qb, scale)

    return jax.vmap(one)(u, query)


def idw_points(u: jnp.ndarray, src: jnp.ndarray, query: jnp.ndarray,
               scale=None) -> jnp.ndarray:
    """Batched softmax-IDW on scattered source points.

    u: [b, n], src: [b, n, 2], query: [b, Q, 2] -> [b, Q].
    Default sharpness sqrt(n) as the reference's interpolate_tri.
    """
    n = u.shape[-1]
    if scale is None:
        scale = float(jnp.sqrt(n))
    if _use_pallas():
        from mmpde_tpu.ops.pallas_idw import idw_points_pallas
        return idw_points_pallas(u[..., None], src, query,
                                 float(scale))[..., 0]
    return jax.vmap(lambda ub, sb, qb: idw_points_single(ub, sb, qb, scale))(
        u, src, query)
