"""Mesh-quality evaluation.

Equivalents of the reference ``evaluate`` / ``evaluate_tri`` / ``itp_error``
(mesh/dmm_utils.py:1109-1284): equidistribution statistics of
monitor x cell-area over the moved mesh (std -> 0 as the mesh equidistributes
the monitor), and the round-trip interpolation error.

The per-snapshot moved mesh + cell geometry + interpolation runs on device
(one jitted program, vmapped over snapshots); Delaunay triangulation for the
scattered case stays on host (scipy/Qhull) since it is eval-only and its
output feeds straight back into device code as static index arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmpde_tpu import ops
from mmpde_tpu.dmm.geometry import branch_features, phi_derivatives
from mmpde_tpu.models.dmm import DMM


def _moved_grid(model, variables, u, xi, grid=None, nbr=None):
    feat = branch_features(model, variables, u, grid, nbr, train=False)
    _, g = phi_derivatives(model, variables, feat, xi, order=1)
    return xi + g


def evaluate(model: DMM, variables, u, max_snapshots: int = 150):
    """Burgers mesh quality (reference: evaluate, mesh/dmm_utils.py:1235-1284).

    u [M, s, s].  Returns (mean, std, maxmin) of monitor x quad-cell-area
    averaged over snapshots; cell area uses the reference's
    diagonal-product formula d1*d2/2.
    """
    u = u[:max_snapshots]
    s = u.shape[-1]
    xi = jnp.broadcast_to(ops.uniform_grid(s)[None], (u.shape[0], s * s, 2))
    _, _, _, m, _ = ops.monitor_stats(u)

    x = _moved_grid(model, variables, u, xi).reshape(-1, s, s, 2)
    bl = x[:, :-1, :-1]
    br = x[:, 1:, :-1]
    tl = x[:, :-1, 1:]
    tr = x[:, 1:, 1:]
    d1 = jnp.linalg.norm(bl - tr, axis=-1)
    d2 = jnp.linalg.norm(br - tl, axis=-1)
    area = d1 * d2 / 2.0
    center = (bl + br + tl + tr) / 4.0                   # [M, s-1, s-1, 2]
    m_center = ops.idw_grid(m, center.reshape(u.shape[0], -1, 2))
    m_per_cell = m_center.reshape(area.shape) * area
    mean = jnp.mean(jnp.mean(m_per_cell, axis=(-2, -1)))
    std = jnp.mean(jnp.std(m_per_cell, axis=(-2, -1)))
    minmax = jnp.mean(jnp.max(m_per_cell, axis=(-2, -1)) -
                      jnp.min(m_per_cell, axis=(-2, -1)))
    return float(mean), float(std), float(minmax)


def evaluate_tri(model: DMM, variables, u, mesh, grid=None, nbr=None,
                 max_snapshots: int = 150):
    """Cylinder mesh quality (reference: evaluate_tri,
    mesh/dmm_utils.py:1162-1232).

    u [M, n] field at mesh nodes, mesh [n, 2].  Moved nodes are Delaunay-
    triangulated (host); per-triangle area x centroid-monitor statistics are
    averaged over snapshots.
    """
    from scipy.spatial import Delaunay

    u = u[:max_snapshots]
    m_count = u.shape[0]
    n = u.shape[-1]
    n_side = int(round(n ** 0.5))
    xi = jnp.broadcast_to(mesh[None], (m_count,) + mesh.shape)

    moved = np.asarray(_moved_grid(model, variables, u, xi, grid, nbr))
    tri = Delaunay(np.asarray(mesh))
    simplices = jnp.asarray(tri.simplices)               # [T, 3]

    # monitor on an implicit uniform grid from the IDW interpolant gradient
    from mmpde_tpu.dmm.sampler import _grid_gradients_tri
    ux, uy = _grid_gradients_tri(jnp.asarray(u), mesh, n_side)
    alpha = jnp.sum(jnp.sqrt(ux ** 2 + uy ** 2 + 1e-24), axis=(-2, -1)) \
        / (n_side - 1) ** 2
    m = ops.monitor(alpha[:, None, None], ux, uy)        # [M, ns, ns]

    pts = jnp.asarray(moved)                             # [M, n, 2]
    v = pts[:, simplices]                                # [M, T, 3, 2]
    x1, y1 = v[..., 0, 0], v[..., 0, 1]
    x2, y2 = v[..., 1, 0], v[..., 1, 1]
    x3, y3 = v[..., 2, 0], v[..., 2, 1]
    area = 0.5 * jnp.abs(x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
    centroid = jnp.mean(v, axis=-2)                      # [M, T, 2]
    m_c = ops.idw_grid(m, centroid, scale=float(n_side))
    m_per_tri = m_c * area
    mean = jnp.mean(jnp.mean(m_per_tri, axis=-1))
    std = jnp.mean(jnp.std(m_per_tri, axis=-1))
    minmax = jnp.mean(jnp.max(m_per_tri, axis=-1) - jnp.min(m_per_tri, axis=-1))
    return float(mean), float(std), float(minmax)


def itp_error(model: DMM, variables, u):
    """Round-trip interpolation error, moved vs uniform mesh
    (reference: itp_error, mesh/dmm_utils.py:1109-1146).

    u [1, s, s].  Coarsens to s//4 query meshes (moved and uniform),
    interpolates u onto each and back, returns the two relative L2 errors.
    """
    s = u.shape[-1]
    nq = s // 4
    ori = ops.uniform_grid(s)
    xi = jnp.broadcast_to(ops.uniform_grid(nq)[None], (1, nq * nq, 2))

    moved = _moved_grid(model, variables, u, xi)[0]
    uniform = xi[0]
    uflat = u.reshape(1, -1)

    def roundtrip(query_mesh):
        vals = ops.idw_points(uflat, ori[None], query_mesh[None],
                              scale=float(s))[0]
        back = ops.idw_points(vals[None], query_mesh[None], ori[None],
                              scale=float(s))[0]
        return jnp.linalg.norm(back - uflat[0]) / jnp.linalg.norm(uflat[0])

    return float(roundtrip(moved)), float(roundtrip(uniform))
