"""Mesh visualisation (reference: plot_mesh_res / plot_mesh_res_tri,
mesh/dmm_utils.py:1288-1465): monitor contours overlaid with the moved-mesh
wireframe at 5 time slices."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mmpde_tpu import ops
from mmpde_tpu.eval.evaluate import _moved_grid


def plot_mesh_res(model, variables, u, s: int, save_path: str,
                  time_indices=None):
    """Burgers: s x s moved-mesh wireframe over monitor contours.

    u [M, res, res] snapshots; 5 slices at t = 22, 44, ... like the
    reference (mesh/dmm_utils.py:1440-1441) clipped to the data length.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    res = u.shape[-1]
    if time_indices is None:
        time_indices = [min(22 * (i + 1), u.shape[0] - 1) for i in range(5)]
    _, _, _, m, _ = ops.monitor_stats(jnp.asarray(u))
    xi = jnp.asarray(ops.uniform_grid(s))[None]

    fig, axes = plt.subplots(1, 5, figsize=(20, 3), dpi=200)
    for ax_i, t in enumerate(time_indices):
        ax = axes[ax_i]
        ax.set_title(f"t={t}")
        mt = np.asarray(m[t])
        ax.contourf(mt.T, 50, cmap="binary",
                    extent=(0, res - 1, 0, res - 1), origin="lower")
        x = np.asarray(_moved_grid(model, variables,
                                   jnp.asarray(u[t:t + 1]), xi)[0])
        x = x.reshape(s, s, 2) * (res - 1)
        for j in range(s):
            ax.plot(x[j, :, 0], x[j, :, 1], lw=0.3, color="black")
            ax.plot(x[:, j, 0], x[:, j, 1], lw=0.3, color="black")
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_mesh_res_tri_s(model, variables, u, mesh, s: int, save_path: str,
                        grid=None, nbr=None, time_indices=None):
    """Cylinder, multi-size variant (reference: plot_mesh_res_tri_s,
    mesh/dmm_utils.py:1288-1351): an s x s uniform QUAD probe grid moved by
    the DMM, drawn in green over monitor contours computed from the
    autograd gradient of the softmax-IDW interpolant of the scattered
    field on an n x n uniform grid (n = sqrt(n_nodes)).

    u [M, n_nodes] tri-mesh field snapshots, mesh [n_nodes, 2].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mmpde_tpu.dmm.sampler import _grid_gradients_tri

    if time_indices is None:
        time_indices = [min(6 * i + 5, u.shape[0] - 1) for i in range(5)]
    n = int(np.sqrt(u.shape[-1]))
    xi = jnp.asarray(ops.uniform_grid(s))[None]

    fig, axes = plt.subplots(1, 5, figsize=(20, 3), dpi=200)
    for ax_i, t in enumerate(time_indices):
        ax = axes[ax_i]
        ax.set_title(f"t={t}")
        ut = jnp.asarray(u[t:t + 1])
        ux, uy = _grid_gradients_tri(ut, jnp.asarray(mesh), n)
        alpha = jnp.sum(jnp.sqrt(ux ** 2 + uy ** 2 + 1e-24),
                        axis=(-2, -1)) / (n - 1) ** 2
        m = np.asarray(ops.monitor(alpha[:, None, None], ux, uy)[0])
        ax.contourf(m.T, 50, cmap="binary",
                    extent=(0, n - 1, 0, n - 1), origin="lower")
        x = np.asarray(_moved_grid(model, variables, ut, xi,
                                   grid, nbr)[0])
        x = x.reshape(s, s, 2) * (n - 1)
        for j in range(s):
            ax.plot(x[j, :, 0], x[j, :, 1], lw=0.3, color="green")
            ax.plot(x[:, j, 0], x[:, j, 1], lw=0.3, color="green")
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_mesh_res_tri(model, variables, u, mesh, save_path: str,
                      grid=None, nbr=None, time_indices=None):
    """Cylinder: Delaunay wireframe of the moved scattered mesh
    (reference: plot_mesh_res_tri, mesh/dmm_utils.py:1353-1415)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.spatial import Delaunay

    if time_indices is None:
        time_indices = [min(6 * i + 5, u.shape[0] - 1) for i in range(5)]
    tri = Delaunay(np.asarray(mesh))
    xi = jnp.asarray(mesh)[None]

    fig, axes = plt.subplots(1, 5, figsize=(20, 3), dpi=200)
    for ax_i, t in enumerate(time_indices):
        ax = axes[ax_i]
        ax.set_title(f"t={t}")
        x = np.asarray(_moved_grid(model, variables,
                                   jnp.asarray(u[t:t + 1]), xi,
                                   grid, nbr)[0])
        ax.triplot(x[:, 0], x[:, 1], tri.simplices, "-", linewidth=0.2,
                   color="green")
        ax.scatter(np.asarray(mesh)[:, 0], np.asarray(mesh)[:, 1], s=0.1,
                   color="blue", alpha=0.3)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path
