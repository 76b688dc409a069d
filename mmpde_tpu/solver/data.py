"""Graph/data construction for the MM-PDE solver.

TPU-native equivalent of the reference ``GraphCreator_FS_2D``
(data_creator_2d.py:18-305), with the structural fixes the hardware wants:

* The uniform-mesh graph is CONSTANT — its kNN neighbor table is computed
  once at pipeline construction, not per step (the reference rebuilds
  knn_graph on every batch, data_creator_2d.py:260).
* Moved-mesh kNN interpolation runs on device via ops.knn_query — the
  reference round-trips through sklearn NearestNeighbors on CPU inside the
  training hot loop (data_creator_2d.py:66-78).
* All outputs are dense [B, N, ...] arrays with static shapes, so the whole
  create_data -> mesh movement -> interpolation -> GNN forward -> loss path
  lives inside one jit.

The moved mesh is treated as a constant w.r.t. the optimizer (the DMM is
frozen during solver training, mmpde.py:200-201), so it is wrapped in
stop_gradient.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmpde_tpu import ops
from mmpde_tpu.ops.knn import knn_query_uniform_grid
from mmpde_tpu.models.dmm import DMM
from mmpde_tpu.models.itpnet import ItpNet
from mmpde_tpu.dmm.geometry import branch_features, phi_derivatives
from mmpde_tpu.pdes import PDE


class GraphPipeline:
    """Static graph/mesh state + pure jittable methods.

    Equivalent surface to GraphCreator_FS_2D: create_data, uniform_graph /
    moved_graph (together replacing create_graph), interpolate_pred.
    """

    def __init__(self, pde: PDE, neighbors: int = 35,
                 connect_edge: str = "knn", time_window: int = 1,
                 t_resolution: int = 31, n_itp_neighbors: int = 30):
        self.pde = pde
        self.n = neighbors
        self.e = connect_edge
        self.tw = time_window
        self.t_res = t_resolution
        self.n_itp = n_itp_neighbors
        self.is_grid = len(pde.grid_size) == 3

        if self.is_grid:
            nx, ny = pde.grid_size[1], pde.grid_size[2]
            xs = np.linspace(0, pde.Lx, nx)
            ys = np.linspace(0, pde.Ly, ny)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            self.grid = jnp.asarray(
                np.stack([gx.ravel(), gy.ravel()], -1), dtype=jnp.float32)
            dx, dy = xs[1] - xs[0], ys[1] - ys[0]
            self.radius = self.n * float(np.sqrt(dx ** 2 + dy ** 2)) + 1e-4
        else:
            self.grid = jnp.asarray(pde.ori_grid, dtype=jnp.float32)
            n_side = int(np.sqrt(pde.grid_size[1]))
            dx = pde.Lx / max(n_side - 1, 1)
            self.radius = self.n * float(np.sqrt(2.0)) * dx + 1e-4

        self.n_nodes = self.grid.shape[0]
        # fixed-degree cap for radius graphs (torch_cluster.radius_graph
        # also caps, at max_num_neighbors=32; 4*n keeps strictly more at the
        # reference n=35)
        self.max_radius_k = 4 * self.n
        # static uniform-mesh connectivity (computed once)
        if connect_edge == "knn":
            self.uniform_nbr = ops.knn_indices(self.grid, self.n)
            self.uniform_mask = None
        elif connect_edge == "radius":
            idx, mask = ops.radius_neighbors(self.grid, self.radius,
                                             max_k=self.max_radius_k)
            self.uniform_nbr, self.uniform_mask = idx, mask
        else:
            raise ValueError(f"unknown connect_edge {connect_edge!r}")

        self.times = jnp.linspace(pde.tmin, pde.tmax, pde.grid_size[0])
        # static candidate tables for locality-restricted kNN (lazy; keyed
        # by candidate count) — see ops.knn_via_candidates
        self._cand_cache: dict = {}

    # ---------------- locality-restricted kNN ----------------

    def _local_cand(self, c: int) -> jnp.ndarray:
        """[N, c] static table: each node's c nearest nodes in the ORIGINAL
        layout (self included, at rank 0).  Superset for moved-mesh kNN."""
        c = min(c, self.n_nodes)
        if c not in self._cand_cache:
            # first use may be inside a jit trace — force eager evaluation
            # (inputs are concrete) so a tracer is never cached
            with jax.ensure_compile_time_eval():
                tbl = ops.knn_query(self.grid, self.grid, c)
            self._cand_cache[c] = jax.block_until_ready(tbl)
        return self._cand_cache[c]

    @staticmethod
    def _itp_bf16() -> bool:
        """MMPDE_BF16_ITP=1: interpolation einsums compute in bfloat16 with
        f32 accumulation (opt-in until convergence-validated on chip, like
        the MMPDE_BF16 edge-compute path before it)."""
        return os.environ.get("MMPDE_BF16_ITP", "0") == "1"

    @staticmethod
    def _local_knn_cand() -> int:
        """0 = disabled; else the candidate count (MMPDE_LOCAL_KNN=1 with
        optional MMPDE_LOCAL_KNN_CAND, default 192)."""
        if os.environ.get("MMPDE_LOCAL_KNN", "0") != "1":
            return 0
        return int(os.environ.get("MMPDE_LOCAL_KNN_CAND", "192"))

    def _use_bucket_knn(self) -> bool:
        """Grid-bucketed spatial-hash kNN for the moved-mesh searches
        (ops/bucket_knn.py) — no O(N^2) anywhere, incl. the one-time
        candidate-table build the locality path needs.  MMPDE_BUCKET_KNN=1
        forces it on, =0 forces it off; unset, it auto-enables above 16k
        nodes, where any dense pass (or table build) stops being viable."""
        v = os.environ.get("MMPDE_BUCKET_KNN")
        if v is not None:
            return v == "1"
        on = self.n_nodes > 16384
        if on and not getattr(self, "_bucket_knn_logged", False):
            # auto-enabling swaps the exact dense search for the bucketed
            # one (recall envelope in ops/bucket_knn.py; DIVERGENCES 34) —
            # make the numerics switch traceable in run logs
            print("[mmpde] N > 16384: auto-enabling grid-bucketed kNN "
                  "(MMPDE_BUCKET_KNN=0 forces the dense search)",
                  file=sys.stderr)
            self._bucket_knn_logged = True
        return on

    # ---------------- data windows ----------------

    def create_data(self, u_traj: jnp.ndarray, steps: jnp.ndarray):
        """Slice (tw history, tw label) windows (reference
        data_creator_2d.py:139-154).

        u_traj [B, T, ...], steps [B] -> data [B, tw, ...], labels [B, tw, ...]
        """
        tw = self.tw

        def one(traj, step):
            d = jax.lax.dynamic_slice_in_dim(traj, step - tw, tw, axis=0)
            l = jax.lax.dynamic_slice_in_dim(traj, step, tw, axis=0)
            return d, l

        return jax.vmap(one)(u_traj, steps)

    # ---------------- node features ----------------

    def _node_fields(self, data, labels):
        """[B, tw, ...spatial] -> node-major [B, N, tw]."""
        b = data.shape[0]
        u = data.reshape(b, self.tw, self.n_nodes)
        y = labels.reshape(b, self.tw, self.n_nodes)
        return jnp.swapaxes(u, 1, 2), jnp.swapaxes(y, 1, 2)

    def _pos(self, mesh, steps):
        """mesh [B, N, 2], steps [B] -> pos [B, N, 3] = (t, x, y)."""
        t = self.times[steps][:, None, None]
        t = jnp.broadcast_to(t, mesh.shape[:2] + (1,))
        return jnp.concatenate([t, mesh], axis=-1)

    def uniform_graph(self, data, labels, steps):
        """Uniform-mesh graph: (u [B,N,tw], y [B,N,tw], pos [B,N,3])."""
        u, y = self._node_fields(data, labels)
        mesh = jnp.broadcast_to(self.grid[None], (u.shape[0],) + self.grid.shape)
        return u, y, mesh, self._pos(mesh, steps)

    # ---------------- moved mesh ----------------

    def moved_mesh(self, dmm: DMM, dmm_vars, data,
                   dmm_grid=None, dmm_nbr=None):
        """DMM mesh movement for each history window (frozen DMM).

        data [B, tw, ...spatial] -> mesh [B, N, 2].  Uses the most recent
        history slice as the DMM input (tw = 1 in all reference configs;
        data_creator_2d.py:198 flattens B*tw — identical for tw == 1).
        """
        b = data.shape[0]
        if self.is_grid:
            u_in = data.reshape(b, self.tw, data.shape[-2], data.shape[-1])[:, -1]
            mm = self.pde.movingmesh_grid_size
            if u_in.shape[-2] != mm[-2] or u_in.shape[-1] != mm[-1]:
                u_in = jax.image.resize(u_in, (b, mm[-2], mm[-1]), "linear")
        else:
            u_in = data.reshape(b, self.tw, self.n_nodes)[:, -1]
        xi = jnp.broadcast_to(self.grid[None], (b,) + self.grid.shape)
        feat = branch_features(dmm, dmm_vars, u_in, dmm_grid, dmm_nbr,
                               train=False)
        _, grad = phi_derivatives(dmm, dmm_vars, feat, xi, order=1)
        return jax.lax.stop_gradient(xi + grad)

    # ---------------- learned kNN interpolation ----------------

    def _itp_nbr(self, src_pts, query_pts, uniform_src: bool,
                 aligned: bool) -> jnp.ndarray:
        """kNN indices [B, Q, k] for learned interpolation (search only).

        uniform_src: sources are the static uniform grid — with
        MMPDE_GRID_KNN=1 the O(Q*window^2) analytic window search replaces
        the O(Q*N) distance pass (opt-in fast path).
        aligned: src and query are images of the SAME node set (one of them
        the original layout, the other its moved mesh) — with
        MMPDE_LOCAL_KNN=1 the search is restricted to each node's static
        C-neighborhood (O(Q*C), recall-validated in tests).
        """
        k = self.n_itp

        # the analytic window search assumes the unit square (it clips
        # queries to [0,1] and derives candidates as i/(n-1)), so gate on
        # Lx == Ly == 1 in addition to grid squareness
        use_window = (uniform_src and self.is_grid
                      and self.pde.grid_size[1] == self.pde.grid_size[2]
                      and float(self.pde.Lx) == 1.0
                      and float(self.pde.Ly) == 1.0
                      and os.environ.get("MMPDE_GRID_KNN", "0") == "1")
        c_cand = self._local_knn_cand()
        if use_window:
            n_side = self.pde.grid_size[1]
            return jax.vmap(lambda q: knn_query_uniform_grid(
                n_side, q, k))(query_pts)                       # [B, Q, k]
        if self._use_bucket_knn():
            hi = float(max(self.pde.Lx, self.pde.Ly))
            bkw = {}
            frac = (float(self.pde.Lx) * float(self.pde.Ly)) / (hi * hi)
            if frac < 0.999:
                # rectangular domain: points occupy only a strip of the
                # [0, hi]^2 hash square, raising per-occupied-cell density
                # by 1/frac — scale capacity to match so strip cells don't
                # capacity-truncate (ADVICE r3)
                n = src_pts.shape[1]
                n_side = max(2, int((2.0 * n / max(k, 1)) ** 0.5))
                bkw["n_side"] = n_side
                bkw["capacity"] = max(
                    k, int(4 * n / (n_side * n_side * frac)) + 4)
            return jax.vmap(lambda src, q: ops.bucket_knn(
                src, q, k, hi=hi, **bkw))(src_pts, query_pts)   # [B, Q, k]
        if (aligned and c_cand and
                query_pts.shape[1] == self.n_nodes and
                src_pts.shape[1] == self.n_nodes):
            # one-sided moves need headroom for the displacement itself on
            # top of density contrast: use 2x the two-sided candidate count
            cand = self._local_cand(2 * c_cand)
            return jax.vmap(lambda src, q: ops.knn_via_candidates(
                src, q, cand, k))(src_pts, query_pts)           # [B, Q, k]
        return jax.vmap(lambda src, q: ops.knn_query(src, q, k))(
            src_pts, query_pts)                                 # [B, Q, k]

    def itp_interpolate(self, itp: ItpNet, itp_vars, values, src_pts,
                        query_pts, mode: str, uniform_src: bool = False,
                        aligned: bool = False, geom=None):
        """Move per-node values between meshes with learned kNN weights.

        values [B, N_src, C], src_pts [B, N_src, 2], query_pts [B, Q, 2]
        -> [B, Q, C].  (reference: GraphCreator_FS_2D.interpolate,
        data_creator_2d.py:46-85 — sklearn kNN replaced by device top_k.)

        geom: optional precomputed (nbr [B,Q,k], weights [B,Q,k]) from
        itp_geometry — skips the search and the weight MLP.
        """
        if geom is not None:
            nbr, w = geom
        else:
            nbr = self._itp_nbr(src_pts, query_pts, uniform_src, aligned)
            nbr_pts = jax.vmap(lambda s, i: s[i])(src_pts, nbr)  # [B,Q,k,2]
            w = itp.apply(itp_vars, nbr_pts, query_pts[:, :, None, :], mode)
        nbr_val = jax.vmap(lambda v, i: v[i])(values, nbr)      # [B, Q, k, C]
        if self._itp_bf16():
            return jnp.einsum("bqk,bqkc->bqc", w.astype(jnp.bfloat16),
                              nbr_val.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        return jnp.einsum("bqk,bqkc->bqc", w, nbr_val)

    def itp_geometry(self, itp: ItpNet, itp_vars, mesh):
        """Both interpolation directions' (neighbors, weights) in ONE
        stacked weight-MLP apply (MMPDE_FUSED_ITP=1 fast path).

        The mode-'1' (uniform -> moved) and mode-'2' (moved -> uniform)
        weights depend only on geometry, not on the values being moved, so
        both can be computed right after mesh movement; the reference
        evaluates each MLP at its use site (data_creator_2d.py:80-85,
        :290-296).  Stacking the two MLPs' parameters doubles the matmul
        batch — one apply instead of two half-size dispatches.  Requires
        itp.layers1 == itp.layers2 (same stack shape).

        mesh [B, N, 2] -> ((nbr1, w1), (nbr2, w2)), each [B, N, k] pairs.
        """
        assert tuple(itp.layers1) == tuple(itp.layers2), \
            "fused itp geometry needs layers1 == layers2"
        b = mesh.shape[0]
        grid = jnp.broadcast_to(self.grid[None], (b,) + self.grid.shape)
        nbr1 = self._itp_nbr(grid, mesh, uniform_src=True, aligned=True)
        nbr2 = self._itp_nbr(mesh, grid, uniform_src=False, aligned=True)
        pts1 = jax.vmap(lambda s, i: s[i])(grid, nbr1)    # [B, N, k, 2]
        pts2 = jax.vmap(lambda s, i: s[i])(mesh, nbr2)
        x1 = jnp.concatenate([pts1, mesh[:, :, None, :]], axis=-2)
        x2 = jnp.concatenate([pts2, grid[:, :, None, :]], axis=-2)
        x = jnp.stack([x1, x2]).reshape(2, b, mesh.shape[1], -1)
        params = itp_vars["params"]
        n_layers = len(itp.layers1) + 1
        bf16 = self._itp_bf16()
        for j in range(n_layers):
            kern = jnp.stack([params[f"w1_{j}"]["kernel"],
                              params[f"w2_{j}"]["kernel"]])
            bias = jnp.stack([params[f"w1_{j}"]["bias"],
                              params[f"w2_{j}"]["bias"]])
            if bf16:
                x = jnp.einsum("sbqd,sde->sbqe", x.astype(jnp.bfloat16),
                               kern.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                x = x + bias[:, None, None]
            else:
                x = jnp.einsum("sbqd,sde->sbqe", x, kern) + bias[:, None, None]
            if j != n_layers - 1:
                x = jnp.tanh(x)
        return (nbr1, x[0]), (nbr2, x[1])

    def moved_graph(self, dmm, dmm_vars, itp, itp_vars, data, labels, steps,
                    dmm_grid=None, dmm_nbr=None):
        """Moved-mesh graph with re-interpolated data/labels + dynamic edges.

        Returns (u [B,N,tw], y [B,N,tw], mesh [B,N,2], pos [B,N,3],
        nbr [B,N,k], nbr_mask [B,N,k] or None).  The moved graph uses the
        SAME edge type the pipeline was configured with — kNN or radius —
        matching the reference, which builds whichever edge type was
        requested for both graphs (data_creator_2d.py:256-260).
        """
        mesh = self.moved_mesh(dmm, dmm_vars, data, dmm_grid, dmm_nbr)
        u_m, y_m, pos, nbr, nbr_mask = self.moved_graph_from_mesh(
            itp, itp_vars, data, labels, steps, mesh)
        return u_m, y_m, mesh, pos, nbr, nbr_mask

    def moved_graph_from_mesh(self, itp, itp_vars, data, labels, steps,
                              mesh, geom=None):
        """moved_graph with the mesh (and optionally the mode-'1'
        interpolation geometry from itp_geometry) already computed."""
        u, y = self._node_fields(data, labels)
        b = u.shape[0]
        src = jnp.broadcast_to(self.grid[None], (b,) + self.grid.shape)
        # one kNN + one weight evaluation for data AND labels (the learned
        # weights depend only on geometry; the reference recomputes both,
        # data_creator_2d.py:206-209)
        uy = self.itp_interpolate(itp, itp_vars,
                                  jnp.concatenate([u, y], axis=-1), src,
                                  mesh, "1", uniform_src=True, aligned=True,
                                  geom=geom)
        u_m, y_m = uy[..., :self.tw], uy[..., self.tw:]
        c_cand = self._local_knn_cand()
        if self.e == "radius":
            nbr, nbr_mask = jax.vmap(
                lambda p: ops.radius_neighbors(p, self.radius,
                                               max_k=self.max_radius_k))(mesh)
        elif self._use_bucket_knn():
            self_idx = jnp.arange(self.n_nodes, dtype=jnp.int32)
            hi = float(max(self.pde.Lx, self.pde.Ly))
            nbr = jax.vmap(lambda p: ops.bucket_knn(
                p, p, self.n, hi=hi, exclude_idx=self_idx))(mesh)
            nbr_mask = None
        elif c_cand:
            # both endpoints move with the mesh, so node i's moved kNN stays
            # inside its static C-neighborhood (C bounded by the mesh's
            # density contrast, not N) — O(N*C) instead of O(N^2)
            cand = self._local_cand(c_cand)
            self_idx = jnp.arange(self.n_nodes, dtype=jnp.int32)
            nbr = jax.vmap(lambda p: ops.knn_via_candidates(
                p, p, cand, self.n, exclude_idx=self_idx))(mesh)
            nbr_mask = None
        else:
            nbr = jax.vmap(lambda p: ops.knn_indices(p, self.n))(mesh)
            nbr_mask = None
        return u_m, y_m, self._pos(mesh, steps), nbr, nbr_mask

    def interpolate_pred(self, itp, itp_vars, pred, mesh, data, geom=None):
        """Moved-mesh prediction -> uniform mesh + residual-cut correction.

        pred [B, N, tw], mesh [B, N, 2], data [B, tw, ...spatial]
        -> [B, N, tw] on the uniform mesh.  geom: optional precomputed
        mode-'2' (nbr, weights) from itp_geometry.
        (reference: data_creator_2d.py:270-305.)
        """
        b = pred.shape[0]
        query = jnp.broadcast_to(self.grid[None], (b,) + self.grid.shape)
        pred_grid = self.itp_interpolate(itp, itp_vars, pred, mesh, query,
                                         "2", aligned=True, geom=geom)
        if self.is_grid:
            nx, ny = self.pde.ori_grid_size[-2], self.pde.ori_grid_size[-1]
            res = itp.apply(itp_vars, None, None, "res_cut",
                            data.reshape(b, self.tw, nx, ny))
            res = res.reshape(b, self.tw, self.n_nodes)
        else:
            res = itp.apply(itp_vars, None, None, "res_cut",
                            data.reshape(b, self.n_nodes))
            res = res.reshape(b, self.tw, self.n_nodes)
        return pred_grid + jnp.swapaxes(res, 1, 2)
