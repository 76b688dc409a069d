"""Pure-torch CPU re-implementation of the reference MM-PDE training step,
used by bench.py as the measured baseline.

The reference stack (torch_geometric / torch_cluster / sklearn-in-the-loop)
is not installable in this image, so this module re-creates the reference's
per-step computation with plain torch ops at matmul fidelity:

  * DMM mesh movement: conv branch + trunk MLP + autograd grad of phi
    w.r.t. the query coordinates (data_creator_2d.py:88-113)
  * sklearn NearestNeighbors kNN on CPU inside the step, once per sample
    per interpolation — exactly the host round-trip the reference performs
    (data_creator_2d.py:66-78)
  * edge-list message passing with index_add scatter-mean over k=35 kNN
    edges, 6 layers, h=128, BatchNorm (gnn_2d.py:19-141)
  * knn_graph edge construction REBUILT EVERY STEP for both the moved and
    the uniform graph, as the reference does (data_creator_2d.py:256-260)
  * ItpNet interpolation weights + res_cut conv correction
  * MSE loss, backward, AdamW step over model + model_b + itp

This intentionally omits torch_geometric's Python dispatch overhead, which
makes the baseline FASTER than the true reference — the reported speedup is
therefore conservative.
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn
from sklearn.neighbors import NearestNeighbors


class GNNLayer(nn.Module):
    def __init__(self, h, tw):
        super().__init__()
        self.m1 = nn.Linear(2 * h + tw + 2 + 1, h)
        self.m2 = nn.Linear(h, h)
        self.u1 = nn.Linear(2 * h + 1, h)
        self.u2 = nn.Linear(h, h)
        self.norm = nn.BatchNorm1d(h)

    def forward(self, h, u, px, py, var, src, dst, n):
        msg = torch.relu(self.m2(torch.relu(self.m1(torch.cat(
            [h[dst], h[src], u[dst] - u[src], px[dst] - px[src],
             py[dst] - py[src], var[dst]], dim=-1)))))
        agg = torch.zeros(n, msg.shape[-1]).index_add_(0, dst, msg)
        deg = torch.zeros(n).index_add_(0, dst, torch.ones(len(dst)))
        agg = agg / deg.clamp(min=1.0)[:, None]
        upd = torch.relu(self.u2(torch.relu(self.u1(
            torch.cat([h, agg, var], dim=-1)))))
        return self.norm(h + upd)


class Solver(nn.Module):
    def __init__(self, tw=1, h=128, layers=6):
        super().__init__()
        self.emb = nn.Sequential(nn.Linear(tw + 3, h), nn.BatchNorm1d(h),
                                 nn.ReLU(), nn.Linear(h, h),
                                 nn.BatchNorm1d(h))
        self.layers = nn.ModuleList(GNNLayer(h, tw) for _ in range(layers))
        self.dec = nn.Sequential(nn.Conv1d(1, 4, 16, stride=3), nn.ReLU(),
                                 nn.Conv1d(4, 8, 12, stride=3), nn.ReLU(),
                                 nn.Conv1d(8, 1, 8, stride=2))
        self.tw = tw

    def forward(self, u, pos, src, dst, dt):
        px, py, var = pos[:, 1:2], pos[:, 2:3], pos[:, 0:1]
        h = self.emb(torch.cat([u, px, py, var], dim=-1))
        for l in self.layers:
            h = l(h, u, px, py, var, src, dst, len(u))
        diff = self.dec(h[:, None, :]).squeeze(1)
        return torch.cumsum(torch.full((1, self.tw), dt * 0.1), 1) * diff


class DMMTorch(nn.Module):
    def __init__(self, s):
        super().__init__()
        self.c1 = nn.Conv2d(1, 8, 5, stride=2, padding=2)
        self.c2 = nn.Conv2d(8, 16, 5, padding=2)
        self.c3 = nn.Conv2d(16, 8, 5, padding=2)
        self.c4 = nn.Conv2d(8, 1, 5, stride=2, padding=2)
        flat = (((s + 1) // 2 + 1) // 2) ** 2
        flat = (s // 4) ** 2 if s % 4 == 0 else flat
        self.fc2 = nn.Linear(flat, 1024)
        self.fc3 = nn.Linear(1024, 512)
        self.trunk = nn.Sequential(nn.Linear(2, 32), nn.Tanh(),
                                   nn.Linear(32, 512))
        self.head = nn.Sequential(nn.Linear(1024, 512), nn.Tanh(),
                                  nn.Linear(512, 1))

    def forward(self, u, xi):
        x = torch.tanh(self.c1(u[:, None]))
        skip = x
        x = torch.tanh(self.c2(x))
        x = torch.tanh(skip + self.c3(x))
        x = torch.tanh(self.c4(x))
        x = x.flatten(1)
        feat = self.fc3(torch.tanh(self.fc2(x)))           # [b, 512]
        q = xi.shape[0] // feat.shape[0]
        feat = feat[:, None, :].expand(-1, q, -1).reshape(-1, 512)
        t = self.trunk(xi)
        return self.head(torch.cat([feat, t], dim=-1))


class ItpTorch(nn.Module):
    def __init__(self, nx):
        super().__init__()
        self.w1 = nn.Sequential(nn.Linear(62, 128), nn.Tanh(),
                                nn.Linear(128, 64), nn.Tanh(),
                                nn.Linear(64, 30))
        self.w2 = nn.Sequential(nn.Linear(62, 128), nn.Tanh(),
                                nn.Linear(128, 64), nn.Tanh(),
                                nn.Linear(64, 30))
        self.res = nn.Sequential(
            nn.Conv2d(1, 4, 5, padding=2), nn.Tanh(),
            nn.Conv2d(4, 16, 5, padding=2), nn.Tanh(),
            nn.Conv2d(16, 4, 5, padding=2), nn.Tanh(),
            nn.Conv2d(4, 1, 5, padding=2), nn.Tanh())


def _sklearn_interp(itp_net, values, src_pts, query, mode):
    """values [B, N], src_pts [B, N, 2], query [B, Q, 2] -> [B, Q]."""
    knn = NearestNeighbors(n_neighbors=30)
    outs = []
    for b in range(values.shape[0]):
        knn.fit(src_pts[b].detach().cpu().numpy())
        _, idx = knn.kneighbors(query[b].detach().cpu().numpy())
        idx_t = torch.as_tensor(idx)
        nb_pts = src_pts[b][idx_t]                      # [Q, 30, 2]
        nb_val = values[b][idx_t]                       # [Q, 30]
        feats = torch.cat([nb_pts, query[b][:, None, :]], dim=1).reshape(
            query.shape[1], -1)
        w = (itp_net.w1 if mode == "1" else itp_net.w2)(feats)
        outs.append((w * nb_val).sum(-1))
    return torch.stack(outs)


def _knn_edges(pts_np, k):
    knn = NearestNeighbors(n_neighbors=k + 1)
    knn.fit(pts_np)
    _, idx = knn.kneighbors(pts_np)
    dst = np.repeat(np.arange(len(pts_np)), k)
    src = idx[:, 1:].reshape(-1)
    return src, dst


def benchmark_reference_step(nx=48, batch=6, k=35, n_steps=3,
                             moving_mesh=True, seed=0):
    """Measure seconds per training step of the reference-equivalent path."""
    torch.manual_seed(seed)
    n = nx * nx
    tw = 1
    dt = 1.0

    solver = Solver(tw=tw)
    solver_b = Solver(tw=tw) if moving_mesh else None
    dmm = DMMTorch(nx) if moving_mesh else None
    itp = ItpTorch(nx) if moving_mesh else None
    params = list(solver.parameters())
    if moving_mesh:
        params += list(solver_b.parameters()) + list(itp.parameters())
    opt = torch.optim.AdamW(params, lr=1e-3)

    xs = np.linspace(0, 1, nx, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    grid = torch.as_tensor(np.stack([gx.ravel(), gy.ravel()], -1))

    data = torch.randn(batch, tw, nx, nx)
    labels = torch.randn(batch, tw, nx, nx)

    def one_step():
        opt.zero_grad()
        u = data.reshape(batch, tw, n).transpose(1, 2)      # [B, N, tw]
        y = labels.reshape(batch, tw, n).transpose(1, 2)

        meshes = []
        if moving_mesh:
            # DMM mesh movement with autograd (per reference create_graph)
            xi = grid[None].expand(batch, -1, -1).reshape(-1, 2).clone()
            xi.requires_grad_(True)
            phi = dmm(data[:, -1], xi)
            g = torch.autograd.grad(phi.sum(), xi, create_graph=False)[0]
            mesh = (xi + g).detach().reshape(batch, n, 2)
            # interpolate data + labels onto the moved mesh (sklearn kNN)
            src_pts = grid[None].expand(batch, -1, -1)
            u_m = _sklearn_interp(itp, u[..., 0], src_pts, mesh, "1")[..., None]
            y_m = _sklearn_interp(itp, y[..., 0], src_pts, mesh, "1")[..., None]
            meshes.append(mesh)

        losses = []
        graphs = []
        if moving_mesh:
            graphs.append((u_m, meshes[0], True))
        graphs.append((u, grid[None].expand(batch, -1, -1), False))

        preds = []
        for vals, mesh_b, is_moved in graphs:
            # one big graph per batch, kNN edges rebuilt EVERY step
            big_pts = mesh_b.reshape(-1, 2)
            src, dst = _knn_edges(big_pts.detach().cpu().numpy(), k)
            src_t, dst_t = torch.as_tensor(src), torch.as_tensor(dst)
            pos = torch.cat([torch.ones(batch * n, 1), big_pts], dim=-1)
            net = solver_b if is_moved else solver
            pred = net(vals.reshape(-1, tw), pos, src_t, dst_t, dt)
            if is_moved:
                back = _sklearn_interp(itp, pred.reshape(batch, n),
                                       mesh_b, grid[None].expand(batch, -1, -1),
                                       "2")
                res = itp.res(data.reshape(-1, 1, nx, nx)).reshape(batch, n)
                pred = (back + res).reshape(-1, tw)
            preds.append(pred)

        total = sum(preds) if len(preds) > 1 else preds[0]
        loss = torch.mean((total - y.reshape(-1, tw)) ** 2)
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    return (time.perf_counter() - t0) / n_steps


if __name__ == "__main__":
    sec = benchmark_reference_step(n_steps=2)
    print(f"reference-equivalent torch CPU step: {sec:.3f} s/step")
