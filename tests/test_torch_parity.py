"""Cross-implementation numerical parity vs the reference's torch math.

The reference stack (torch_geometric/torch_cluster) is not installable here,
so each test re-implements the reference module's forward in PLAIN torch,
faithful to the cited reference code (same layer stack, same activation
placement, same aggregation), copies its weights into the corresponding
mmpde_tpu flax module, and asserts forward agreement on random inputs.

This is the guard SURVEY.md §4 calls "numerical parity": it catches the
class of silent divergence a jax-vs-jax test cannot (e.g. the
grid-indexing transpose of DIVERGENCES.md §1, activation misplacement,
factored-message algebra errors, conv layout transposes).

Reference files re-implemented here:
  gnn_2d.py:19-141        (GNN_Layer_FS_2D / MP_PDE_Solver_2D)
  mesh/dmm_model.py:9-219 (DenseNet / ConvNet / DMM array+graph)
  interpolate.py:5-99     (ItpNet, 3 modes)
  models_cnn.py:8-83      (BaseCNN)
  mesh/dmm_utils.py:233-267 (softmax-IDW interpolate / interpolate_tri)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ATOL = 2e-4
RTOL = 2e-4


def j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def lin_kernel(linear):          # torch Linear [out, in] -> flax [in, out]
    return j(linear.weight).T


def conv2d_kernel(conv):         # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return jnp.transpose(j(conv.weight), (2, 3, 1, 0))


def conv1d_kernel(conv):         # torch [out, in, k] -> flax [k, in, out]
    return jnp.transpose(j(conv.weight), (2, 1, 0))


def bn_params(bn):
    """(params, stats) of a torch BatchNorm with randomized running stats."""
    with torch.no_grad():
        bn.running_mean.normal_(0.0, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0.0, 0.2)
    return ({"scale": j(bn.weight), "bias": j(bn.bias)},
            {"mean": j(bn.running_mean), "var": j(bn.running_var)})


# --------------------------------------------------------------- GNN solver


class TorchGNNLayer(tnn.Module):
    """reference gnn_2d.py:19-69 with plain-index mean aggregation."""

    def __init__(self, h, tw, n_vars=1):
        super().__init__()
        self.m1 = tnn.Linear(2 * h + tw + 2 + n_vars, h)
        self.m2 = tnn.Linear(h, h)
        self.u1 = tnn.Linear(h + h + n_vars, h)
        self.u2 = tnn.Linear(h, h)
        self.norm = tnn.BatchNorm1d(h)

    def forward(self, h, u, px, py, var, src, dst, act):
        msg = act(self.m2(act(self.m1(torch.cat(
            [h[dst], h[src], u[dst] - u[src], px[dst] - px[src],
             py[dst] - py[src], var[dst]], dim=-1)))))
        n = h.shape[0]
        agg = torch.zeros(n, msg.shape[-1]).index_add_(0, dst, msg)
        deg = torch.zeros(n).index_add_(0, dst, torch.ones(len(dst)))
        agg = agg / deg.clamp(min=1.0)[:, None]
        upd = act(self.u2(act(self.u1(torch.cat([h, agg, var], dim=-1)))))
        return self.norm(h + upd)


class TorchSolver(tnn.Module):
    """reference MP_PDE_Solver_2D (gnn_2d.py:72-141)."""

    def __init__(self, tw, h, layers):
        super().__init__()
        self.emb0 = tnn.Linear(tw + 3, h)
        self.embn0 = tnn.BatchNorm1d(h)
        self.emb1 = tnn.Linear(h, h)
        self.embn1 = tnn.BatchNorm1d(h)
        self.layers = tnn.ModuleList(TorchGNNLayer(h, tw)
                                     for _ in range(layers))
        self.dec0 = tnn.Conv1d(1, 4, 16, stride=3)
        self.dec1 = tnn.Conv1d(4, 8, 12, stride=3)
        self.dec2 = tnn.Conv1d(8, 1, 8, stride=2)
        self.tw = tw

    def forward(self, u, pos, src, dst, dt, lx, ly, tmax):
        px = pos[:, 1:2] / lx
        py = pos[:, 2:3] / ly
        var = pos[:, 0:1] / tmax
        h = self.embn1(self.emb1(torch.relu(self.embn0(
            self.emb0(torch.cat([u, px, py, var], dim=-1))))))
        for lay in self.layers:
            h = lay(h, u, px, py, var, src, dst, torch.relu)
        x = torch.relu(self.dec0(h[:, None, :]))
        x = torch.relu(self.dec1(x))
        diff = self.dec2(x).squeeze(1)
        dts = torch.cumsum(torch.full((1, self.tw), dt * 0.1), 1)
        return dts * diff


def solver_params_from_torch(tm):
    """torch TorchSolver -> (params, batch_stats) for MPSolver2D."""
    en0_p, en0_s = bn_params(tm.embn0)
    en1_p, en1_s = bn_params(tm.embn1)
    layer_p = {"message_net_1": [], "message_net_2": [],
               "update_net_1": [], "update_net_2": []}
    layer_norm_p, layer_norm_s = [], []
    for lay in tm.layers:
        layer_p["message_net_1"].append((lin_kernel(lay.m1), j(lay.m1.bias)))
        layer_p["message_net_2"].append((lin_kernel(lay.m2), j(lay.m2.bias)))
        layer_p["update_net_1"].append((lin_kernel(lay.u1), j(lay.u1.bias)))
        layer_p["update_net_2"].append((lin_kernel(lay.u2), j(lay.u2.bias)))
        p, s = bn_params(lay.norm)
        layer_norm_p.append(p)
        layer_norm_s.append(s)

    def stack(pairs):
        return {"kernel": jnp.stack([k for k, _ in pairs]),
                "bias": jnp.stack([b for _, b in pairs])}

    params = {
        "embed_0": {"kernel": lin_kernel(tm.emb0), "bias": j(tm.emb0.bias)},
        "embed_1": {"kernel": lin_kernel(tm.emb1), "bias": j(tm.emb1.bias)},
        "embed_norm_0": {"BatchNorm_0": en0_p},
        "embed_norm_1": {"BatchNorm_0": en1_p},
        "gnn_layers": {"layer": {
            **{k: stack(v) for k, v in layer_p.items()},
            "norm": {"BatchNorm_0": {
                "scale": jnp.stack([p["scale"] for p in layer_norm_p]),
                "bias": jnp.stack([p["bias"] for p in layer_norm_p])}},
        }},
        "dec_0": {"kernel": conv1d_kernel(tm.dec0), "bias": j(tm.dec0.bias)},
        "dec_1": {"kernel": conv1d_kernel(tm.dec1), "bias": j(tm.dec1.bias)},
        "dec_2": {"kernel": conv1d_kernel(tm.dec2), "bias": j(tm.dec2.bias)},
    }
    stats = {
        "embed_norm_0": {"BatchNorm_0": en0_s},
        "embed_norm_1": {"BatchNorm_0": en1_s},
        "gnn_layers": {"layer": {"norm": {"BatchNorm_0": {
            "mean": jnp.stack([s["mean"] for s in layer_norm_s]),
            "var": jnp.stack([s["var"] for s in layer_norm_s])}}}},
    }
    return params, stats


def test_gnn_solver_forward_parity():
    """MPSolver2D ≡ reference MP_PDE_Solver_2D (gnn_2d.py:72-141), incl. the
    factored message trick and the scanned layer stack."""
    import os
    os.environ["MMPDE_BF16"] = "0"  # parity wants f32 end to end
    from mmpde_tpu.models import MPSolver2D

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, K, H, L, TW = 60, 5, 128, 3, 1
    dt, lx, ly, tmax = 0.25, 1.0, 1.0, 2.0

    tm = TorchSolver(TW, H, L).eval()
    params, stats = solver_params_from_torch(tm)

    # shared random graph: node i's neighbors nbr[i] (j -> i edges)
    nbr = np.stack([rng.choice(np.delete(np.arange(N), i), K, replace=False)
                    for i in range(N)]).astype(np.int32)
    u = rng.normal(size=(N, TW)).astype(np.float32)
    pos = rng.uniform(size=(N, 3)).astype(np.float32)

    dst = torch.as_tensor(np.repeat(np.arange(N), K))
    src = torch.as_tensor(nbr.reshape(-1).astype(np.int64))
    with torch.no_grad():
        ref = tm(torch.as_tensor(u), torch.as_tensor(pos), src, dst,
                 dt, lx, ly, tmax).numpy()

    model = MPSolver2D(time_window=TW, hidden_features=H, hidden_layer=L,
                       dt=dt, lx=lx, ly=ly, tmax=tmax)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(u)[None], jnp.asarray(pos)[None],
                      jnp.asarray(nbr), False)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=ATOL, rtol=RTOL)


# --------------------------------------------------------------- DMM array


class TorchDMMArray(tnn.Module):
    """reference DMM array mode (mesh/dmm_model.py:48-81, 145-194)."""

    def __init__(self, s, latent):
        super().__init__()
        self.c0 = tnn.Conv2d(1, 8, 5, stride=2, padding=2)
        self.c1 = tnn.Conv2d(8, 16, 5, padding=2)
        self.c2 = tnn.Conv2d(16, 8, 5, padding=2)
        self.c3 = tnn.Conv2d(8, 1, 5, stride=2, padding=2)
        self.fc2 = tnn.Linear(int(((s + 1) / 2 + 1) / 2) ** 2, 1024)
        self.fc3 = tnn.Linear(1024, latent)
        self.trunk0 = tnn.Linear(2, 16)
        self.trunk1 = tnn.Linear(16, latent)
        self.head0 = tnn.Linear(2 * latent, 32)
        self.head1 = tnn.Linear(32, 1)

    def forward(self, u, xi):
        # ConvNet forward (mesh/dmm_model.py:64-81): tanh after layers
        # 0,1,3; residual from post-conv0 into conv2's output
        x = torch.tanh(self.c0(u[:, None]))
        skip = x
        x = torch.tanh(self.c1(x))
        x = torch.tanh(skip + self.c2(x))
        x = torch.tanh(self.c3(x))
        x = torch.tanh(self.fc2(x.flatten(1)))
        feat = self.fc3(x)                                   # [b, latent]
        q = xi.shape[0] // feat.shape[0]
        feat = feat[:, None, :].expand(-1, q, -1).reshape(-1, feat.shape[-1])
        t = self.trunk1(torch.tanh(self.trunk0(xi)))
        h = torch.tanh(self.head0(torch.cat([feat, t], dim=-1)))
        return self.head1(h)[:, 0]


def test_dmm_array_forward_parity():
    """DMM array mode ≡ reference (mesh/dmm_model.py:145-194)."""
    from mmpde_tpu.models import DMM

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    S, LAT, B, Q = 24, 64, 2, 7

    tm = TorchDMMArray(S, LAT).eval()
    u = rng.normal(size=(B, S, S)).astype(np.float32)
    xi = rng.uniform(size=(B, Q, 2)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.as_tensor(u),
                 torch.as_tensor(xi.reshape(-1, 2))).numpy().reshape(B, Q)

    params = {
        "branch": {
            "conv0": {"kernel": conv2d_kernel(tm.c0), "bias": j(tm.c0.bias)},
            "conv1": {"kernel": conv2d_kernel(tm.c1), "bias": j(tm.c1.bias)},
            "conv2": {"kernel": conv2d_kernel(tm.c2), "bias": j(tm.c2.bias)},
            "conv3": {"kernel": conv2d_kernel(tm.c3), "bias": j(tm.c3.bias)},
            "fc2": {"kernel": lin_kernel(tm.fc2), "bias": j(tm.fc2.bias)},
            "fc3": {"kernel": lin_kernel(tm.fc3), "bias": j(tm.fc3.bias)},
        },
        "trunk": {
            "dense_0": {"kernel": lin_kernel(tm.trunk0),
                        "bias": j(tm.trunk0.bias)},
            "dense_1": {"kernel": lin_kernel(tm.trunk1),
                        "bias": j(tm.trunk1.bias)},
        },
        "out_nn": {
            "dense_0": {"kernel": lin_kernel(tm.head0),
                        "bias": j(tm.head0.bias)},
            "dense_1": {"kernel": lin_kernel(tm.head1),
                        "bias": j(tm.head1.bias)},
        },
    }
    dmm = DMM(mode="array", branch_layer=7, trunk_layer=(2, 16, LAT),
              out_layer=(2 * LAT, 32, 1))
    out = dmm.apply({"params": params}, jnp.asarray(u), jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)

    # the conv branch flatten must agree: torch flattens NCHW (channel=1
    # first) while ours flattens NHWC — identical for 1 channel ONLY if the
    # spatial order matches; this assert locks that in.


# --------------------------------------------------------------- DMM graph


class TorchDMMGraph(tnn.Module):
    """reference DMM graph mode (mesh/dmm_model.py:94-142, 154-181, 196-219)."""

    def __init__(self, n_nodes, h, layers, latent):
        super().__init__()
        self.emb0 = tnn.Linear(3, h)
        self.embn0 = tnn.BatchNorm1d(h)
        self.emb1 = tnn.Linear(h, h)
        self.embn1 = tnn.BatchNorm1d(h)
        self.layers = tnn.ModuleList(TorchGNNLayer(h, 1, n_vars=0)
                                     for _ in range(layers))
        self.dec0 = tnn.Linear(h, 128)
        self.dec1 = tnn.Linear(128, 1)
        self.out0 = tnn.Linear(n_nodes, 512)
        self.out1 = tnn.Linear(512, 256)
        self.out2 = tnn.Linear(256, latent)
        self.trunk0 = tnn.Linear(2, 16)
        self.trunk1 = tnn.Linear(16, latent)
        self.head0 = tnn.Linear(2 * latent, 32)
        self.head1 = tnn.Linear(32, 1)

    def forward(self, u, grid, src, dst, xi):
        b, n = u.shape
        outs = []
        for bi in range(b):   # reference batches via one big graph; with
            # running-stats BN (eval) per-sample evaluation is identical
            x = u[bi][:, None]
            px, py = grid[:, 0:1], grid[:, 1:2]
            h = self.embn1(self.emb1(torch.tanh(self.embn0(
                self.emb0(torch.cat([x, px, py], dim=-1))))))
            var = torch.zeros(n, 0)
            for lay in self.layers:
                h = lay(h, x, px, py, var, src, dst, torch.tanh)
            dec = self.dec1(torch.tanh(self.dec0(h)))[:, 0]   # [n]
            z = torch.tanh(self.out0(dec[None]))
            z = torch.tanh(self.out1(z))
            outs.append(self.out2(z)[0])
        feat = torch.stack(outs)                              # [b, latent]
        q = xi.shape[0] // b
        feat = feat[:, None, :].expand(-1, q, -1).reshape(-1, feat.shape[-1])
        t = self.trunk1(torch.tanh(self.trunk0(xi)))
        h = torch.tanh(self.head0(torch.cat([feat, t], dim=-1)))
        return self.head1(h)[:, 0]


def test_dmm_graph_forward_parity():
    """DMM graph mode ≡ reference (mesh/dmm_model.py:196-219)."""
    import os
    os.environ["MMPDE_BF16"] = "0"
    from mmpde_tpu.models import DMM

    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    N, K, H, L, LAT, B, Q = 40, 4, 8, 2, 16, 2, 5

    tm = TorchDMMGraph(N, H, L, LAT).eval()
    grid = rng.uniform(size=(N, 2)).astype(np.float32)
    nbr = np.stack([rng.choice(np.delete(np.arange(N), i), K, replace=False)
                    for i in range(N)]).astype(np.int32)
    u = rng.normal(size=(B, N)).astype(np.float32)
    xi = rng.uniform(size=(B, Q, 2)).astype(np.float32)

    # extract/randomize ALL parameters (bn_params mutates running stats)
    # BEFORE computing the torch reference output
    en0_p, en0_s = bn_params(tm.embn0)
    en1_p, en1_s = bn_params(tm.embn1)
    mp_p = {"message_net_1": [], "message_net_2": [],
            "update_net_1": [], "update_net_2": []}
    mp_norm_p, mp_norm_s = [], []
    for lay in tm.layers:
        mp_p["message_net_1"].append((lin_kernel(lay.m1), j(lay.m1.bias)))
        mp_p["message_net_2"].append((lin_kernel(lay.m2), j(lay.m2.bias)))
        mp_p["update_net_1"].append((lin_kernel(lay.u1), j(lay.u1.bias)))
        mp_p["update_net_2"].append((lin_kernel(lay.u2), j(lay.u2.bias)))
        p, s = bn_params(lay.norm)
        mp_norm_p.append(p)
        mp_norm_s.append(s)

    def stack(pairs):
        return {"kernel": jnp.stack([k for k, _ in pairs]),
                "bias": jnp.stack([b for _, b in pairs])}

    params = {
        "branch": {
            "embed_0": {"kernel": lin_kernel(tm.emb0), "bias": j(tm.emb0.bias)},
            "embed_1": {"kernel": lin_kernel(tm.emb1), "bias": j(tm.emb1.bias)},
            "embed_norm_0": {"BatchNorm_0": en0_p},
            "embed_norm_1": {"BatchNorm_0": en1_p},
            "gnn_layers": {"layer": {
                **{k: stack(v) for k, v in mp_p.items()},
                "norm": {"BatchNorm_0": {
                    "scale": jnp.stack([p["scale"] for p in mp_norm_p]),
                    "bias": jnp.stack([p["bias"] for p in mp_norm_p])}},
            }},
            "decoding_mlp": {
                "dense_0": {"kernel": lin_kernel(tm.dec0),
                            "bias": j(tm.dec0.bias)},
                "dense_1": {"kernel": lin_kernel(tm.dec1),
                            "bias": j(tm.dec1.bias)},
            },
            "out_mlp_0": {"kernel": lin_kernel(tm.out0), "bias": j(tm.out0.bias)},
            "out_mlp_1": {"kernel": lin_kernel(tm.out1), "bias": j(tm.out1.bias)},
            "out_mlp_2": {"kernel": lin_kernel(tm.out2), "bias": j(tm.out2.bias)},
        },
        "trunk": {
            "dense_0": {"kernel": lin_kernel(tm.trunk0),
                        "bias": j(tm.trunk0.bias)},
            "dense_1": {"kernel": lin_kernel(tm.trunk1),
                        "bias": j(tm.trunk1.bias)},
        },
        "out_nn": {
            "dense_0": {"kernel": lin_kernel(tm.head0),
                        "bias": j(tm.head0.bias)},
            "dense_1": {"kernel": lin_kernel(tm.head1),
                        "bias": j(tm.head1.bias)},
        },
    }
    stats = {"branch": {
        "embed_norm_0": {"BatchNorm_0": en0_s},
        "embed_norm_1": {"BatchNorm_0": en1_s},
        "gnn_layers": {"layer": {"norm": {"BatchNorm_0": {
            "mean": jnp.stack([s["mean"] for s in mp_norm_s]),
            "var": jnp.stack([s["var"] for s in mp_norm_s])}}}},
    }}

    dst = torch.as_tensor(np.repeat(np.arange(N), K))
    src = torch.as_tensor(nbr.reshape(-1).astype(np.int64))
    with torch.no_grad():
        ref = tm(torch.as_tensor(u), torch.as_tensor(grid), src, dst,
                 torch.as_tensor(xi.reshape(-1, 2))).numpy().reshape(B, Q)
    dmm = DMM(mode="graph", branch_layer=(H, L), trunk_layer=(2, 16, LAT),
              out_layer=(2 * LAT, 32, 1), n_nodes=N)
    out = dmm.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(u), jnp.asarray(xi), jnp.asarray(grid),
                    jnp.asarray(nbr))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)


# ------------------------------------------------------------------ ItpNet


def test_itpnet_forward_parity():
    """ItpNet modes '1'/'2'/'res_cut' ≡ reference (interpolate.py:5-99)."""
    from mmpde_tpu.models import ItpNet

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    B, Q, NN = 2, 6, 30
    NX = NY = 12

    l1, l2 = [16, 8], [16, 8]
    t_w1 = tnn.Sequential(tnn.Linear(NN * 2 + 2, 16), tnn.Tanh(),
                          tnn.Linear(16, 8), tnn.Tanh(), tnn.Linear(8, NN))
    t_w2 = tnn.Sequential(tnn.Linear(NN * 2 + 2, 16), tnn.Tanh(),
                          tnn.Linear(16, 8), tnn.Tanh(), tnn.Linear(8, NN))
    # grid res_cut: Conv2d stack, Tanh after EVERY conv (interpolate.py:56-65)
    rc = [1, 4, 16, 4, 1]
    t_res = tnn.Sequential(*sum([[tnn.Conv2d(rc[i], rc[i + 1], 5, padding=2),
                                  tnn.Tanh()] for i in range(4)], []))

    itp = ItpNet(ori_nx=NX, ori_ny=NY, layers1=tuple(l1), layers2=tuple(l2),
                 res_cut_node=tuple(rc))
    params = {}
    for mode, seq in (("1", t_w1), ("2", t_w2)):
        lins = [m for m in seq if isinstance(m, tnn.Linear)]
        for jx, lin in enumerate(lins):
            params[f"w{mode}_{jx}"] = {"kernel": lin_kernel(lin),
                                       "bias": j(lin.bias)}
    convs = [m for m in t_res if isinstance(m, tnn.Conv2d)]
    for jx, cv in enumerate(convs):
        params[f"res_{jx}"] = {"kernel": conv2d_kernel(cv), "bias": j(cv.bias)}

    nb = rng.uniform(size=(B, Q, NN, 2)).astype(np.float32)
    qp = rng.uniform(size=(B, Q, 1, 2)).astype(np.float32)
    flat = np.concatenate([nb, qp], axis=-2).reshape(B, Q, -1)
    with torch.no_grad():
        ref1 = t_w1(torch.as_tensor(flat)).numpy()
        ref2 = t_w2(torch.as_tensor(flat)).numpy()
    out1 = itp.apply({"params": params}, jnp.asarray(nb), jnp.asarray(qp), "1")
    out2 = itp.apply({"params": params}, jnp.asarray(nb), jnp.asarray(qp), "2")
    np.testing.assert_allclose(np.asarray(out1), ref1, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=ATOL, rtol=RTOL)

    field = rng.normal(size=(B, 1, NX, NY)).astype(np.float32)
    with torch.no_grad():
        ref3 = t_res(torch.as_tensor(field)).numpy()
    out3 = itp.apply({"params": params}, None, None, "res_cut",
                     jnp.asarray(field))
    np.testing.assert_allclose(np.asarray(out3), ref3, atol=ATOL, rtol=RTOL)


def test_itpnet_rescut_mesh_parity():
    """ItpNet res_cut mesh variant (Linear autoencoder, interpolate.py:66-75)."""
    from mmpde_tpu.models import ItpNet

    torch.manual_seed(4)
    rng = np.random.default_rng(4)
    B, N = 3, 50
    t_down = tnn.Sequential(tnn.Linear(N, 2048), tnn.Tanh(),
                            tnn.Linear(2048, 512), tnn.Tanh(),
                            tnn.Linear(512, 2048), tnn.Tanh(),
                            tnn.Linear(2048, N))
    itp = ItpNet(ori_nx=N, ori_ny=None)
    lins = [m for m in t_down if isinstance(m, tnn.Linear)]
    params = {f"res_{jx}": {"kernel": lin_kernel(lin), "bias": j(lin.bias)}
              for jx, lin in enumerate(lins)}
    # modes 1/2 params unused here but apply() only needs res_ params
    field = rng.normal(size=(B, N)).astype(np.float32)
    with torch.no_grad():
        ref = t_down(torch.as_tensor(field)).numpy()
    out = itp.apply({"params": params}, None, None, "res_cut",
                    jnp.asarray(field))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)


# ----------------------------------------------------------------- BaseCNN


def test_basecnn_forward_parity():
    """BaseCNN ≡ reference (models_cnn.py:8-83): circular padding, ELU,
    residual skips, u_last + cumsum(dt)·delta head."""
    from mmpde_tpu.models import BaseCNN

    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    B, TW, NX, HC = 2, 3, 16, 8
    dt = 0.1

    ks = [3, 5, 5, 5, 7, 7, 7, 9]
    chans = [(TW, HC)] + [(HC, HC)] * 6 + [(HC, TW)]
    t_convs = tnn.ModuleList(
        tnn.Conv2d(i, o, k, padding=k // 2, padding_mode="circular")
        for (i, o), k in zip(chans, ks))

    def t_forward(u):
        x = torch.nn.functional.elu(t_convs[0](u))
        for cv in t_convs[1:7]:
            x = x + torch.nn.functional.elu(cv(x))
        x = t_convs[7](x)
        dts = torch.cumsum(torch.full((1, TW), dt), 1)[:, :, None, None]
        return u[:, -1:, :, :] + dts * x

    model = BaseCNN(time_window=TW, hidden_channels=HC, dt=dt)
    params = {f"conv{jx + 1}": {"kernel": conv2d_kernel(cv),
                                "bias": j(cv.bias)}
              for jx, cv in enumerate(t_convs)}

    u = rng.normal(size=(B, TW, NX, NX)).astype(np.float32)
    with torch.no_grad():
        ref = t_forward(torch.as_tensor(u)).numpy()
    out = model.apply({"params": params}, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)


# ------------------------------------------------------------- softmax-IDW


def test_softmax_idw_grid_parity():
    """idw_grid ≡ reference interpolate (mesh/dmm_utils.py:233-248) modulo
    the DOCUMENTED grid convention: the reference pairs u[i,j] with
    (x_j, y_i) (meshgrid 'xy' + row-major flatten); ours pairs u[i,j] with
    (x_i, y_j) — so the reference applied to u.T must equal ours on u."""
    import os
    os.environ["MMPDE_PALLAS"] = "0"
    from mmpde_tpu.ops.interpolate import idw_grid

    rng = np.random.default_rng(6)
    B, N, Q = 3, 12, 5
    u = rng.normal(size=(B, N, N)).astype(np.float32)
    q = rng.uniform(size=(B, Q, 2)).astype(np.float32)

    # reference formula in torch, one scalar query at a time
    xs = np.linspace(0, 1, N)
    gx, gy = np.meshgrid(xs, xs)                   # 'xy' as the reference
    grid = torch.as_tensor(np.stack([gx, gy], 0).reshape(2, -1).T
                           .astype(np.float32))   # [N^2, 2]
    ref = np.zeros((B, Q), np.float32)
    for b in range(B):
        for k in range(Q):
            d = -torch.norm(grid - torch.as_tensor(q[b, k][None]), dim=-1) * N
            w = torch.softmax(d, dim=-1)
            ref[b, k] = float((torch.as_tensor(u[b].T.reshape(-1)) * w).sum())

    out = idw_grid(jnp.asarray(u), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)


def test_softmax_idw_points_parity():
    """idw_points ≡ reference interpolate_tri (mesh/dmm_utils.py:251-267)."""
    import os
    os.environ["MMPDE_PALLAS"] = "0"
    from mmpde_tpu.ops.interpolate import idw_points

    rng = np.random.default_rng(7)
    B, N, Q = 3, 40, 6
    u = rng.normal(size=(B, N)).astype(np.float32)
    src = rng.uniform(size=(B, N, 2)).astype(np.float32)
    q = rng.uniform(size=(B, Q, 2)).astype(np.float32)

    ref = np.zeros((B, Q), np.float32)
    for b in range(B):
        for k in range(Q):
            d = -torch.norm(torch.as_tensor(src[b])
                            - torch.as_tensor(q[b, k][None]),
                            dim=-1) * float(np.sqrt(N))
            w = torch.softmax(d, dim=-1)
            ref[b, k] = float((torch.as_tensor(u[b]) * w).sum())

    out = idw_points(jnp.asarray(u), jnp.asarray(src), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=RTOL)
