"""Model-layer tests: shapes, derivative correctness, mutable batch stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from mmpde_tpu.models import DenseNet, ConvBranchNet, DMM, MPSolver2D, ItpNet, BaseCNN
from mmpde_tpu.ops import knn_indices, uniform_grid
from mmpde_tpu.dmm import branch_features, phi_derivatives, moved_mesh


def test_densenet_shapes_and_penultimate():
    net = DenseNet([2, 32, 512])
    x = jnp.ones((5, 2))
    params = net.init(jax.random.PRNGKey(0), x)
    out, second = net.apply(params, x)
    assert out.shape == (5, 512)
    assert second.shape == (5, 32)  # post-tanh activation of last hidden
    assert np.all(np.abs(np.asarray(second)) <= 1.0)


def test_conv_branch_output_dim():
    net = ConvBranchNet(latent_dim=512)
    u = jnp.ones((3, 48, 48))
    params = net.init(jax.random.PRNGKey(0), u)
    out = net.apply(params, u)
    assert out.shape == (3, 512)
    # stride-2 twice: 48 -> 24 -> 12, so fc2 kernel is 144 x 1024
    assert params["params"]["fc2"]["kernel"].shape == (144, 1024)


@pytest.fixture(scope="module")
def dmm_array():
    model = DMM(mode="array", branch_layer=7, trunk_layer=(2, 32, 64),
                out_layer=(128, 64, 1))
    u = jnp.ones((2, 16, 16))
    xi = jnp.zeros((2, 3, 2))
    variables = model.init(jax.random.PRNGKey(0), u, xi)
    return model, variables


def test_dmm_array_forward(dmm_array):
    model, variables = dmm_array
    u = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16))
    xi = jax.random.uniform(jax.random.PRNGKey(2), (2, 5, 2))
    phi = model.apply(variables, u, xi)
    assert phi.shape == (2, 5)
    phi2, second = model.apply(variables, u, xi, rf=True)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2), rtol=1e-6)
    assert second.shape == (2, 5, 64)


def test_dmm_phi_derivatives_match_finite_difference(dmm_array):
    model, variables = dmm_array
    u = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16))
    feat = branch_features(model, variables, u)
    xi = jnp.asarray([[[0.4, 0.6]]])
    phi, grad, hess = phi_derivatives(model, variables, feat, xi, order=2)
    assert phi.shape == (1, 1) and grad.shape == (1, 1, 2)
    assert hess.shape == (1, 1, 2, 2)
    # Hessian symmetry (f32 rounding leaves ~1e-3 absolute noise; exact to
    # 2e-15 in f64 — verified separately)
    np.testing.assert_allclose(np.asarray(hess[0, 0, 0, 1]),
                               np.asarray(hess[0, 0, 1, 0]), atol=5e-3)
    # finite differences of phi
    eps = 1e-3
    def phi_at(x, y):
        return float(model.apply(variables, u, jnp.asarray([[[x, y]]]))[0, 0])
    fdx = (phi_at(0.4 + eps, 0.6) - phi_at(0.4 - eps, 0.6)) / (2 * eps)
    fdy = (phi_at(0.4, 0.6 + eps) - phi_at(0.4, 0.6 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(grad[0, 0, 0]), fdx, rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(float(grad[0, 0, 1]), fdy, rtol=1e-2, atol=1e-4)
    # second-difference FD needs a large eps in f32 (rounding ~ 2 ulp/eps^2)
    eps2 = 3e-2
    fdxx = (phi_at(0.4 + eps2, 0.6) - 2 * phi_at(0.4, 0.6)
            + phi_at(0.4 - eps2, 0.6)) / eps2**2
    np.testing.assert_allclose(float(hess[0, 0, 0, 0]), fdxx, rtol=1e-1,
                               atol=5e-3)


def test_moved_mesh_is_gradient_field(dmm_array):
    model, variables = dmm_array
    u = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16))
    xi = jax.random.uniform(jax.random.PRNGKey(5), (1, 4, 2))
    x = moved_mesh(model, variables, u, xi)
    assert x.shape == (1, 4, 2)
    feat = branch_features(model, variables, u)
    _, grad = phi_derivatives(model, variables, feat, xi, order=1)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xi + grad), rtol=1e-6)


def test_dmm_graph_mode_forward():
    n, k = 36, 5
    grid = uniform_grid(6)
    nbr = knn_indices(grid, k)
    model = DMM(mode="graph", branch_layer=(4, 2), trunk_layer=(2, 16, 32),
                out_layer=(64, 32, 1), n_nodes=n)
    u = jax.random.normal(jax.random.PRNGKey(0), (2, n))
    xi = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 2))
    variables = model.init(jax.random.PRNGKey(2), u, xi, grid, nbr)
    assert "batch_stats" in variables
    phi = model.apply(variables, u, xi, grid, nbr)
    assert phi.shape == (2, 3)
    # training mode collects batch statistics
    phi_t, new_state = model.apply(variables, u, xi, grid, nbr, True,
                                   mutable=["batch_stats"])
    assert phi_t.shape == (2, 3)
    leaf0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    leaf1 = jax.tree_util.tree_leaves(new_state["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_mpsolver_forward_and_batchnorm():
    b, n, k, tw = 2, 25, 4, 1
    grid = uniform_grid(5)
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_features=128, hidden_layer=2,
                       dt=1.0, tmax=30.0)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.ones((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)
    out = model.apply(variables, u, pos, nbr)
    assert out.shape == (b, n, tw)
    out_t, state = model.apply(variables, u, pos, nbr, True,
                               mutable=["batch_stats"])
    assert out_t.shape == (b, n, tw)


def test_mpsolver_batch_independence():
    # dense [B, N, k] message passing must not leak across batch entries
    b, n, k, tw = 2, 16, 3, 1
    grid = uniform_grid(4)
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_layer=1)
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)
    out = model.apply(variables, u, pos, nbr)
    u2 = u.at[1].set(jax.random.normal(jax.random.PRNGKey(2), (n, tw)))
    out2 = model.apply(variables, u2, pos, nbr)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               rtol=1e-5)


@pytest.mark.fast
def test_itpnet_modes():
    model = ItpNet(ori_nx=8, ori_ny=8)
    nb = jnp.ones((2, 10, 30, 2))
    q = jnp.ones((2, 10, 1, 2))
    variables = model.init(jax.random.PRNGKey(0), nb, q, "1")
    w1 = model.apply(variables, nb, q, "1")
    assert w1.shape == (2, 10, 30)
    # mode '2' needs its own params — init with both modes
    model2 = ItpNet(ori_nx=8, ori_ny=8)
    v2 = model2.init(jax.random.PRNGKey(0), nb, q, "2")
    w2 = model2.apply(v2, nb, q, "2")
    assert w2.shape == (2, 10, 30)
    # res_cut grid variant
    data = jnp.ones((2, 1, 8, 8))
    v3 = model.init(jax.random.PRNGKey(0), None, None, "res_cut", data)
    out = model.apply(v3, None, None, "res_cut", data)
    assert out.shape == (2, 1, 8, 8)
    # res_cut mesh variant
    mesh_model = ItpNet(ori_nx=64, ori_ny=None)
    dm = jnp.ones((2, 64))
    v4 = mesh_model.init(jax.random.PRNGKey(0), None, None, "res_cut", dm)
    outm = mesh_model.apply(v4, None, None, "res_cut", dm)
    assert outm.shape == (2, 64)


def test_basecnn_residual_form():
    model = BaseCNN(time_window=1, hidden_channels=8, dt=1.0)
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 12, 12))
    variables = model.init(jax.random.PRNGKey(1), u)
    out = model.apply(variables, u)
    assert out.shape == (2, 12, 12)  # squeezed like reference


def test_basecnn3d_shape():
    from mmpde_tpu.models import BaseCNN3d
    model = BaseCNN3d(time_window=1, hidden_channels=4, dt=1.0)
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 6, 6, 6))
    v = model.init(jax.random.PRNGKey(1), u)
    out = model.apply(v, u)
    assert out.shape == (2, 6, 6, 6)


@pytest.mark.fast
def test_gnn_factored_message_matches_concat():
    """The transform-then-gather message must equal the direct
    Dense-over-concat formulation (they share the same kernel)."""
    from mmpde_tpu.models.gnn import GNNLayer, gather_nodes
    b, n, k, h_dim, tw = 2, 10, 3, 8, 1
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (b, n, h_dim))
    u = jax.random.normal(jax.random.PRNGKey(1), (b, n, tw))
    px = jax.random.normal(jax.random.PRNGKey(2), (b, n, 1))
    py = jax.random.normal(jax.random.PRNGKey(3), (b, n, 1))
    var = jax.random.normal(jax.random.PRNGKey(4), (b, n, 1))
    nbr = jax.random.randint(jax.random.PRNGKey(5), (b, n, k), 0, n)

    layer = GNNLayer(h_dim)
    v = layer.init(jax.random.PRNGKey(6), h, u, px, py, var, nbr, False)
    kern = v["params"]["message_net_1"]["kernel"]
    bias = v["params"]["message_net_1"]["bias"]

    # direct concat oracle for the first Dense of the message net
    h_j = gather_nodes(h, nbr)
    u_j = gather_nodes(u, nbr)
    px_j = gather_nodes(px, nbr)
    py_j = gather_nodes(py, nbr)
    exp = lambda a: jnp.broadcast_to(a[:, :, None, :],
                                     a.shape[:2] + (k,) + a.shape[-1:])
    concat = jnp.concatenate([exp(h), h_j, exp(u) - u_j, exp(px) - px_j,
                              exp(py) - py_j, exp(var)], axis=-1)
    oracle_pre = concat @ kern + bias

    # recover the factored pre-activation from the layer by monkey-running
    # its algebra
    zh = jnp.zeros_like(h)
    zv = jnp.zeros_like(var)
    a_node = jnp.concatenate([h, zh, u, px, py, var], -1) @ kern + bias
    s_node = jnp.concatenate([zh, h, -u, -px, -py, zv], -1) @ kern
    factored_pre = a_node[:, :, None, :] + gather_nodes(s_node, nbr)
    np.testing.assert_allclose(np.asarray(factored_pre),
                               np.asarray(oracle_pre), rtol=1e-4, atol=1e-5)


def test_gnn_bf16_edge_compute_close_to_f32(monkeypatch):
    import os
    b, n, k, tw = 2, 25, 4, 1
    grid = uniform_grid(5)
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_features=128, hidden_layer=2)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)
    ref = model.apply(variables, u, pos, nbr)
    monkeypatch.setenv("MMPDE_BF16", "1")
    # env is read at trace time; fresh apply retraces
    out = model.apply(variables, u, pos, nbr)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    err = float(jnp.max(jnp.abs(out - ref))) / scale
    assert err < 0.05, err
