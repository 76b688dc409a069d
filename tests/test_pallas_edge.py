"""Fused Pallas edge-MLP: forward + all gradients vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpde_tpu.ops.pallas_edge import edge_mlp, edge_mlp_reference


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("b,n,k,h", [(2, 64, 5, 32), (1, 96, 7, 16)])
def test_edge_mlp_forward_matches_reference(b, n, k, h):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    a = _rand(ks[0], b, n, h)
    gs = _rand(ks[1], b, n, k, h)
    w = _rand(ks[2], h, h) / np.sqrt(h)
    bias = _rand(ks[3], h) * 0.1
    out = edge_mlp(a, gs, w, bias)
    ref = edge_mlp_reference(a, gs, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_edge_mlp_gradients_match_reference():
    b, n, k, h = 2, 64, 5, 32
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    a = _rand(ks[0], b, n, h)
    gs = _rand(ks[1], b, n, k, h)
    w = _rand(ks[2], h, h) / np.sqrt(h)
    bias = _rand(ks[3], h) * 0.1
    cot = _rand(ks[4], b, n, h)

    def loss(fn, a, gs, w, bias):
        return jnp.sum(fn(a, gs, w, bias) * cot)

    g_pal = jax.grad(lambda *xs: loss(edge_mlp, *xs), argnums=(0, 1, 2, 3))(
        a, gs, w, bias)
    g_ref = jax.grad(lambda *xs: loss(edge_mlp_reference, *xs),
                     argnums=(0, 1, 2, 3))(a, gs, w, bias)
    for p, r, name in zip(g_pal, g_ref, ["da", "dgs", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_edge_mlp_bf16_inputs():
    b, n, k, h = 1, 32, 4, 16
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    a = _rand(ks[0], b, n, h).astype(jnp.bfloat16)
    gs = _rand(ks[1], b, n, k, h).astype(jnp.bfloat16)
    w = (_rand(ks[2], h, h) / np.sqrt(h)).astype(jnp.bfloat16)
    bias = (_rand(ks[3], h) * 0.1).astype(jnp.bfloat16)
    out = edge_mlp(a, gs, w, bias)
    ref = edge_mlp_reference(a, gs, w, bias)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gnn_layer_pallas_path_matches_xla(monkeypatch):
    """MMPDE_PALLAS_MP=1 must not change MPSolver2D outputs or grads."""
    from mmpde_tpu.models import MPSolver2D
    from mmpde_tpu.ops import knn_indices, uniform_grid

    grid = uniform_grid(8)
    n = grid.shape[0]
    nbr = knn_indices(grid, 5)
    model = MPSolver2D(time_window=1, hidden_features=32, hidden_layer=2)
    u = jax.random.normal(jax.random.PRNGKey(0), (2, n, 1))
    pos = jnp.concatenate(
        [jnp.zeros((2, n, 1)), jnp.broadcast_to(grid[None], (2, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)

    def loss(params, flag):
        monkeypatch.setenv("MMPDE_PALLAS_MP", flag)
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          u, pos, nbr)
        return jnp.sum(out ** 2)

    monkeypatch.setenv("MMPDE_PALLAS_MP", "0")
    ref = model.apply(variables, u, pos, nbr)
    l_ref, g_ref = jax.value_and_grad(loss)(variables["params"], "0")
    monkeypatch.setenv("MMPDE_PALLAS_MP", "1")
    out = model.apply(variables, u, pos, nbr)
    l_pal, g_pal = jax.value_and_grad(loss)(variables["params"], "1")

    # On TPU the XLA reference path runs f32 matmuls at DEFAULT precision
    # (bf16 MXU passes) while the Pallas kernel accumulates in full f32, so
    # grads differ by accumulation order/precision, not correctness.
    on_tpu = jax.default_backend() == "tpu"
    rtol_out, rtol_g = (1e-3, 1e-2) if on_tpu else (1e-5, 5e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=rtol_out, atol=1e-6)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=rtol_out)
    for p, r in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=rtol_g, atol=1e-5)
