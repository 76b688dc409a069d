"""DMM training phases: Adam step, L-BFGS runner, random-feature refit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpde_tpu.dmm import train as DT
from mmpde_tpu.dmm.loss import MALossConfig
from mmpde_tpu.models import DMM


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    s = 16
    xs = jnp.linspace(0, 1, s)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    cs = jax.random.uniform(key, (8, 2))
    all_u = jax.vmap(lambda c: jnp.tanh(8 * (X - c[0]) + 5 * (Y - c[1])))(cs)
    model = DMM(mode="array", branch_layer=7, trunk_layer=(2, 16, 32),
                out_layer=(64, 32, 1))
    variables = model.init(jax.random.PRNGKey(1), all_u[:2],
                           jnp.zeros((2, 3, 2)))
    cfg = DT.DMMTrainConfig(batch_size_x_adam=8, batch_size_u_adam=4,
                            batch_size_x_lbfgs=8, batch_size_u_lbfgs=4,
                            batch_size_x_rf=8, batch_size_u_rf=4,
                            lbfgs_inner=5, max_iter=10)
    return model, variables, all_u, cfg, MALossConfig()


def test_adam_step_decreases_loss(setup):
    model, variables, all_u, cfg, loss_cfg = setup
    opt = DT.adam_optimizer(cfg, n_inner=4)
    params = variables["params"]
    opt_state = opt.init(params)
    step = DT.make_adam_step(model, cfg, loss_cfg, opt, all_u)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(15):
        params, opt_state, terms = step(params, {}, opt_state,
                                        jax.random.fold_in(key, i))
        losses.append(float(terms.total))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_lbfgs_runner_reduces_loss(setup):
    model, variables, all_u, cfg, loss_cfg = setup
    run = DT.make_lbfgs_runner(model, cfg, loss_cfg, all_u)
    params, final = run(variables["params"], {}, jax.random.PRNGKey(3))
    assert np.isfinite(float(final))
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_rf_refit_newton_cg(setup):
    """--rf_opt_alg Newton runs the Newton-CG solver: decreases the RF
    objective and touches only the final out_nn kernel."""
    model, variables, all_u, cfg, loss_cfg = setup
    params0 = variables["params"]
    params1, rf_loss1 = DT.rf_refit(model, variables, cfg, loss_cfg,
                                    jax.random.PRNGKey(4), all_u,
                                    alg="Newton")
    assert np.isfinite(rf_loss1)
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(params1)[0])
    changed = [jax.tree_util.keystr(k) for k, v0 in flat0
               if not np.allclose(np.asarray(v0), np.asarray(flat1[k]))]
    assert changed == ["['out_nn']['dense_1']['kernel']"], changed


def test_newton_cg_solver_quadratic_oracle():
    """Newton-CG must solve a strongly convex quadratic to near-optimality
    in a handful of iterations (closed-form solution oracle)."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (12, 12))
    H = a @ a.T + 0.5 * jnp.eye(12)
    b = jax.random.normal(jax.random.fold_in(key, 1), (12,))
    fn = lambda w: 0.5 * w @ H @ w - b @ w  # noqa: E731
    solve = DT._make_newton_cg_solver(fn, n_newton=5)
    w, val = solve(jnp.zeros(12))
    w_star = jnp.linalg.solve(H, b)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_star),
                               rtol=1e-4, atol=1e-4)


def test_rf_refit_changes_final_layer_only(setup):
    model, variables, all_u, cfg, loss_cfg = setup
    params0 = variables["params"]
    params1, rf_loss = DT.rf_refit(model, variables, cfg, loss_cfg,
                                   jax.random.PRNGKey(4), all_u)
    assert np.isfinite(rf_loss)
    # only out_nn's final kernel changed
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(params1)[0])
    changed = []
    for k, v0 in flat0:
        v1 = flat1[k]
        if not np.allclose(np.asarray(v0), np.asarray(v1)):
            changed.append(jax.tree_util.keystr(k))
    assert changed == ["['out_nn']['dense_1']['kernel']"], changed
    # refit output remains usable
    phi = model.apply({"params": params1}, all_u[:2],
                      jnp.zeros((2, 3, 2)) + 0.4)
    assert np.all(np.isfinite(np.asarray(phi)))
