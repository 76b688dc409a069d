"""Device-resident scan-epoch driver: equivalence with the per-batch loop.

make_scan_epoch / train_epoch_scan must reproduce the per-batch
train_epoch exactly (same host RNG draw order -> same schedule -> same
updates), and test_timestep_losses_scan must reproduce
test_timestep_losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast  # per-commit quick lane (see pytest.ini)

from mmpde_tpu.models import MPSolver2D
from mmpde_tpu.pdes import burgers
from mmpde_tpu.solver.data import GraphPipeline
from mmpde_tpu.solver import train as T

NT, NX = 11, 12


@pytest.fixture(scope="module")
def setup():
    pde = burgers(grid_size=(NT, NX, NX), tmax=10.0)
    pde.movingmesh_grid_size = (NT, NX, NX)
    pde.ori_grid_size = (NT, NX, NX)
    pipe = GraphPipeline(pde, neighbors=4, time_window=1, t_resolution=NT)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(8, NT, 3, 3)).astype(np.float32)
    u = np.asarray(jax.image.resize(jnp.asarray(u), (8, NT, NX, NX), "cubic"))

    model = MPSolver2D(time_window=1, hidden_features=32, hidden_layer=2,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((2, pipe.n_nodes, 1))
    ps = jnp.ones((2, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    opt = T.make_optimizer(1e-3)

    def fresh_state():
        params = {"model": v["params"]}
        return T.TrainState(params=params,
                            batch_stats={"model": v["batch_stats"]},
                            opt_state=opt.init(params),
                            step=jnp.zeros((), jnp.int32))

    return pde, pipe, u, model, opt, fresh_state


def test_scan_epoch_matches_loop_one_step(setup):
    """One full batch = one step: the scanned update must equal the
    per-batch update (same schedule, same math; only compile-level
    fusion differs)."""
    pde, pipe, u, model, opt, fresh_state = setup
    step_fn = T.make_gnn_step(pipe, model, opt, train=True)

    s_loop, loss_loop = T.train_epoch(
        np.random.default_rng(7), pipe, step_fn, fresh_state(), u,
        batch_size=8, max_unrolling=0, n_inner=1)

    epoch_fn = T.make_scan_epoch(step_fn, u, donate=False)
    s_scan, loss_scan = T.train_epoch_scan(
        np.random.default_rng(7), pipe, epoch_fn, fresh_state(),
        n_traj=len(u), batch_size=8, max_unrolling=0, n_inner=1)

    np.testing.assert_allclose(loss_loop, loss_scan, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-3, atol=1e-6),
        s_loop.params, s_scan.params)
    assert int(s_scan.step) == int(s_loop.step) == 1


def test_scan_epoch_multi_step_tracks_loop(setup):
    """Multiple steps: low-bit compile differences get amplified by
    discrete kNN tie-breaks, so exact param equality is NOT expected —
    the schedules are identical and the mean losses must agree."""
    pde, pipe, u, model, opt, fresh_state = setup
    step_fn = T.make_gnn_step(pipe, model, opt, train=True)

    s_loop, loss_loop = T.train_epoch(
        np.random.default_rng(7), pipe, step_fn, fresh_state(), u,
        batch_size=4, max_unrolling=0, n_inner=3)

    epoch_fn = T.make_scan_epoch(step_fn, u, donate=False)
    s_scan, loss_scan = T.train_epoch_scan(
        np.random.default_rng(7), pipe, epoch_fn, fresh_state(),
        n_traj=len(u), batch_size=4, max_unrolling=0, n_inner=3)

    assert np.isfinite(loss_loop) and np.isfinite(loss_scan)
    np.testing.assert_allclose(loss_loop, loss_scan, rtol=1e-2)
    assert int(s_scan.step) == int(s_loop.step) == 3 * (len(u) // 4)


def test_scan_eval_matches_loop(setup):
    pde, pipe, u, model, opt, fresh_state = setup
    state = fresh_state()
    eval_fn = T.make_gnn_step(pipe, model, None, train=False)

    ref = T.test_timestep_losses(pipe, eval_fn, state, u, batch_size=4)
    eval_all = T.make_scan_eval(eval_fn, u)
    got = T.test_timestep_losses_scan(pipe, eval_all, state, len(u),
                                      batch_size=4)
    np.testing.assert_allclose(ref, got, rtol=1e-5)


def test_scan_epoch_pushforward_runs(setup):
    pde, pipe, u, model, opt, fresh_state = setup
    step_fn = T.make_gnn_step(pipe, model, opt, train=True, pushforward=True)
    epoch_fn = T.make_scan_epoch(step_fn, u, pushforward=True,
                                 donate=False)
    state, loss = T.train_epoch_scan(
        np.random.default_rng(3), pipe, epoch_fn, fresh_state(),
        n_traj=len(u), batch_size=4, max_unrolling=1, n_inner=2)
    assert np.isfinite(loss)
