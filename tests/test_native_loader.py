"""Native C++ loader tests: npy parsing, window semantics, prefetch ring."""

import numpy as np
import pytest

from mmpde_tpu.data.native_loader import NativeWindowLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds") / "traj.npy")
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(10, 9, 6, 6)).astype(np.float32)
    np.save(path, arr)
    return path, arr


def test_windows_match_numpy_oracle(dataset):
    path, arr = dataset
    tw = 2
    loader = NativeWindowLoader(path, batch_size=4, time_window=tw,
                                traj_lo=0, traj_hi=8, seed=42)
    try:
        assert loader.shape == (10, 9, 6, 6)
        for _ in range(20):
            data, labels, steps = loader.next()
            assert data.shape == (4, tw, 6, 6)
            for i, s in enumerate(steps):
                assert tw <= s <= 9 - tw
                # history = [s - tw, s), labels = [s, s + tw)
                found = False
                for t in range(8):  # locate the trajectory by content
                    if np.allclose(arr[t, s - tw:s], data[i]):
                        np.testing.assert_allclose(arr[t, s:s + tw],
                                                   labels[i])
                        found = True
                        break
                assert found, "window does not match any trajectory"
    finally:
        loader.close()


def test_trajectory_range_respected(dataset):
    path, arr = dataset
    loader = NativeWindowLoader(path, batch_size=8, time_window=1,
                                traj_lo=8, traj_hi=10, seed=1)
    try:
        for _ in range(10):
            data, labels, steps = loader.next()
            for i, s in enumerate(steps):
                ok = any(np.allclose(arr[t, s - 1:s], data[i])
                         for t in (8, 9))
                assert ok, "sampled outside [traj_lo, traj_hi)"
    finally:
        loader.close()


def test_unroll_shrink_limits_steps(dataset):
    path, arr = dataset
    loader = NativeWindowLoader(path, batch_size=16, time_window=1,
                                traj_lo=0, traj_hi=10, seed=2)
    try:
        loader.set_unroll_shrink(6)
        # drain the prefetch ring first (old range may linger)
        for _ in range(6):
            _, _, steps = loader.next()
        seen = []
        for _ in range(10):
            _, _, steps = loader.next()
            seen.extend(steps.tolist())
        # nt=9, tw=1, shrink=6 => last valid start = 9 - 1 - 6 = 2,
        # inclusive (matches train.random_start_steps) => steps in {1, 2}
        assert max(seen) <= 2, seen
        assert 2 in seen, "last valid start step never sampled"
    finally:
        loader.close()


def test_native_loader_with_windowed_train_step(dataset, tmp_path):
    """End-to-end: native loader batches drive the window_input GNN step."""
    import jax
    import jax.numpy as jnp
    from mmpde_tpu.models import MPSolver2D
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    path, arr = dataset  # [10, 9, 6, 6]
    pde = burgers(grid_size=(9, 6, 6), tmax=8.0)
    pde.movingmesh_grid_size = (9, 6, 6)
    pde.ori_grid_size = (9, 6, 6)
    pipe = GraphPipeline(pde, neighbors=3, time_window=1, t_resolution=9)
    model = MPSolver2D(time_window=1, hidden_features=16, hidden_layer=1,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((4, pipe.n_nodes, 1))
    ps = jnp.ones((4, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    opt = T.make_optimizer(1e-3)
    params = {"model": v["params"]}
    state = T.TrainState(params=params,
                         batch_stats={"model": v["batch_stats"]},
                         opt_state=opt.init(params),
                         step=jnp.zeros((), jnp.int32))
    step_fn = T.make_gnn_step(pipe, model, opt, train=True,
                              window_input=True)
    loader = NativeWindowLoader(path, batch_size=4, time_window=1,
                                traj_lo=0, traj_hi=8, seed=0)
    try:
        rng = np.random.default_rng(0)
        state, loss = T.train_epoch_native(rng, pipe, step_fn, state, loader,
                                           n_traj=8, max_unrolling=0,
                                           n_inner=2)
        assert np.isfinite(loss)
    finally:
        loader.close()


def test_native_loader_cy_windowed_train_step(tmp_path):
    """Cylinder (unstructured, [n, nt, nodes]) batches through the same
    native loader + window_input step — the CLI wiring mmpde.py uses now
    that --native_loader is experiment-agnostic (the streamed cache holds
    the ALREADY-preprocessed field; spatial dims are generic)."""
    import jax
    import jax.numpy as jnp
    from mmpde_tpu.models import MPSolver2D
    from mmpde_tpu.pdes import cy
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    nt, n_nodes = 7, 40
    rng = np.random.default_rng(5)
    mesh_pts = rng.uniform(0.05, 0.95, size=(n_nodes, 2)).astype(np.float32)
    arr = rng.normal(size=(6, nt, n_nodes)).astype(np.float32)
    path = str(tmp_path / "cy_field.npy")
    np.save(path, arr)

    pde = cy(ori_grid=mesh_pts, grid_size=(nt, n_nodes))
    pipe = GraphPipeline(pde, neighbors=4, time_window=1, t_resolution=nt)
    model = MPSolver2D(time_window=1, hidden_features=16, hidden_layer=1,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((3, pipe.n_nodes, 1))
    ps = jnp.ones((3, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    opt = T.make_optimizer(1e-3)
    params = {"model": v["params"]}
    state = T.TrainState(params=params,
                         batch_stats={"model": v["batch_stats"]},
                         opt_state=opt.init(params),
                         step=jnp.zeros((), jnp.int32))
    step_fn = T.make_gnn_step(pipe, model, opt, train=True,
                              window_input=True)
    loader = NativeWindowLoader(path, batch_size=3, time_window=1,
                                traj_lo=0, traj_hi=5, seed=0)
    try:
        assert loader.spatial == (n_nodes,)
        nrng = np.random.default_rng(0)
        state, loss = T.train_epoch_native(nrng, pipe, step_fn, state,
                                           loader, n_traj=5,
                                           max_unrolling=0, n_inner=2)
        assert np.isfinite(loss)
    finally:
        loader.close()
