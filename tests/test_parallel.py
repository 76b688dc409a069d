"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmpde_tpu.models import MPSolver2D
from mmpde_tpu.ops import knn_indices, uniform_grid
from mmpde_tpu.parallel import make_mesh, replicate, shard_batch, shard_nodes


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@requires_8
def test_dp_sharded_forward_matches_single_device():
    b, k, tw = 8, 4, 1
    grid = uniform_grid(6)
    n = grid.shape[0]
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_features=32, hidden_layer=1)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)

    ref = model.apply(variables, u, pos, nbr)

    mesh = make_mesh(8)
    u_s, pos_s = shard_batch(mesh, (u, pos))
    v_r = replicate(mesh, variables)
    out = jax.jit(lambda v, a, p: model.apply(v, a, p, nbr))(v_r, u_s, pos_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-6)


@requires_8
def test_node_sharded_forward_matches_single_device():
    # 2-way dp x 4-way node sharding of the [B, N, ...] tensors
    b, k, tw = 2, 3, 1
    grid = uniform_grid(8)  # 64 nodes -> 16 per shard
    n = grid.shape[0]
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_features=32, hidden_layer=1)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)
    ref = model.apply(variables, u, pos, nbr)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    from jax.sharding import Mesh
    mesh = Mesh(devices, ("dp", "node"))
    u_s, pos_s = shard_nodes(mesh, (u, pos))
    v_r = replicate(mesh, variables)
    out = jax.jit(lambda v, a, p: model.apply(v, a, p, nbr))(v_r, u_s, pos_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-6)


@requires_8
def test_dp_gradient_psum_equivalence():
    """Sharded-batch gradients equal single-device gradients (XLA inserts
    the psum from the sharding annotations)."""
    b, k, tw = 8, 3, 1
    grid = uniform_grid(5)
    n = grid.shape[0]
    nbr = knn_indices(grid, k)
    model = MPSolver2D(time_window=tw, hidden_features=32, hidden_layer=1)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)
    variables = model.init(jax.random.PRNGKey(1), u, pos, nbr)
    y = jax.random.normal(jax.random.PRNGKey(2), (b, n, tw))

    def loss(params, u, pos, y):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          u, pos, nbr)
        return jnp.mean((out - y) ** 2)

    g_ref = jax.grad(loss)(variables["params"], u, pos, y)

    mesh = make_mesh(8)
    u_s, pos_s, y_s = shard_batch(mesh, (u, pos, y))
    p_r = replicate(mesh, variables["params"])
    g_sh = jax.jit(jax.grad(loss))(p_r, u_s, pos_s, y_s)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=1e-6)


@requires_8
def test_dp_train_epoch_matches_single_device():
    """The --dp path: a full dp-sharded train_epoch (sharded batches,
    replicated state, XLA-inserted gradient psum) produces the same epoch
    loss trajectory as the single-device epoch."""
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    nt, nx, batch = 7, 8, 8
    pde = burgers(grid_size=(nt, nx, nx), tmax=5.0)
    pipe = GraphPipeline(pde, neighbors=3, time_window=1, t_resolution=nt)
    model = MPSolver2D(time_window=1, hidden_features=16, hidden_layer=1,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((2, pipe.n_nodes, 1))
    ps = jnp.ones((2, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    params = {"model": v["params"]}
    stats = {"model": v["batch_stats"]}
    opt = T.make_optimizer(1e-3)

    def fresh_state():
        return T.TrainState(params=params, batch_stats=stats,
                            opt_state=opt.init(params),
                            step=jnp.zeros((), jnp.int32))

    u_train = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (16, nt, nx, nx)), dtype=np.float32)
    step_fn = T.make_gnn_step(pipe, model, opt, train=True)

    # single-device epoch
    rng = np.random.default_rng(7)
    state1, loss1 = T.train_epoch(rng, pipe, step_fn, fresh_state(),
                                  u_train, batch, 0, n_inner=2)

    # dp-sharded epoch: same rng stream -> identical batches
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    dp_step = lambda st, *a: step_fn(st, *shard_batch(mesh, a))  # noqa: E731
    state8, loss8 = T.train_epoch(rng, pipe, dp_step,
                                  replicate(mesh, fresh_state()),
                                  u_train, batch, 0, n_inner=2)

    assert np.isfinite(loss1) and np.isfinite(loss8)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    # Adam turns reduction-order noise in near-zero gradients into O(lr)
    # update-direction flips, so params agree in absolute terms only:
    # |diff| << cumulative update scale (4 steps x lr 1e-3)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3)


@requires_8
def test_node_sharded_train_step_matches_single_device():
    """End-to-end node-sharded solver step (SURVEY §5 node-axis sharding):
    the fused train step with a dp×node with_sharding_constraint on its
    [B, N, ...] tensors — GSPMD shards the message passing along the node
    axis and inserts the gather/psum collectives — produces the same loss
    and updated params as the unsharded step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    nt, nx, batch = 7, 8, 4
    pde = burgers(grid_size=(nt, nx, nx), tmax=5.0)
    pipe = GraphPipeline(pde, neighbors=3, time_window=1, t_resolution=nt)
    model = MPSolver2D(time_window=1, hidden_features=16, hidden_layer=1,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((2, pipe.n_nodes, 1))
    ps = jnp.ones((2, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    params = {"model": v["params"]}
    stats = {"model": v["batch_stats"]}
    opt = T.make_optimizer(1e-3)

    def fresh_state():
        return T.TrainState(params=params, batch_stats=stats,
                            opt_state=opt.init(params),
                            step=jnp.zeros((), jnp.int32))

    u_traj = jax.random.normal(jax.random.PRNGKey(1), (batch, nt, nx, nx))
    steps = jnp.asarray([1, 2, 3, 4])

    step_ref = T.make_gnn_step(pipe, model, opt, train=True)
    state1, loss1 = step_ref(fresh_state(), u_traj, steps)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "node"))
    node_sharding = NamedSharding(mesh, P("dp", "node"))
    step_sh = T.make_gnn_step(pipe, model, opt, train=True,
                              node_sharding=node_sharding)
    u_s, = shard_batch(mesh, (u_traj,))
    state8, loss8 = step_sh(replicate(mesh, fresh_state()), u_s, steps)

    assert np.isfinite(float(loss1)) and np.isfinite(float(loss8))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3)


@requires_8
def test_dp_scan_epoch_matches_single_device():
    """--dp composed with --scan_epoch (VERDICT r2 item 7): a dp-sharded
    device-resident scan epoch (batch_sharding=P('dp') inside the scan
    body, replicated state/u_all) produces the same loss trajectory as the
    single-device scan epoch — multi-chip training keeps the
    one-dispatch-per-epoch path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    nt, nx, batch = 7, 8, 8
    pde = burgers(grid_size=(nt, nx, nx), tmax=5.0)
    pipe = GraphPipeline(pde, neighbors=3, time_window=1, t_resolution=nt)
    model = MPSolver2D(time_window=1, hidden_features=16, hidden_layer=1,
                       dt=pde.dt, tmax=pde.tmax)
    us = jnp.ones((2, pipe.n_nodes, 1))
    ps = jnp.ones((2, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(0), us, ps, pipe.uniform_nbr)
    params = {"model": v["params"]}
    stats = {"model": v["batch_stats"]}
    opt = T.make_optimizer(1e-3)

    def fresh_state():
        return T.TrainState(params=params, batch_stats=stats,
                            opt_state=opt.init(params),
                            step=jnp.zeros((), jnp.int32))

    u_train = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (16, nt, nx, nx)), dtype=np.float32)
    step_fn = T.make_gnn_step(pipe, model, opt, train=True)

    # single-device scan epoch (donate=False: we reuse schedules/states)
    epoch1 = T.make_scan_epoch(step_fn, u_train, donate=False)
    rng = np.random.default_rng(11)
    state1, loss1 = T.train_epoch_scan(rng, pipe, epoch1, fresh_state(),
                                       len(u_train), batch, 0, n_inner=2)

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    epoch8 = T.make_scan_epoch(step_fn, u_train, donate=False,
                               batch_sharding=sharding)
    rng = np.random.default_rng(11)   # same rng stream -> same schedule
    state8, loss8 = T.train_epoch_scan(rng, pipe, epoch8,
                                       replicate(mesh, fresh_state()),
                                       len(u_train), batch, 0, n_inner=2)

    assert np.isfinite(loss1) and np.isfinite(loss8)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3)


@requires_8
def test_shard_map_solver_forward_matches_local():
    """MPSolver2D(node_mesh=...) — the explicit shard_map halo-gather path
    wired into the production model (VERDICT r2 item 6) — matches the dense
    single-device forward exactly."""
    from jax.sharding import Mesh

    b, k, tw = 2, 3, 1
    grid = uniform_grid(8)  # 64 nodes -> 16 per node shard
    n = grid.shape[0]
    nbr = knn_indices(grid, k)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)

    ref_model = MPSolver2D(time_window=tw, hidden_features=32, hidden_layer=2)
    variables = ref_model.init(jax.random.PRNGKey(1), u, pos, nbr)
    ref = ref_model.apply(variables, u, pos, nbr)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "node"))
    sh_model = MPSolver2D(time_window=tw, hidden_features=32, hidden_layer=2,
                          node_mesh=mesh)
    u_s, pos_s = shard_nodes(mesh, (u, pos))
    v_r = replicate(mesh, variables)
    out = jax.jit(lambda v, a, p: sh_model.apply(v, a, p, nbr))(v_r, u_s,
                                                                pos_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-6)


@requires_8
def test_node_sharding_memory_headroom():
    """The point of node-axis sharding: per-device peak residency of the
    solver forward drops with the shard count.  Compares XLA's compiled
    memory analysis (temp + argument bytes) of the node-sharded program
    against the unsharded one on a mesh ~7x the reference size."""
    from jax.sharding import Mesh

    b, k, tw, h = 1, 8, 1, 64
    grid = uniform_grid(128)          # 16,384 nodes (reference: 2,304)
    n = grid.shape[0]
    nbr = knn_indices(grid, k)
    u = jax.random.normal(jax.random.PRNGKey(0), (b, n, tw))
    pos = jnp.concatenate(
        [jnp.zeros((b, n, 1)), jnp.broadcast_to(grid[None], (b, n, 2))], -1)

    def peak_bytes(model, u_in, pos_in, variables):
        compiled = jax.jit(
            lambda v, a, p: model.apply(v, a, p, nbr)
        ).lower(variables, u_in, pos_in).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            pytest.skip("backend lacks memory_analysis")
        return ma.temp_size_in_bytes

    model1 = MPSolver2D(time_window=tw, hidden_features=h, hidden_layer=1)
    variables = model1.init(jax.random.PRNGKey(1), u, pos, nbr)
    bytes1 = peak_bytes(model1, u, pos, variables)

    devices = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devices, ("dp", "node"))
    model8 = MPSolver2D(time_window=tw, hidden_features=h, hidden_layer=1,
                        node_mesh=mesh)
    u_s, pos_s = shard_nodes(mesh, (u, pos))
    bytes8 = peak_bytes(model8, u_s, pos_s, replicate(mesh, variables))

    # per-device temp memory must drop by at least 3x with 8 node shards
    # (the [B, N, k, H] edge tensors dominate and shard perfectly; the
    # all-gathered H-wide table is the only replicated term)
    assert bytes8 * 3 < bytes1, (bytes1, bytes8)


@requires_8
def test_shard_map_gather_matches_local():
    from jax.sharding import Mesh
    from mmpde_tpu.parallel.node_parallel import (
        sharded_gather_nodes, sharded_segment_mean)
    from mmpde_tpu.models.gnn import gather_nodes

    b, n, k, f = 2, 64, 5, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, f))
    nbr = jax.random.randint(jax.random.PRNGKey(1), (b, n, k), 0, n)
    ref = gather_nodes(x, nbr)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "node"))
    from mmpde_tpu.parallel import shard_nodes
    x_s, = shard_nodes(mesh, (x,))
    nbr_s, = shard_nodes(mesh, (nbr,))
    out = sharded_gather_nodes(mesh, x_s, nbr_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    m = sharded_segment_mean(mesh, out)
    np.testing.assert_allclose(np.asarray(m),
                               np.asarray(jnp.mean(ref, axis=2)), rtol=1e-6)
