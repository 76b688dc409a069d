"""MM-PDE solver training CLI.

Same argument surface as the reference mmpde.py (reference: mmpde.py:322-376)
on top of the TPU-native mmpde_tpu framework: the full per-batch pipeline
(window slicing, frozen-DMM mesh movement, device kNN, learned interpolation,
two GNN branches, loss, AdamW update) runs as one jitted XLA program.

Run commands (README.md:36-54 parity):
    python mmpde.py --lr 6e-4                      # full MM-PDE, Burgers
    python mmpde.py --lr 6e-4 --moving_mesh False  # plain GNN ablation
    python mmpde.py --experiment cy --base_resolution 30,2521
    python mmpde.py --model BaseCNN                # CNN baseline
"""

import argparse
import contextlib
import os
import time
from datetime import datetime

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a PDE solver")
    parser.add_argument('--seed', default=1, type=int, help='random seed')
    parser.add_argument('--device', type=str, default='tpu',
                        help='Used device (informational; jax selects)')
    parser.add_argument('--experiment', type=str, default='burgers',
                        help='Experiment for PDE solver should be trained: [burgers, cy]')
    parser.add_argument('--model', type=str, default='GNN',
                        help='Model used as PDE solver: [GNN, BaseCNN]')
    parser.add_argument('--moving_mesh', type=eval, default=True,
                        help='Use moving mesh method')
    parser.add_argument('--itpnet_node1', type=lambda s: [int(i) for i in s.split(',')],
                        default=[128, 64], help="nodes of ItpNet1")
    parser.add_argument('--itpnet_node2', type=lambda s: [int(i) for i in s.split(',')],
                        default=[128, 64], help="nodes of ItpNet2")
    parser.add_argument('--res_cut_node', type=lambda s: [int(i) for i in s.split(',')],
                        default=[1, 4, 16, 4, 1], help="nodes of residual cut network")
    parser.add_argument('--hidden_channels', type=int, default=40,
                        help="number of hidden channels of CNN")
    parser.add_argument('--batch_size', type=int, default=6,
                        help='Number of samples in each minibatch')
    parser.add_argument('--num_epochs', type=int, default=80,
                        help='Number of training epochs')
    parser.add_argument('--lr', type=float, default=2e-3, help='Learning rate')
    parser.add_argument('--lr_decay', type=float, default=0.4,
                        help='multistep lr decay')
    parser.add_argument('--base_resolution', type=lambda s: [int(i) for i in s.split(',')],
                        default=[31, 48, 48],
                        help="PDE base resolution on which network is applied")
    parser.add_argument('--neighbors', type=int, default=35,
                        help="Neighbors to be considered in GNN solver")
    parser.add_argument('--connect_edge', type=str, default='knn',
                        help='The way to connect edge: [knn, radius]')
    parser.add_argument('--time_window', type=int, default=1,
                        help="Time steps to be considered in GNN solver")
    parser.add_argument('--unrolling', type=int, default=0,
                        help="Unrolling which proceeds with each epoch")
    parser.add_argument('--print_interval', type=int, default=2,
                        help='Interval between print statements')
    parser.add_argument('--log', type=eval, default=True,
                        help='pip the output to log file')
    # extensions beyond the reference surface
    parser.add_argument('--dmm_checkpoint', type=str, default=None,
                        help='DMM checkpoint dir (default: {experiment}_checkpoint)')
    parser.add_argument('--data_root', type=str, default='data',
                        help='dataset cache directory')
    parser.add_argument('--inner_loops', type=int, default=None,
                        help='inner loader passes per epoch (default: t_res, '
                             'as the reference)')
    parser.add_argument('--n_traj', type=int, default=100,
                        help='trajectories to generate if dataset missing')
    parser.add_argument('--resume', type=str, default=None,
                        help='checkpoint dir to resume training from '
                             '(restores params, batch stats, optimizer '
                             'state, epoch)')
    parser.add_argument('--native_loader', type=eval, default=False,
                        help='use the C++ prefetching window loader '
                             '(burgers and cy; ships 2*tw frames per '
                             'batch instead of full trajectories; GNN, '
                             'non-pushforward)')
    parser.add_argument('--residual_head', type=eval, default=False,
                        help='predict u_last + delta instead of the labels '
                             'directly (documented divergence; the '
                             'reference head omits the residual, which '
                             'hurts rollout stability)')
    parser.add_argument('--pushforward', type=eval, default=False,
                        help='execute real pushforward unrolling: when the '
                             'drawn unrolling count is > 0, feed the model '
                             'its OWN no-grad prediction as input (the '
                             'original MP-PDE trick; the reference only '
                             'shrinks the sampling range). Trains rollout '
                             'stability. Implies the python loader.')
    parser.add_argument('--input_noise', type=float, default=0.0,
                        help='training-time Gaussian noise std added to the '
                             'input window (MeshGraphNets-style rollout '
                             'stabilizer; extension, DIVERGENCES.md)')
    parser.add_argument('--train_branch_damp', type=float, default=0.0,
                        help='scale the moved-branch correction by '
                             '(1-damp) in BOTH the train and eval steps: '
                             'train at the damped rollout operating point '
                             '(extension, DIVERGENCES.md; eval-only '
                             'damping lives in scripts/eval_rollout.py)')
    parser.add_argument('--scan_epoch', type=eval, default=True,
                        help='device-resident epoch: keep the train set on '
                             'device and run each epoch as ONE lax.scan '
                             'XLA execution instead of one dispatch per '
                             'batch (extension; falls back to the per-batch '
                             'loop with --native_loader or --dp > 1).')
    parser.add_argument('--profile', type=eval, default=False,
                        help='capture a jax.profiler trace of the second '
                             'training epoch (post-compile) into '
                             'logs/profile_<timestamp>/; view with '
                             'TensorBoard')
    parser.add_argument('--dp', type=int, default=1,
                        help='data-parallel devices: shard the batch across '
                             'a dp-way jax mesh (params replicated; XLA '
                             'inserts the gradient psum over ICI). '
                             'batch_size must be divisible by dp.')
    return parser.parse_args(argv)


def main(args):
    import jax
    import jax.numpy as jnp

    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from mmpde_tpu.data import load_experiment
    from mmpde_tpu.models import DMM, MPSolver2D, ItpNet, BaseCNN
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T
    from mmpde_tpu.utils import save_checkpoint, load_checkpoint, MetricLogger
    from mmpde_tpu import ops

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    pde, u_train, u_test = load_experiment(
        args.experiment, args.base_resolution, data_root=args.data_root,
        n_traj=args.n_traj)
    print(f'Training on dataset of {args.experiment} '
          f'(train {u_train.shape}, test {u_test.shape}) on {jax.devices()[0]}')

    pipe = GraphPipeline(pde, neighbors=args.neighbors,
                         connect_edge=args.connect_edge,
                         time_window=args.time_window,
                         t_resolution=args.base_resolution[0])

    if args.model == 'BaseCNN':
        args.moving_mesh = False

    # ---- frozen DMM + ItpNet (moving-mesh path, mmpde.py:186-201) ----
    dmm = dmm_vars = itp = None
    dmm_grid = dmm_nbr = None
    itp_params = None
    if args.moving_mesh:
        ckpt_path = args.dmm_checkpoint or f'{args.experiment}_checkpoint'
        if not os.path.isdir(ckpt_path):
            raise FileNotFoundError(
                f"DMM checkpoint '{ckpt_path}' not found — train it first "
                f"with: python dmm.py --experiment {args.experiment}")
        raw_state, dmm_cfg = load_checkpoint(ckpt_path)
        arch = dmm_cfg["arch"]
        dmm = DMM(mode=arch["mode"], branch_layer=(
                      arch["branch_layer"] if isinstance(arch["branch_layer"], int)
                      else tuple(arch["branch_layer"])),
                  trunk_layer=tuple(arch["trunk_layer"]),
                  out_layer=tuple(arch["out_layer"]),
                  n_nodes=arch.get("n_nodes"))
        dmm_vars = {"params": raw_state["params"]}
        if "batch_stats" in raw_state and raw_state["batch_stats"]:
            dmm_vars["batch_stats"] = raw_state["batch_stats"]
        if dmm.mode == "graph":
            dmm_grid = pipe.grid
            dmm_nbr = ops.knn_indices(dmm_grid, 35)
        elif "s" in arch:
            # the DMM branch conv was trained at its own resolution; the
            # pipeline resizes solver fields to it before mesh movement
            # (reference: movingmesh_grid_size + F.interpolate,
            # data_creator_2d.py:102-103)
            s = int(arch["s"])
            pde.movingmesh_grid_size = (pde.grid_size[0], s, s)

        if args.experiment == 'cy':
            itp = ItpNet(ori_nx=pde.ori_grid_size[1], ori_ny=None,
                         layers1=tuple(args.itpnet_node1),
                         layers2=tuple(args.itpnet_node2))
        else:
            itp = ItpNet(ori_nx=pde.ori_grid_size[-2],
                         ori_ny=pde.ori_grid_size[-1],
                         layers1=tuple(args.itpnet_node1),
                         layers2=tuple(args.itpnet_node2),
                         res_cut_node=tuple(args.res_cut_node))
        # init all three sub-networks and merge their parameter trees
        k1, k2, k3 = jax.random.split(key, 3)
        nbq = jnp.ones((1, 2, 30, 2))
        qq = jnp.ones((1, 2, 1, 2))
        p1 = itp.init(k1, nbq, qq, '1')["params"]
        p2 = itp.init(k2, nbq, qq, '2')["params"]
        if args.experiment == 'cy':
            dsample = jnp.ones((1, pde.ori_grid_size[1]))
        else:
            dsample = jnp.ones((1, args.time_window,
                                pde.ori_grid_size[-2], pde.ori_grid_size[-1]))
        p3 = itp.init(k3, None, None, 'res_cut', dsample)["params"]
        itp_params = {**p1, **p2, **p3}

    # ---- solver models (mmpde.py:238-255) ----
    n_nodes = pipe.n_nodes
    tw = args.time_window
    solver_kw = dict(time_window=tw, dt=pde.dt, lx=pde.Lx, ly=pde.Ly,
                     tmax=pde.tmax)
    u_s = jnp.ones((2, n_nodes, tw))
    pos_s = jnp.ones((2, n_nodes, 3))

    params = {}
    batch_stats = {}
    if args.model == 'GNN':
        model = MPSolver2D(**solver_kw)
        v = model.init(jax.random.PRNGKey(args.seed), u_s, pos_s,
                       pipe.uniform_nbr)
        params['model'] = v['params']
        batch_stats['model'] = v['batch_stats']
        model_b = None
        if args.moving_mesh:
            model_b = MPSolver2D(**solver_kw)
            vb = model_b.init(jax.random.PRNGKey(args.seed + 1), u_s, pos_s,
                              pipe.uniform_nbr)
            params['model_b'] = vb['params']
            batch_stats['model_b'] = vb['batch_stats']
            params['itp'] = itp_params
    elif args.model == 'BaseCNN':
        model = BaseCNN(time_window=tw, hidden_channels=args.hidden_channels,
                        dt=pde.dt)
        nx, ny = args.base_resolution[1], args.base_resolution[2]
        v = model.init(jax.random.PRNGKey(args.seed),
                       jnp.ones((2, tw, nx, ny)))
        params['model'] = v['params']
        model_b = None
    else:
        raise Exception("Wrong model specified")

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f'Number of parameters: {n_params}')

    # ---- optimizer (mmpde.py:268-274) ----
    optimizer = T.make_optimizer(args.lr)
    opt_state = optimizer.init(params)
    state = T.TrainState(params=params, batch_stats=batch_stats,
                         opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    milestones = [args.unrolling, 30, 50, 70]

    start_epoch = 0
    if args.resume:
        restored, rcfg = load_checkpoint(args.resume, template={
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state})
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"])
        start_epoch = int((rcfg or {}).get("epoch", -1)) + 1
        print(f'Resumed from {args.resume} at epoch {start_epoch}')

    # ---- data parallelism (--dp): shard the batch, replicate the state ----
    dp_mesh = None
    if args.dp > 1:
        from mmpde_tpu.parallel import make_mesh, replicate
        n_dev = len(jax.devices())
        if n_dev < args.dp:
            raise RuntimeError(f'--dp {args.dp} needs {args.dp} devices, '
                               f'have {n_dev}')
        if args.batch_size % args.dp:
            raise ValueError(f'--batch_size {args.batch_size} not divisible '
                             f'by --dp {args.dp}')
        dp_mesh = make_mesh(args.dp)
        state = replicate(dp_mesh, state)
        if dmm_vars is not None:
            dmm_vars = replicate(dp_mesh, dmm_vars)

    # experiment-agnostic: the streamed cache below is written from the
    # ALREADY-preprocessed train/test arrays (load_experiment applied the
    # subsampling / frame-drop / channel-select), and the C++ loader and
    # windowed step treat spatial dims generically ([B, tw, *spatial])
    use_native = bool(args.native_loader) \
        and args.model == 'GNN' and not args.pushforward
    # device-resident scan epochs: donation moves to the epoch driver.
    # Composes with --dp: the batch gathered inside the scan body gets a
    # P('dp') sharding constraint, so multi-chip training keeps the
    # one-dispatch-per-epoch path (GSPMD shards the step and inserts the
    # gradient psum; state and u_all stay replicated).
    # MMPDE_STATIC_PUSH=1 (statically-unrolled pushforward, one program per
    # unrolled value) is per-batch only: a scan epoch needs one program
    use_scan = (bool(args.scan_epoch) and not use_native
                and not (args.pushforward
                         and os.environ.get('MMPDE_STATIC_PUSH') == '1'))
    from mmpde_tpu.utils.env import on_axon_runtime
    if (use_scan and args.pushforward and args.moving_mesh
            and on_axon_runtime()
            and os.environ.get('MMPDE_FORCE_SCAN_PUSH') != '1'):
        # the scan(cond(full-size MOVING-MESH two-branch step)) program
        # crashes the experimental axon TPU worker in its first execution
        # (DIVERGENCES 41, r3+r4; r5 bisection: kernel-independent, needs
        # the moving-mesh body — plain-GNN scan+pushforward trained 50
        # epochs clean at the same sizes in r3, so the guard is scoped to
        # moving_mesh).  The identical step runs fine per-batch and on
        # other backends.  MMPDE_FORCE_SCAN_PUSH=1 bypasses the guard
        # (fault bisection only: scripts/bisect2_scan_push.sh in a
        # dedicated chip window)
        print('[mmpde] moving-mesh scan+pushforward faults the axon TPU '
              'runtime (DIVERGENCES 41): falling back to per-batch epochs')
        use_scan = False
    if args.model == 'GNN':
        step_fn = T.make_gnn_step(pipe, model, optimizer, model_b, itp,
                                  dmm, dmm_vars, dmm_grid, dmm_nbr,
                                  train=True, window_input=use_native,
                                  donate=not use_scan,
                                  residual_head=args.residual_head,
                                  pushforward=args.pushforward,
                                  max_unrolling=args.unrolling,
                                  input_noise=args.input_noise,
                                  branch_damp=args.train_branch_damp)
        eval_fn = T.make_gnn_step(pipe, model, None, model_b, itp,
                                  dmm, dmm_vars, dmm_grid, dmm_nbr,
                                  train=False,
                                  residual_head=args.residual_head,
                                  branch_damp=args.train_branch_damp)
    else:
        step_fn = T.make_cnn_step(pipe, model, optimizer, train=True,
                                  donate=not use_scan)
        eval_fn = T.make_cnn_step(pipe, model, None, train=False)

    batch_sharding = None
    if dp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        batch_sharding = NamedSharding(dp_mesh, PartitionSpec('dp'))

    epoch_fn = eval_all = None
    if use_scan:
        epoch_fn = T.make_scan_epoch(step_fn, u_train,
                                     pushforward=args.pushforward,
                                     batch_sharding=batch_sharding)
        eval_all = T.make_scan_eval(eval_fn, u_test,
                                    batch_sharding=batch_sharding)

    if dp_mesh is not None and not use_scan:
        from mmpde_tpu.parallel import shard_batch

        def _dp_wrap(fn):
            if fn is None:
                return None
            return lambda st, *inputs: fn(st, *shard_batch(dp_mesh, inputs))

        step_fn, eval_fn = _dp_wrap(step_fn), _dp_wrap(eval_fn)

    native_loader = None
    if use_native:
        from mmpde_tpu.data.native_loader import NativeWindowLoader
        # the preprocessed view must exist as its own file for mmap; cache
        # it, and REWRITE on any shape mismatch — a cache written by a run
        # with different n_traj/nt holds a different 80/20 split, and the
        # C++ sampler trusts traj_hi without bounds-checking the mmap
        full_view = np.ascontiguousarray(
            np.concatenate([u_train, u_test], axis=0))
        sub_path = os.path.join(
            args.data_root,
            f'{args.experiment}_{args.base_resolution[1]}_sub.npy')
        cached_shape = None
        if os.path.exists(sub_path):
            cached_shape = np.load(sub_path, mmap_mode='r').shape
        if cached_shape != full_view.shape:
            np.save(sub_path, full_view)
        native_loader = NativeWindowLoader(
            sub_path, args.batch_size, args.time_window,
            traj_lo=0, traj_hi=len(u_train), seed=args.seed)

    timestring = datetime.now().strftime('%m-%d-%H-%M-%S')
    save_path = (f'models/{args.model}_PDE_{args.experiment}_mesh{args.moving_mesh}'
                 f'_xresolution{args.base_resolution[0]}-{args.base_resolution[1]}'
                 f'_n{args.neighbors}_{args.connect_edge}_tw{args.time_window}'
                 f'_unrolling{args.unrolling}_time{timestring}')
    os.makedirs('models', exist_ok=True)
    logger = MetricLogger(os.path.join(
        'logs', f'{args.experiment}_{args.model}_{timestring}'))
    print(save_path)

    # per-epoch checkpoints go through the native async writer (latest-wins
    # double buffer + atomic rename, csrc/writer.cpp) so the epoch loop
    # never blocks on storage; MMPDE_ASYNC_CKPT=0 opts out, and any build
    # failure falls back to the synchronous path
    async_writer = None
    if os.environ.get('MMPDE_ASYNC_CKPT', '1') == '1':
        try:
            from mmpde_tpu.utils.native_writer import AsyncCheckpointWriter
            async_writer = AsyncCheckpointWriter(save_path)
        except Exception as e:
            print(f'async checkpoint writer unavailable ({e}); '
                  'using synchronous saves')

    itp_step = itp_epoch = None
    if args.moving_mesh and args.model == 'GNN':
        itp_step = T.make_itp_step(pipe, optimizer, itp, dmm, dmm_vars,
                                   dmm_grid, dmm_nbr, donate=not use_scan)
        if dp_mesh is not None and not use_scan:
            itp_step = _dp_wrap(itp_step)
        if use_scan:
            itp_epoch = T.make_scan_epoch(itp_step, u_train,
                                          batch_sharding=batch_sharding)

    n_inner = args.inner_loops
    test_losses = []
    for epoch in range(start_epoch, args.num_epochs):
        print(f'Epoch {epoch}')
        state = T.set_lr(state, T.multistep_lr(args.lr, epoch, milestones,
                                               args.lr_decay))
        max_unroll = min(epoch, args.unrolling)

        # epoch-0 ItpNet reconstruction pretraining (mmpde.py:87-92)
        if itp_step is not None and epoch == 0:
            for i in range(n_inner or pipe.t_res):
                if itp_epoch is not None:
                    state, l_itp = T.train_epoch_scan(
                        rng, pipe, itp_epoch, state, len(u_train),
                        args.batch_size, 0, n_inner=1)
                else:
                    for batch in T.iterate_batches(rng, u_train,
                                                   args.batch_size):
                        steps = T.random_start_steps(rng, pipe, 0, len(batch))
                        state, l_itp = itp_step(state, jnp.asarray(batch),
                                                jnp.asarray(steps))
                if i % args.print_interval == 0:
                    print(f'Training ItpNet Loss (progress: '
                          f'{i / (n_inner or pipe.t_res):.2f}): {float(l_itp)}')

        # --profile: trace the second epoch (the first is dominated by
        # compiles, which would drown the steady-state timeline)
        profile_ctx = None
        if args.profile and epoch == start_epoch + 1:
            from mmpde_tpu.utils.profiling import trace
            profile_dir = os.path.join('logs', f'profile_{timestring}')
            profile_ctx = trace(profile_dir)
            print(f'Profiling this epoch -> {profile_dir}')

        t_ep = time.perf_counter()
        with (profile_ctx or contextlib.nullcontext()):
            if native_loader is not None:
                state, train_loss = T.train_epoch_native(
                    rng, pipe, step_fn, state, native_loader, len(u_train),
                    max_unroll, n_inner=n_inner)
            elif epoch_fn is not None:
                state, train_loss = T.train_epoch_scan(
                    rng, pipe, epoch_fn, state, len(u_train), args.batch_size,
                    max_unroll, n_inner=n_inner)
            else:
                state, train_loss = T.train_epoch(
                    rng, pipe, step_fn, state, u_train, args.batch_size,
                    max_unroll, n_inner=n_inner,
                    pushforward=args.pushforward)
        epoch_s = time.perf_counter() - t_ep
        bs = min(args.batch_size, len(u_train))
        n_steps = (n_inner or pipe.t_res) * max(1, len(u_train) // bs)
        print(f'Training Loss: {train_loss}')
        print('Testing:')
        if eval_all is not None:
            test_loss = T.test_timestep_losses_scan(pipe, eval_all, state,
                                                    len(u_test),
                                                    args.batch_size)
        else:
            test_loss = T.test_timestep_losses(pipe, eval_fn, state, u_test,
                                               args.batch_size)
        print(f'Mean Timestep Test Error: {test_loss}')
        test_losses.append(test_loss)
        logger.log(epoch, train_loss=train_loss, test_loss=test_loss,
                   epoch_s=round(epoch_s, 3),
                   steps_per_sec=round(n_steps / epoch_s, 3))

        ckpt_state = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        ckpt_config = {"args": vars(args), "epoch": epoch,
                       "test_losses": test_losses}
        if async_writer is not None:
            async_writer.save(ckpt_state, config=ckpt_config)
        else:
            save_checkpoint(save_path, ckpt_state, config=ckpt_config)
        # keep the best-test-MSE epoch separately: the per-epoch save
        # overwrites with the LATEST state, and test error fluctuates a few
        # x1e-4 late in training (the r4 u2 run ended on a 4.1e-4 epoch
        # while epoch 51 measured 2.0e-4).  eval scripts accept the
        # best/ subdir like any checkpoint dir.
        if test_loss == min(test_losses):
            save_checkpoint(os.path.join(save_path, 'best'), ckpt_state,
                            config=ckpt_config)
        print(f'Saved model at {save_path}\n')

    if async_writer is not None:
        async_writer.close()   # flush the last snapshot to disk
    print(f'Test loss: {min(test_losses) if test_losses else float("nan")}')
    logger.close()
    return test_losses


if __name__ == "__main__":
    args = get_args()
    print(args)
    main(args)
