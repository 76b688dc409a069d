"""DMM (Data-free Mesh Mover) training CLI.

Same argument surface as the reference mesh/dmm.py (reference:
mesh/dmm.py:18-59).  Trains the DeepONet-style mesh-potential operator with
the physics-informed Monge-Ampere loss; every inner iteration (sampling +
nested coordinate derivatives + Adam update) is one jitted XLA program.

    python dmm.py                                      # Burgers defaults
    python dmm.py --experiment cy --train_sample_grid 1500 \
                  --branch_layers 4,3 --trunk_layers 16,512

Writes a self-describing checkpoint to ``{experiment}_checkpoint`` (consumed
by mmpde.py) plus mesh plots and a text log, like the reference.
"""

import argparse
import os
from datetime import datetime

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser(description='Put your hyperparameters')
    parser.add_argument('--experiment', default='burgers', type=str,
                        help='experiment: burgers | cy')
    parser.add_argument('--seed', default=0, type=int, help='random seed')
    parser.add_argument('--device', type=str, default='tpu',
                        help='used device (informational; jax selects)')
    parser.add_argument('--sub_u', default=4, type=int,
                        help='subsample number when sampling')
    parser.add_argument('--train_sample_grid', default=5000, type=int,
                        help='number of training grids per u')
    parser.add_argument('--test_grid_size', default=[6, 10, 20, 40],
                        type=lambda s: [int(i) for i in str(s).split(',')],
                        help='grid size for plotting')
    parser.add_argument('--branch_layers',
                        type=lambda s: [int(i) for i in s.split(',')],
                        default=7, metavar='N',
                        help='number of hidden nodes of branch network')
    parser.add_argument('--trunk_layers',
                        type=lambda s: [int(i) for i in s.split(',')],
                        default=[32, 512], metavar='N',
                        help='number of hidden nodes of trunk network')
    parser.add_argument('--out_layers',
                        type=lambda s: [int(i) for i in s.split(',')],
                        default=[1024, 512, 1], metavar='N',
                        help='number of hidden nodes of decoder network')
    parser.add_argument('--bound_constraint', default='soft', type=str,
                        help='constraint of boundary condition: soft | hard')
    parser.add_argument('--batch_size_x_adam', default=120, type=int,
                        help='batch size of training grids per u')
    parser.add_argument('--batch_size_u_adam', default=160, type=int,
                        help='batch size of u (should be divisible by sub_u)')
    parser.add_argument('--batch_size_x_lbfgs', default=100, type=int,
                        help='batch size')
    parser.add_argument('--batch_size_u_lbfgs', default=120, type=int,
                        help='batch size')
    parser.add_argument('--rf', default=True, type=eval,
                        help='random feature: True | False')
    parser.add_argument('--rf_opt_alg', default='BFGS', type=str,
                        help='optimization algorithm of random feature method: BFGS | Newton')
    parser.add_argument('--convex_rel', default=0.00, type=float,
                        help='hyperparameter of convex relaxation')
    parser.add_argument('--batch_size_x_rf', default=16, type=int,
                        help='batch size')
    parser.add_argument('--batch_size_u_rf', default=20, type=int,
                        help='batch size')
    parser.add_argument('--loss_bound_rf', default=True, type=eval,
                        help='bound constraint of random feature method: True | False')
    parser.add_argument('--max_iter', default=300, type=int,
                        help='max iteration of rf algorithm')
    parser.add_argument('--epochs_adam', default=150, type=int,
                        help='number of epochs of Adam optimizer')
    parser.add_argument('--epochs_lbfgs', default=0, type=int,
                        help='number of epochs of LBFGS optimizer')
    parser.add_argument('--epochs_rf', default=5, type=int,
                        help='number of epochs of random feature')
    parser.add_argument('--lr_adam', default=2e-4, type=float,
                        help='learning rate')
    parser.add_argument('--lr_lbfgs', default=1e-3, type=float,
                        help='learning rate')
    parser.add_argument('--weight_decay', default=1e-5, type=float,
                        help='weight decay')
    parser.add_argument('--gamma_adam', default=0.2, type=float,
                        help='gamma of Adam optimizer')
    parser.add_argument('--gamma_lbfgs', default=0.2, type=float,
                        help='gamma of LBFGS optimizer')
    parser.add_argument('--loss_weight0', default=1, type=float,
                        help='weight of loss_in')
    parser.add_argument('--loss_weight1', default=1000, type=float,
                        help='weight of loss_bound')
    parser.add_argument('--loss_weight2', default=1, type=float,
                        help='weight of loss_convex')
    parser.add_argument('--loss_convex', default=True, type=eval,
                        help='convex constraint: True | False')
    # extensions beyond the reference surface
    parser.add_argument('--data_root', type=str, default='data',
                        help='dataset cache directory')
    parser.add_argument('--checkpoint', type=str, default=None,
                        help='checkpoint dir (default {experiment}_checkpoint)')
    parser.add_argument('--eval_every', default=10, type=int,
                        help='mesh-quality evaluation interval (epochs)')
    parser.add_argument('--n_traj', type=int, default=100,
                        help='trajectories to generate if dataset missing')
    parser.add_argument('--plot', default=True, type=eval,
                        help='render mesh plots after training')
    parser.add_argument('--resume', default=False, type=eval,
                        help='resume Adam training from the checkpoint dir '
                             '(params + optimizer state; older checkpoints '
                             'without opt_state restore params and '
                             'fast-forward the LR schedule)')
    return parser.parse_args(argv)


def _fast_forward_counts(opt_state, n):
    """Set every ``count`` field in an optax state tree to ``n`` (resume
    path for checkpoints that predate opt_state serialisation: Adam moments
    restart at zero but the LR schedule continues where it left off)."""
    import jax.numpy as jnp

    if hasattr(opt_state, '_fields'):
        vals = {}
        for f in opt_state._fields:
            v = getattr(opt_state, f)
            vals[f] = (jnp.asarray(n, getattr(v, 'dtype', jnp.int32))
                       if f == 'count' else _fast_forward_counts(v, n))
        return opt_state._replace(**vals)
    if isinstance(opt_state, tuple):
        return tuple(_fast_forward_counts(x, n) for x in opt_state)
    return opt_state


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from mmpde_tpu import ops
    from mmpde_tpu.data.loading import load_dmm_training_data
    from mmpde_tpu.dmm.loss import MALossConfig
    from mmpde_tpu.dmm import train as DT
    from mmpde_tpu.models import DMM
    from mmpde_tpu.utils import save_checkpoint, MetricLogger

    key = jax.random.PRNGKey(args.seed)
    u, test_u = load_dmm_training_data(args.experiment, sub_u=args.sub_u,
                                       data_root=args.data_root,
                                       generate_kwargs={"n_traj": args.n_traj})
    u = jnp.asarray(u)
    test_u = jnp.asarray(test_u)
    print(f'DMM training data: {u.shape} on {jax.devices()[0]}')

    mesh = grid = nbr = None
    if args.experiment == 'burgers':
        model = DMM(mode='array', branch_layer=args.branch_layers,
                    trunk_layer=tuple([2] + args.trunk_layers),
                    out_layer=tuple(args.out_layers))
        u0 = u[:2]
        arch = {"mode": "array", "branch_layer": args.branch_layers,
                "trunk_layer": [2] + args.trunk_layers,
                "out_layer": args.out_layers, "s": int(u.shape[-1])}
    else:
        mesh = u[0, :, :2]
        grid = mesh
        nbr = ops.knn_indices(grid, 35)
        n_nodes = int(u.shape[-2])
        model = DMM(mode='graph', branch_layer=tuple(args.branch_layers),
                    trunk_layer=tuple([2] + args.trunk_layers),
                    out_layer=tuple(args.out_layers), n_nodes=n_nodes)
        u0 = u[:2, :, 2]
        arch = {"mode": "graph", "branch_layer": args.branch_layers,
                "trunk_layer": [2] + args.trunk_layers,
                "out_layer": args.out_layers, "n_nodes": n_nodes}

    xi0 = jnp.zeros((2, 3, 2))
    if args.experiment == 'burgers':
        variables = model.init(key, u0, xi0)
    else:
        variables = model.init(key, u0, xi0, grid, nbr)
    params = variables["params"]
    extra_vars = {k: v for k, v in variables.items() if k != "params"}
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f'DMM parameters: {n_params}')

    cfg = DT.DMMTrainConfig(
        experiment=args.experiment,
        train_sample_grid=args.train_sample_grid,
        batch_size_x_adam=args.batch_size_x_adam,
        batch_size_u_adam=args.batch_size_u_adam,
        batch_size_x_lbfgs=args.batch_size_x_lbfgs,
        batch_size_u_lbfgs=args.batch_size_u_lbfgs,
        batch_size_x_rf=args.batch_size_x_rf,
        batch_size_u_rf=args.batch_size_u_rf,
        epochs_adam=args.epochs_adam, epochs_lbfgs=args.epochs_lbfgs,
        epochs_rf=args.epochs_rf, lr_adam=args.lr_adam,
        lr_lbfgs=args.lr_lbfgs, weight_decay=args.weight_decay,
        gamma_adam=args.gamma_adam, gamma_lbfgs=args.gamma_lbfgs,
        max_iter=args.max_iter, rf=args.rf, convex_rel=args.convex_rel,
        seed=args.seed)
    loss_cfg = MALossConfig(
        loss_weight0=args.loss_weight0, loss_weight1=args.loss_weight1,
        loss_weight2=args.loss_weight2, loss_convex=args.loss_convex,
        bound_constraint=args.bound_constraint)

    n_inner = DT.n_inner_steps(cfg, int(u.shape[0]))
    optimizer = DT.adam_optimizer(cfg, n_inner)
    opt_state = optimizer.init(params)
    adam_step = DT.make_adam_step(model, cfg, loss_cfg, optimizer, u,
                                  mesh=mesh, grid=grid, nbr=nbr)

    ckpt_path = args.checkpoint or f'{args.experiment}_checkpoint'

    start_epoch = 1
    test_equ_losses = []
    if args.resume and os.path.exists(os.path.join(ckpt_path,
                                                   'state.msgpack')):
        import flax.serialization
        from mmpde_tpu.utils import load_checkpoint
        raw, ck_cfg = load_checkpoint(ckpt_path)
        test_equ_losses = [float(x) for x in
                           (ck_cfg or {}).get('test_equ_losses') or []]
        start_epoch = len(test_equ_losses) + 1
        params = flax.serialization.from_state_dict(params, raw['params'])
        if raw.get('batch_stats'):
            extra_vars['batch_stats'] = flax.serialization.from_state_dict(
                extra_vars['batch_stats'], raw['batch_stats'])
        if 'opt_state' in raw:
            opt_state = flax.serialization.from_state_dict(
                opt_state, raw['opt_state'])
            how = 'params + opt_state'
        else:
            opt_state = _fast_forward_counts(
                opt_state, (start_epoch - 1) * n_inner)
            how = 'params only (LR schedule fast-forwarded)'
        print(f'Resumed {ckpt_path} at epoch {start_epoch} ({how})')

    # per-epoch checkpoints via the native async writer (csrc/writer.cpp);
    # MMPDE_ASYNC_CKPT=0 or a build failure falls back to synchronous saves
    async_writer = None
    if os.environ.get('MMPDE_ASYNC_CKPT', '1') == '1':
        try:
            from mmpde_tpu.utils.native_writer import AsyncCheckpointWriter
            async_writer = AsyncCheckpointWriter(ckpt_path)
        except Exception as e:
            print(f'async checkpoint writer unavailable ({e}); '
                  'using synchronous saves')

    def _save_ckpt(state, config, final=False):
        if async_writer is not None:
            async_writer.save(state, config=config)
            if final:
                async_writer.close()
        else:
            save_checkpoint(ckpt_path, state, config=config)
    logger = MetricLogger(os.path.join(
        'logs', f'dmm_{args.experiment}_{datetime.now().strftime("%m-%d-%H-%M-%S")}'))
    logs_txt = [str(args)]

    print(f'Train moving mesh operator: {n_inner} inner steps/epoch')
    from datetime import datetime as _dt
    for epoch in range(start_epoch, args.epochs_adam + 1):
        t0 = _dt.now()
        for i in range(n_inner):
            key, sub = jax.random.split(key)
            params, opt_state, terms = adam_step(params, extra_vars,
                                                 opt_state, sub)
        test_equ = terms.lhs_over_rhs - 1.0
        test_equ_loss = float(jnp.mean(jnp.abs(test_equ)))
        test_equ_losses.append(test_equ_loss)
        msg = ('Epoch: {} | Loss in: {} | Loss bound: {} | Loss convex: {} | '
               'Test equ loss: {:1.4f}'.format(
                   epoch, float(terms.loss_in), float(terms.loss_bound),
                   float(terms.loss_convex), test_equ_loss))
        print(_dt.now() - t0)
        print(msg)
        logs_txt.append(msg)
        epoch_s = (_dt.now() - t0).total_seconds()
        logger.log(epoch, loss_in=terms.loss_in, loss_bound=terms.loss_bound,
                   loss_convex=terms.loss_convex, test_equ=test_equ_loss,
                   epoch_s=round(epoch_s, 3),
                   steps_per_sec=round(n_inner / max(epoch_s, 1e-9), 3))

        if args.eval_every and (epoch % args.eval_every == 0
                                or epoch == args.epochs_adam):
            from mmpde_tpu.eval.evaluate import evaluate, evaluate_tri
            variables_now = dict(extra_vars, params=params)
            if args.experiment == 'burgers':
                tr = evaluate(model, variables_now, u[:32])
                te = evaluate(model, variables_now, test_u[:32])
            else:
                tr = evaluate_tri(model, variables_now, u[:32, :, 2],
                                  mesh, grid=grid, nbr=nbr)
                te = evaluate_tri(model, variables_now, test_u[:32, :, 2],
                                  mesh, grid=grid, nbr=nbr)
            msg = ('Train mean: {:1.6f} | Train std: {:1.6f} | Train minmax: '
                   '{:1.6f} | Test mean: {:1.6f} | Test std: {:1.6f} | '
                   'Test minmax: {:1.6f}'.format(*tr, *te))
            print(msg)
            logs_txt.append(msg)
            logger.log(epoch, train_std=tr[1], train_minmax=tr[2],
                       test_std=te[1], test_minmax=te[2])

        _save_ckpt({"params": params,
                    "batch_stats": extra_vars.get("batch_stats", {}),
                    "opt_state": opt_state},
                   config={"arch": arch, "args": vars(args),
                           "test_equ_losses": test_equ_losses})

    # ---- L-BFGS phase (default epochs_lbfgs=0) ----
    if args.epochs_lbfgs > 0:
        lbfgs_run = DT.make_lbfgs_runner(model, cfg, loss_cfg, u,
                                         mesh=mesh, grid=grid, nbr=nbr)
        for epoch in range(args.epochs_lbfgs):
            key, sub = jax.random.split(key)
            params, lval = lbfgs_run(params, extra_vars, sub)
            print(f'LBFGS epoch {epoch}: loss {float(lval):.6f}')

    # ---- random-feature refit ----
    if args.rf:
        variables_now = dict(extra_vars, params=params)
        for i in range(args.epochs_rf):
            t0 = _dt.now()
            print('random feature method epoch No.', i)
            key, sub = jax.random.split(key)
            params, rf_l = DT.rf_refit(model, dict(extra_vars, params=params),
                                       cfg, loss_cfg, sub, u, mesh=mesh,
                                       grid=grid, nbr=nbr,
                                       alg=args.rf_opt_alg,
                                       include_bound=args.loss_bound_rf)
            print('time per epoch of random feature method: ', _dt.now() - t0)
            print(f'rf loss: {rf_l:.6f}')
            logs_txt.append(f'rf epoch {i}: loss {rf_l:.6f}')

    _save_ckpt({"params": params,
                "batch_stats": extra_vars.get("batch_stats", {}),
                "opt_state": opt_state},
               config={"arch": arch, "args": vars(args),
                       "test_equ_losses": test_equ_losses}, final=True)
    print(ckpt_path)

    # ---- mesh plots (mesh/dmm.py:97-122) ----
    if args.plot:
        os.makedirs(args.experiment, exist_ok=True)
        from mmpde_tpu.eval.plotting import (plot_mesh_res, plot_mesh_res_tri,
                                             plot_mesh_res_tri_s)
        variables_now = dict(extra_vars, params=params)
        stamp = datetime.now().strftime('%m-%d-%H-%M-%S')
        if args.experiment == 'burgers':
            for s in args.test_grid_size:
                p = f'{args.experiment}/mesh_{stamp}_s{s}.png'
                plot_mesh_res(model, variables_now, u[:111], s, p)
                print(p)
        else:
            # multi-size quad-probe plots per test grid size, then the
            # Delaunay tri wireframe (reference mesh/dmm.py:108-122)
            for s in args.test_grid_size:
                p = f'{args.experiment}/mesh_{stamp}_s{s}_tri.png'
                plot_mesh_res_tri_s(model, variables_now, u[:, :, 2], mesh,
                                    s, p, grid=grid, nbr=nbr)
                print(p)
            p = f'{args.experiment}/mesh_{stamp}_tri.png'
            plot_mesh_res_tri(model, variables_now, u[:, :, 2], mesh, p,
                              grid=grid, nbr=nbr)
            print(p)

    with open(f'{args.experiment}_dmm_log_'
              f'{datetime.now().strftime("%m-%d-%H-%M-%S")}.txt', 'w') as f:
        f.write('\n'.join(logs_txt))
    logger.close()
    print('Finish!')
    return params


if __name__ == "__main__":
    args = get_args()
    print(args)
    main(args)
