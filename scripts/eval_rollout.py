"""Evaluate rollout relative-L2 of a trained MM-PDE checkpoint.

The BASELINE north-star metric: autoregressive rollout over the held-out
trajectories, relative L2 against ground truth.

    PYTHONPATH=.:/root/.axon_site python scripts/eval_rollout.py \
        <checkpoint_dir> [--experiment burgers] [--base_resolution 31,48,48]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--experiment", default="burgers")
    p.add_argument("--base_resolution",
                   type=lambda s: [int(i) for i in s.split(",")],
                   default=[31, 48, 48])
    p.add_argument("--data_root", default="data")
    p.add_argument("--dmm_checkpoint", default=None)
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--n_traj", type=int, default=None,
                   help="dataset size; default: the checkpoint's n_traj, so "
                        "the 80/20 split matches the one the run trained on")
    p.add_argument("--mesh_damp", type=float, default=0.0,
                   help="eval-time mesh damping in [0,1]: scale the DMM "
                        "displacement by (1-damp) during rollout "
                        "(DIVERGENCES.md; 0 = reference-faithful)")
    p.add_argument("--branch_damp", type=float, default=0.0,
                   help="eval-time correction damping in [0,1]: scale the "
                        "moved-branch correction by (1-damp); 1 = uniform "
                        "branch alone (DIVERGENCES.md)")
    p.add_argument("--one_step", action="store_true",
                   help="report the reference one-step test MSE "
                        "(test_timestep_losses) at the damped operating "
                        "point instead of the autoregressive rollout")
    args = p.parse_args()

    # fail fast with a usable message: a missing/empty checkpoint argument
    # (e.g. from a chain script whose glob matched nothing) previously
    # surfaced as a bare FileNotFoundError('state.msgpack')
    if not args.checkpoint or not os.path.isdir(args.checkpoint):
        sys.exit(f"eval_rollout: checkpoint dir {args.checkpoint!r} does not "
                 f"exist — pass the directory mmpde.py printed as its save "
                 f"path (models/GNN_PDE_...)")
    if not os.path.exists(os.path.join(args.checkpoint, "state.msgpack")):
        sys.exit(f"eval_rollout: {args.checkpoint!r} has no state.msgpack — "
                 f"the run saved no epoch (check its log)")

    import jax
    import jax.numpy as jnp

    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from mmpde_tpu import ops
    from mmpde_tpu.data import load_experiment
    from mmpde_tpu.models import DMM, MPSolver2D, ItpNet
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver.train import TrainState
    from mmpde_tpu.eval.rollout import make_rollout, evaluate_rollout
    from mmpde_tpu.utils import load_checkpoint

    state_raw, cfg = load_checkpoint(args.checkpoint)
    ckpt_args = cfg["args"]
    moving = bool(ckpt_args.get("moving_mesh", False)) and \
        "model_b" in state_raw["params"]

    # match the training split (and never trigger a full-dataset regeneration
    # because the default n_traj exceeds what the run actually used)
    n_traj = args.n_traj or int(ckpt_args.get("n_traj") or 100)
    pde, u_train, u_test = load_experiment(args.experiment,
                                           args.base_resolution,
                                           data_root=args.data_root,
                                           n_traj=n_traj)
    pipe = GraphPipeline(pde, neighbors=int(ckpt_args["neighbors"]),
                         connect_edge=ckpt_args["connect_edge"],
                         time_window=int(ckpt_args["time_window"]),
                         t_resolution=args.base_resolution[0])

    tw = int(ckpt_args["time_window"])
    kw = dict(time_window=tw, dt=pde.dt, lx=pde.Lx, ly=pde.Ly, tmax=pde.tmax)
    model = MPSolver2D(**kw)
    model_b = MPSolver2D(**kw) if moving else None

    dmm = dmm_vars = itp = None
    dmm_grid = dmm_nbr = None
    if moving:
        dmm_ckpt = args.dmm_checkpoint or f"{args.experiment}_checkpoint"
        raw_dmm, dmm_cfg = load_checkpoint(dmm_ckpt)
        arch = dmm_cfg["arch"]
        dmm = DMM(mode=arch["mode"],
                  branch_layer=(arch["branch_layer"]
                                if isinstance(arch["branch_layer"], int)
                                else tuple(arch["branch_layer"])),
                  trunk_layer=tuple(arch["trunk_layer"]),
                  out_layer=tuple(arch["out_layer"]),
                  n_nodes=arch.get("n_nodes"))
        dmm_vars = {"params": raw_dmm["params"]}
        if raw_dmm.get("batch_stats"):
            dmm_vars["batch_stats"] = raw_dmm["batch_stats"]
        if dmm.mode == "graph":
            dmm_grid = pipe.grid
            dmm_nbr = ops.knn_indices(dmm_grid, 35)
        if args.experiment == "cy":
            itp = ItpNet(ori_nx=pde.ori_grid_size[1], ori_ny=None,
                         layers1=tuple(ckpt_args["itpnet_node1"]),
                         layers2=tuple(ckpt_args["itpnet_node2"]))
        else:
            itp = ItpNet(ori_nx=pde.ori_grid_size[-2],
                         ori_ny=pde.ori_grid_size[-1],
                         layers1=tuple(ckpt_args["itpnet_node1"]),
                         layers2=tuple(ckpt_args["itpnet_node2"]),
                         res_cut_node=tuple(ckpt_args["res_cut_node"]))

    state = TrainState(params=state_raw["params"],
                       batch_stats=state_raw["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))

    if ckpt_args.get("model") == "BaseCNN":
        # CNN ablation: image-to-image map, rolled out autoregressively
        import functools
        from mmpde_tpu.models import BaseCNN
        cnn = BaseCNN(time_window=tw,
                      hidden_channels=int(ckpt_args["hidden_channels"]),
                      dt=pde.dt)
        cnn_params = state_raw["params"]["model"]

        @functools.partial(jax.jit, static_argnums=(2,))
        def cnn_rollout(_state, u_init, n_steps: int, start=None):
            def body(d, _):
                pred = cnn.apply({"params": cnn_params}, d).reshape(d.shape)
                return pred, pred

            _, preds = jax.lax.scan(body, u_init, None, length=n_steps)
            return jnp.moveaxis(preds, 0, 1)

        def rollout_cnn_fn(_state, u_init, n_steps, start=None):
            return cnn_rollout(_state, u_init, n_steps)

        rel = evaluate_rollout(pipe, rollout_cnn_fn, state, u_test)
        print(json.dumps({"metric": "rollout_relative_l2",
                          "experiment": args.experiment, "model": "BaseCNN",
                          "moving_mesh": False, "value": rel,
                          "n_test": len(u_test)}))
        return

    if args.one_step:
        import mmpde_tpu.solver.train as T
        eval_fn = T.make_gnn_step(
            pipe, model, None, model_b, itp, dmm, dmm_vars, dmm_grid,
            dmm_nbr, train=False,
            residual_head=bool(ckpt_args.get("residual_head", False)),
            mesh_damp=args.mesh_damp, branch_damp=args.branch_damp)
        mse = T.test_timestep_losses(pipe, eval_fn, state, u_test,
                                     batch_size=args.batch)
        print(json.dumps({"metric": "one_step_test_mse",
                          "experiment": args.experiment,
                          "moving_mesh": moving,
                          "mesh_damp": args.mesh_damp,
                          "branch_damp": args.branch_damp,
                          "value": mse, "n_test": len(u_test)}))
        return

    rollout_fn = make_rollout(pipe, model, model_b, itp, dmm, dmm_vars,
                              dmm_grid, dmm_nbr,
                              residual_head=bool(
                                  ckpt_args.get("residual_head", False)),
                              mesh_damp=args.mesh_damp,
                              branch_damp=args.branch_damp)
    batch = min(args.batch, len(u_test))
    rels = []
    for i in range(0, len(u_test) - batch + 1, batch):
        rel = evaluate_rollout(pipe, rollout_fn, state,
                               u_test[i:i + batch])
        rels.append(rel)
    result = {"metric": "rollout_relative_l2",
              "experiment": args.experiment,
              "moving_mesh": moving,
              "mesh_damp": args.mesh_damp,
              "branch_damp": args.branch_damp,
              "value": float(np.mean(rels)),
              "n_test": len(rels) * args.batch}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
