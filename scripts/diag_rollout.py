"""Per-step rollout error diagnostic.

Prints the relative L2 at every rollout step for a trained checkpoint, to
distinguish smooth error compounding (distribution shift) from a sudden
blow-up (a bug or an unstable feedback loop through the monitor/mesh).

    PYTHONPATH=. python scripts/diag_rollout.py <checkpoint_dir> [--batch 6]
"""

import argparse
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
    args = p.parse_args()

    import jax.numpy as jnp

    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    from mmpde_tpu import ops
    from mmpde_tpu.data import load_experiment
    from mmpde_tpu.models import DMM, MPSolver2D, ItpNet
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver.train import TrainState
    from mmpde_tpu.eval.rollout import make_rollout
    from mmpde_tpu.utils import load_checkpoint

    state_raw, cfg = load_checkpoint(args.checkpoint)
    ckpt_args = cfg["args"]
    moving = bool(ckpt_args.get("moving_mesh", False)) and \
        "model_b" in state_raw["params"]

    pde, u_train, u_test = load_experiment(args.experiment,
                                           args.base_resolution,
                                           data_root=args.data_root)
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
        itp = ItpNet(ori_nx=pde.ori_grid_size[-2],
                     ori_ny=pde.ori_grid_size[-1],
                     layers1=tuple(ckpt_args["itpnet_node1"]),
                     layers2=tuple(ckpt_args["itpnet_node2"]),
                     res_cut_node=tuple(ckpt_args["res_cut_node"]))

    state = TrainState(params=state_raw["params"],
                       batch_stats=state_raw["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    rollout_fn = make_rollout(pipe, model, model_b, itp, dmm, dmm_vars,
                              dmm_grid, dmm_nbr,
                              residual_head=bool(
                                  ckpt_args.get("residual_head", False)))

    batch = min(args.batch, len(u_test))
    start = tw
    n_steps = (pipe.t_res - start) // tw
    u_init = jnp.asarray(u_test[:batch, start - tw:start])
    preds = np.asarray(rollout_fn(state, u_init, n_steps))  # [B, S, tw, ...]
    truth = np.stack([
        u_test[:batch, start + i * tw: start + (i + 1) * tw]
        for i in range(n_steps)], axis=1)
    print(f"moving={moving}  steps={n_steps}  batch={batch}")
    for s in range(n_steps):
        d = preds[:, s] - truth[:, s]
        rel = np.sqrt((d ** 2).sum(axis=(1, 2, 3))) / np.maximum(
            np.sqrt((truth[:, s] ** 2).sum(axis=(1, 2, 3))), 1e-12)
        pmax = np.abs(preds[:, s]).max()
        print(f"step {s + 1:3d}  rel_l2={rel.mean():.4f}  "
              f"pred_absmax={pmax:.3e}")


if __name__ == "__main__":
    main()
