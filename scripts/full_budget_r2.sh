#!/bin/bash
# Round-2 full-budget reproduction chain (VERDICT items 2 and 7).
#
# Reference budgets (BASELINE.md): DMM 150 Adam epochs (reference
# mesh/dmm.py:46), solver 80 epochs (reference mmpde.py:349).  Both solver
# runs use --unrolling 1 (pushforward-style start-step shrink,
# train_helper_2d.py:100-104) and the opt-in u_last residual head
# (documented divergence) so the MM-PDE vs plain-GNN comparison is
# head-to-head fair.  Every stage is wall-clock bounded with `timeout` so
# the chain cannot overrun the round; per-epoch checkpoints mean a timed-out
# stage still leaves its best model on disk.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p logs models

stamp() { date +%H:%M:%S; }
newest() { ls -dt "$@" 2>/dev/null | head -1; }

echo "[$(stamp)] === stage 1: DMM Burgers, 150 Adam epochs (reference budget) ==="
timeout 3000 python dmm.py --epochs_adam 150 --epochs_rf 2 --eval_every 25 \
    --n_traj 100 --plot True \
    > logs/r2_dmm_burgers.log 2>&1
echo "[$(stamp)] stage 1 rc=$? (checkpoint: burgers_checkpoint)"
tail -3 logs/r2_dmm_burgers.log

echo "[$(stamp)] === stage 2: plain GNN, 80 epochs, unrolling 1, residual head ==="
timeout 5400 python mmpde.py --lr 6e-4 --moving_mesh False --num_epochs 80 \
    --unrolling 1 --residual_head True --n_traj 100 \
    > logs/r2_gnn_burgers.log 2>&1
echo "[$(stamp)] stage 2 rc=$?"
grep "Mean Timestep Test Error" logs/r2_gnn_burgers.log | tail -2
GNN_CKPT=$(newest models/GNN_PDE_burgers_meshFalse_*_unrolling1_*)
echo "GNN checkpoint: $GNN_CKPT"
timeout 900 python scripts/eval_rollout.py "$GNN_CKPT" \
    > logs/r2_rollout_gnn.log 2>&1
echo "[$(stamp)] GNN rollout rc=$?"; tail -1 logs/r2_rollout_gnn.log

echo "[$(stamp)] === stage 3: full MM-PDE, 80 epochs, unrolling 1, residual head ==="
timeout 11400 python mmpde.py --lr 6e-4 --num_epochs 80 \
    --unrolling 1 --residual_head True --n_traj 100 \
    > logs/r2_mmpde_burgers.log 2>&1
echo "[$(stamp)] stage 3 rc=$?"
grep "Mean Timestep Test Error" logs/r2_mmpde_burgers.log | tail -2
MM_CKPT=$(newest models/GNN_PDE_burgers_meshTrue_*_unrolling1_*)
echo "MM-PDE checkpoint: $MM_CKPT"
timeout 900 python scripts/eval_rollout.py "$MM_CKPT" \
    > logs/r2_rollout_mmpde.log 2>&1
echo "[$(stamp)] MM-PDE rollout rc=$?"; tail -1 logs/r2_rollout_mmpde.log

echo "[$(stamp)] === stage 4: fast-path convergence validation (VERDICT weak 5) ==="
# identical 10-epoch configs, defaults ON vs forced OFF, same DMM checkpoint
timeout 1500 python mmpde.py --lr 6e-4 --num_epochs 10 --inner_loops 8 \
    --n_traj 100 > logs/r2_fastpath_on.log 2>&1
echo "[$(stamp)] fast-ON rc=$?"
grep "Mean Timestep Test Error" logs/r2_fastpath_on.log | tail -1
MMPDE_BF16=0 MMPDE_GRID_KNN=0 timeout 2400 python mmpde.py --lr 6e-4 \
    --num_epochs 10 --inner_loops 8 --n_traj 100 \
    > logs/r2_fastpath_off.log 2>&1
echo "[$(stamp)] fast-OFF rc=$?"
grep "Mean Timestep Test Error" logs/r2_fastpath_off.log | tail -1

echo "[$(stamp)] === chain done ==="
