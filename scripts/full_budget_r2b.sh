#!/bin/bash
# Round-2b: win on rollout (VERDICT item 2, second attempt).
#
# The 2a chain showed full-budget MM-PDE beats plain GNN on one-step MSE
# (1.57e-4 vs 2.17e-4) but diverges on autoregressive rollout (rel-L2 43 vs
# 2.4): per-step diagnostics (scripts/diag_rollout.py) show smooth error
# compounding from its own-prediction input distribution, not a bug.  Fix:
# REAL pushforward training (--pushforward True) — the model sees its own
# no-grad one-step prediction as input, the original MP-PDE trick the
# reference dropped (train_helper_2d.py:100-104 only shrinks the sampling
# range).  Both models retrain with the identical recipe so the comparison
# stays head-to-head.  MMPDE_LOCAL_KNN keeps the moved-mesh kNN O(N*C).
#
# Every stage is wall-clock bounded; per-epoch checkpoints mean a timed-out
# stage still leaves its best model on disk.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export MMPDE_LOCAL_KNN=1
mkdir -p logs models

stamp() { date +%H:%M:%S; }
newest() { ls -dt "$@" 2>/dev/null | head -1; }

echo "[$(stamp)] === stage A: MM-PDE, 80 epochs, REAL pushforward ==="
timeout 15000 python mmpde.py --lr 6e-4 --num_epochs 80 \
    --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
    > logs/r2b_mmpde_push.log 2>&1
echo "[$(stamp)] stage A rc=$?"
grep "Mean Timestep Test Error" logs/r2b_mmpde_push.log | tail -2
MM_CKPT=$(newest models/GNN_PDE_burgers_meshTrue_*)
echo "MM-PDE checkpoint: $MM_CKPT"
timeout 900 python scripts/eval_rollout.py "$MM_CKPT" \
    > logs/r2b_rollout_mmpde.log 2>&1
echo "[$(stamp)] MM-PDE rollout rc=$?"; tail -1 logs/r2b_rollout_mmpde.log
timeout 900 python scripts/diag_rollout.py "$MM_CKPT" --batch 6 \
    > logs/r2b_diag_mmpde.log 2>&1

echo "[$(stamp)] === stage B: plain GNN, 80 epochs, REAL pushforward ==="
timeout 7200 python mmpde.py --lr 6e-4 --moving_mesh False --num_epochs 80 \
    --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
    > logs/r2b_gnn_push.log 2>&1
echo "[$(stamp)] stage B rc=$?"
grep "Mean Timestep Test Error" logs/r2b_gnn_push.log | tail -2
GNN_CKPT=$(newest models/GNN_PDE_burgers_meshFalse_*)
echo "GNN checkpoint: $GNN_CKPT"
timeout 900 python scripts/eval_rollout.py "$GNN_CKPT" \
    > logs/r2b_rollout_gnn.log 2>&1
echo "[$(stamp)] GNN rollout rc=$?"; tail -1 logs/r2b_rollout_gnn.log

echo "[$(stamp)] === chain done ==="
