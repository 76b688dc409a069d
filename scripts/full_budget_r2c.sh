#!/bin/bash
# Round-2c: fresh bench on the scan-epoch path, then full-budget cylinder
# (VERDICT item 4): DMM cy at the reference 150-Adam-epoch budget
# (mesh/dmm.py:46, README.md:28-32), then the MM-PDE cy solver and the
# plain-GNN cy ablation head-to-head with the round-2 stability recipe
# (unrolling 1 + real pushforward + residual head), each followed by the
# cy rollout rel-L2 (previously absent).  Solver runs use 40 epochs (half
# the reference 80) to fit the session wall clock — per-epoch checkpoints
# mean a timed-out stage still leaves its best model on disk.
#
# Waits for the r2d chain to release the chip.  Every stage is bounded by
# min(its own budget, time left until DEADLINE), and COMMITS its logs +
# final checkpoint so a VM wipe cannot erase the results.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export MMPDE_LOCAL_KNN=1
mkdir -p logs models

DEADLINE=$(date -d '2026-08-20 12:00 UTC' +%s)
stamp() { date +%H:%M:%S; }
newest() { ls -dt "$@" 2>/dev/null | head -1; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
budget() {  # budget <planned_s> -> min(planned, remaining), 0 if < 300 left
    local r; r=$(remain)
    if [ "$r" -lt 300 ]; then echo 0; elif [ "$1" -lt "$r" ]; then echo "$1"
    else echo "$r"; fi
}

# commit only the named paths (never -A: the interactive session commits too)
ckpt_commit() {  # ckpt_commit <message> <path...>
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null
    git commit -q -m "$msg" -- "$@" 2>/dev/null && echo "[$(stamp)] committed: $msg"
}

if [ -f /tmp/r2d_chain.pid ] && kill -0 "$(cat /tmp/r2d_chain.pid)" 2>/dev/null; then
    echo "[$(stamp)] waiting for r2d chain (pid $(cat /tmp/r2d_chain.pid))"
    tail --pid="$(cat /tmp/r2d_chain.pid)" -f /dev/null 2>/dev/null || true
fi

echo "[$(stamp)] === stage 0: bench.py (device-resident scan-epoch path) ==="
timeout "$(budget 2400)" python bench.py > logs/r2c_bench.log 2>&1
echo "[$(stamp)] bench rc=$?"
tail -1 logs/r2c_bench.log
ckpt_commit "Fresh bench on the scan-epoch path (r2c stage 0)" logs/r2c_bench.log

echo "[$(stamp)] === stage 1: DMM cy, 150 Adam epochs (reference budget) ==="
timeout "$(budget 6600)" python dmm.py --experiment cy --train_sample_grid 1500 \
    --branch_layers 4,3 --trunk_layers 16,512 --epochs_adam 150 \
    --epochs_rf 1 --eval_every 25 --n_traj 100 --plot True \
    > logs/r2c_dmm_cy.log 2>&1
echo "[$(stamp)] stage 1 rc=$? (checkpoint: cy_checkpoint)"
grep "Test equ loss" logs/r2c_dmm_cy.log | tail -2
ckpt_commit "Full-budget cylinder DMM (150 Adam epochs); commit checkpoint" \
    cy_checkpoint logs/r2c_dmm_cy.log

echo "[$(stamp)] === stage 2: MM-PDE cy, 40 epochs, pushforward ==="
timeout "$(budget 6600)" python mmpde.py --experiment cy --base_resolution 30,2521 \
    --lr 6e-4 --num_epochs 40 --unrolling 1 --pushforward True \
    --residual_head True --n_traj 100 \
    > logs/r2c_mmpde_cy.log 2>&1
echo "[$(stamp)] stage 2 rc=$?"
grep "Mean Timestep Test Error" logs/r2c_mmpde_cy.log | tail -2
MM_CKPT=$(newest models/GNN_PDE_cy_meshTrue_*)
echo "MM-PDE cy checkpoint: $MM_CKPT"
timeout "$(budget 1800)" python scripts/eval_rollout.py "$MM_CKPT" --experiment cy \
    --base_resolution 30,2521 > logs/r2c_rollout_mmpde_cy.log 2>&1
echo "[$(stamp)] MM-PDE cy rollout rc=$?"
tail -1 logs/r2c_rollout_mmpde_cy.log
ckpt_commit "MM-PDE cy pushforward run + rollout (r2c stage 2)" \
    "$MM_CKPT" logs/r2c_mmpde_cy.log logs/r2c_rollout_mmpde_cy.log

echo "[$(stamp)] === stage 3: plain GNN cy, 40 epochs, pushforward ==="
timeout "$(budget 5400)" python mmpde.py --experiment cy --base_resolution 30,2521 \
    --lr 6e-4 --moving_mesh False --num_epochs 40 --unrolling 1 \
    --pushforward True --residual_head True --n_traj 100 \
    > logs/r2c_gnn_cy.log 2>&1
echo "[$(stamp)] stage 3 rc=$?"
grep "Mean Timestep Test Error" logs/r2c_gnn_cy.log | tail -2
GNN_CKPT=$(newest models/GNN_PDE_cy_meshFalse_*)
echo "GNN cy checkpoint: $GNN_CKPT"
timeout "$(budget 1800)" python scripts/eval_rollout.py "$GNN_CKPT" --experiment cy \
    --base_resolution 30,2521 > logs/r2c_rollout_gnn_cy.log 2>&1
echo "[$(stamp)] GNN cy rollout rc=$?"
tail -1 logs/r2c_rollout_gnn_cy.log
ckpt_commit "Plain-GNN cy pushforward run + rollout (r2c stage 3)" \
    "$GNN_CKPT" logs/r2c_gnn_cy.log logs/r2c_rollout_gnn_cy.log

echo "[$(stamp)] === chain done ==="
