#!/bin/bash
# Full-scale Burgers training on the TPU chip: DMM pretraining, then the
# two-branch MM-PDE solver, then the plain-GNN ablation.  Epoch counts are
# scaled down from the reference defaults (150/80) to fit a round budget;
# raise them for full reproduction.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH}"

echo "=== 1/3 DMM pretraining (Burgers) ==="
python dmm.py --epochs_adam ${DMM_EPOCHS:-40} --train_sample_grid 1000 \
    --epochs_rf 2 --eval_every 10 --n_traj 100 --plot True \
    2>&1 | tee logs/full_dmm_burgers.log | tail -5

echo "=== 2/3 full MM-PDE (Burgers) ==="
python mmpde.py --lr 6e-4 --num_epochs ${MMPDE_EPOCHS:-10} \
    --inner_loops ${INNER:-8} --n_traj 100 \
    2>&1 | tee logs/full_mmpde_burgers.log | tail -5

echo "=== 3/3 plain GNN ablation (Burgers) ==="
python mmpde.py --lr 6e-4 --moving_mesh False \
    --num_epochs ${MMPDE_EPOCHS:-10} --inner_loops ${INNER:-8} --n_traj 100 \
    2>&1 | tee logs/full_gnn_burgers.log | tail -5

echo "=== summary ==="
grep -h "Mean Timestep Test Error" logs/full_mmpde_burgers.log | tail -3
grep -h "Mean Timestep Test Error" logs/full_gnn_burgers.log | tail -3
grep -h "Test equ loss" logs/full_dmm_burgers.log | tail -2
