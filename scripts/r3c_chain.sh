#!/bin/bash
# Round-3 third chain — runs after r3b releases the chip.
#   1. Finish the full-budget Burgers DMM (r3 stage 1 spent its budget on a
#      dataset regeneration that the committed 48^2 cache now eliminates;
#      the committed checkpoint stopped at epoch 29/150).
#   2. BaseCNN ablation (reference: mmpde.py --model BaseCNN): the one
#      reference experiment with no recorded number yet.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=$(date -d '2026-08-20 17:40 UTC' +%s)
stamp() { date +%H:%M:%S; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
tbudget() {
    local r=$(( $(remain) - 60 ))
    if [ "$r" -lt 1 ]; then echo 1
    elif [ "$1" -lt "$r" ]; then echo "$1"
    else echo "$r"; fi
}
have_time() { [ "$(remain)" -gt "${1:-600}" ]; }

ckpt_commit() {
    local msg="$1"; shift
    local paths=()
    for p in "$@"; do
        [ -n "$p" ] && [ -e "$p" ] && paths+=("$p")
    done
    if [ "${#paths[@]}" -eq 0 ]; then
        echo "[$(stamp)] commit SKIPPED (no paths exist): $msg"; return 1
    fi
    if git add -f "${paths[@]}" && git commit -q -m "$msg" -- "${paths[@]}"; then
        echo "[$(stamp)] committed: $msg"
    else
        echo "[$(stamp)] commit FAILED: $msg (paths: ${paths[*]})"
    fi
}

R3B_PID=$(cat /tmp/r3b_chain.pid 2>/dev/null || true)
if [ -n "${R3B_PID:-}" ] && kill -0 "$R3B_PID" 2>/dev/null; then
    echo "[$(stamp)] waiting for r3b chain (pid $R3B_PID)"
    while kill -0 "$R3B_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(stamp)] r3b done — starting r3c"

# ---- stage 1: full-budget Burgers DMM ----
if have_time 3000; then
    echo "[$(stamp)] === r3c stage 1: DMM Burgers 150 Adam + 2 RF ==="
    timeout "$(tbudget 8400)" python -u dmm.py --epochs_adam 150 \
        --epochs_rf 2 --eval_every 25 --n_traj 100 --plot True \
        --resume True > logs/r3c_dmm_burgers.log 2>&1
    echo "[$(stamp)] r3c stage 1 rc=$? ($(grep -c '^Epoch' logs/r3c_dmm_burgers.log) epochs)"
    grep "Test equ loss" logs/r3c_dmm_burgers.log | tail -1
    if [ "$(grep -c '^Epoch' logs/r3c_dmm_burgers.log)" -gt 29 ]; then
        ckpt_commit "Burgers DMM beyond epoch 29 (datagen tax gone); commit checkpoint" \
            burgers_checkpoint logs/r3c_dmm_burgers.log
    else
        ckpt_commit "r3c DMM log (no improvement over committed epoch-29 checkpoint)" \
            logs/r3c_dmm_burgers.log
    fi
fi

# ---- stage 2: BaseCNN ablation ----
if have_time 1500; then
    echo "[$(stamp)] === r3c stage 2: BaseCNN Burgers 20 epochs ==="
    timeout "$(tbudget 3600)" python -u mmpde.py --model BaseCNN \
        --num_epochs 20 --n_traj 100 > logs/r3c_basecnn.log 2>&1
    echo "[$(stamp)] r3c stage 2 rc=$?"
    grep "Mean Timestep" logs/r3c_basecnn.log | tail -2
    ckpt_commit "BaseCNN ablation run (r3c stage 2)" logs/r3c_basecnn.log
fi

echo "[$(stamp)] === r3c chain done ==="
