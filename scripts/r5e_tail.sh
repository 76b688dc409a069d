#!/bin/bash
# r5e tail: wait for the manually-managed input_noise FT (PID in
# /tmp/r5e_ft.pid) to finish or hit the deadline, then rollout/one-step
# evals on its newest per-epoch checkpoint and commit everything.
# Usage: scripts/r5e_tail.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
DEADLINE=${1:-$(( $(date +%s) + 1800 ))}
CKPT=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-22-06-15-21
PID=$(cat /tmp/r5e_ft.pid 2>/dev/null || echo 0)
stamp() { date -u +%H:%M:%S; }
remain() { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 "$PID" 2>/dev/null; do
    if [ "$(remain)" -le 0 ]; then
        echo "[$(stamp)] deadline: killing trainer pid $PID (per-epoch ckpt stands)"
        kill "$PID" 2>/dev/null
        sleep 10
        break
    fi
    sleep 20
done
echo "[$(stamp)] trainer done; epochs=$(grep -c '^Epoch' logs/r5e_noise001_ft.log)"

BEST="$CKPT"; [ -e "$CKPT/best/state.msgpack" ] && BEST="$CKPT/best"
if [ -e "$BEST/state.msgpack" ] || [ -e "$CKPT/state.msgpack" ]; then
    timeout 900 python -u scripts/eval_rollout.py "$BEST" \
        > logs/r5e_noise001_rollout.log 2>&1
    echo "[$(stamp)] rollout rc=$? -> $(tail -1 logs/r5e_noise001_rollout.log)"
    timeout 600 python -u scripts/eval_rollout.py "$BEST" --one_step \
        > logs/r5e_noise001_onestep.log 2>&1
    echo "[$(stamp)] one-step rc=$? -> $(tail -1 logs/r5e_noise001_onestep.log)"
fi
git add -f "$CKPT" logs/r5e_noise001_ft.log logs/r5e_noise001_rollout.log \
    logs/r5e_noise001_onestep.log logs_r5e_chain.out 2>/dev/null
git commit -q -m "input_noise 0.01 undamped FT (40->55) + rollout/one-step evals (r5e)" \
    && echo "[$(stamp)] committed r5e noise cell"
echo "[$(stamp)] r5e tail done"
