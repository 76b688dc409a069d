#!/bin/bash
# Round-5d (final-round window): close VERDICT r4 gap #1 — the cylinder
# head-to-head at the reference's FULL 80-epoch budget, trained against
# the full-budget (150-epoch) cy DMM — plus the flagged A/B cell re-run.
# The r5b attempt hit the third TPU-side hang at epoch 16 and its
# checkpoint died with that VM, so this restarts from the committed
# 40-epoch flagship (epochs 40-79 see the 150-epoch DMM mesh, which is
# the newer/better mesh mover; recorded as such in RESULTS).
# Priority order (one chip, wall-bounded):
#   1. fused+bf16 A/B re-run (fixes the bogus 0.78 ms cell, ~6 min)
#   2. MM-PDE cy 40 -> 80 under the stall watchdog, evals, commit
#   3. plain-GNN cy 40 -> as far as the window allows (per-epoch test
#      error gives its learning curve even if it stops short), evals
#   4. tail fillers if time: bisect3 body-size probe, bench refresh
# Usage: scripts/r5d_chain.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
DEADLINE=${1:-$(( $(date +%s) + 9600 ))}
stamp() { date -u +%H:%M:%S; }
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
    for p in "$@"; do [ -n "$p" ] && [ -e "$p" ] && paths+=("$p"); done
    [ "${#paths[@]}" -eq 0 ] && { echo "[$(stamp)] commit SKIPPED: $msg"; return 1; }
    git add -f "${paths[@]}" && git commit -q -m "$msg" -- "${paths[@]}" \
        && echo "[$(stamp)] committed: $msg"
}
evals() {
    local c="$1" tag="$2"; shift 2
    local BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
    timeout "$(tbudget 1500)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        > "logs/r5d_${tag}_rollout.log" 2>&1
    local rc=$?
    echo "[$(stamp)] $tag rollout rc=$rc -> $(tail -1 "logs/r5d_${tag}_rollout.log")"
    timeout "$(tbudget 1200)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        --one_step > "logs/r5d_${tag}_onestep.log" 2>&1
    rc=$?
    echo "[$(stamp)] $tag one-step rc=$rc -> $(tail -1 "logs/r5d_${tag}_onestep.log")"
}

while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

# ---- 1. A/B fused+bf16 re-run ----
if [ ! -s logs/r5d_ab_fused_bf16_itp.log ] && have_time 500; then
    echo "[$(stamp)] === 1: A/B fused_bf16_itp re-run ==="
    timeout "$(tbudget 900)" env MMPDE_FUSED_ITP=1 MMPDE_BF16_ITP=1 \
        python -u bench.py --step-only > logs/r5d_ab_fused_bf16_itp.log 2>&1
    rc=$?
    echo "[$(stamp)] A/B rc=$rc -> $(tail -1 logs/r5d_ab_fused_bf16_itp.log)"
    ckpt_commit "A/B fused+bf16 itp cell re-run (replaces the r5b measurement artifact)" \
        logs/r5d_ab_fused_bf16_itp.log
fi

# ---- 2. MM-PDE cy 40 -> 80 (flagship at the reference budget) ----
MOVE40=models/GNN_PDE_cy_meshTrue_xresolution30-2521_n35_knn_tw1_unrolling1_time08-21-14-21-51
CY_FLAGS="--experiment cy --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch False"
if [ ! -s logs/r5d_mmpde_cy80.log ] && [ -e "$MOVE40/state.msgpack" ] && have_time 1500; then
    echo "[$(stamp)] === 2: MM-PDE cy 40 -> 80 ==="
    STALL_S=1200 bash scripts/watchdog_run.sh logs/r5d_mmpde_cy80.log \
        "$(tbudget 6600)" \
        "python -u mmpde.py $CY_FLAGS --resume $MOVE40" \
        "python -u mmpde.py $CY_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] cy80 watchdog rc=$rc epochs=$(grep -c '^Epoch' logs/r5d_mmpde_cy80.log)"
fi
c=$(grep -oE '^models/[^ ]+' logs/r5d_mmpde_cy80.log 2>/dev/null | tail -1)
if [ -n "$c" ] && [ -e "$c/state.msgpack" ] && [ ! -s logs/r5d_cy80_rollout.log ]; then
    evals "$c" cy80 --experiment cy --base_resolution 30,2521
    ckpt_commit "MM-PDE cy at the reference 80-epoch budget x 150-epoch DMM + evals (r5d 2)" \
        "$c" logs/r5d_mmpde_cy80.log logs/r5d_cy80_rollout.log logs/r5d_cy80_onestep.log
elif [ -s logs/r5d_mmpde_cy80.log ]; then
    ckpt_commit "r5d cy80 log" logs/r5d_mmpde_cy80.log
fi

# ---- 3. plain-GNN cy 40 -> 80 (as far as the window allows) ----
PLAIN40=models/GNN_PDE_cy_meshFalse_xresolution30-2521_n35_knn_tw1_unrolling1_time08-20-04-51-06
PLAIN_FLAGS="--experiment cy --moving_mesh False --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch True"
if [ ! -s logs/r5d_gnn_cy80.log ] && [ -e "$PLAIN40/state.msgpack" ] && have_time 1200; then
    echo "[$(stamp)] === 3: plain-GNN cy 40 -> 80 ==="
    STALL_S=1200 bash scripts/watchdog_run.sh logs/r5d_gnn_cy80.log \
        "$(tbudget $(( $(remain) - 1500 )))" \
        "python -u mmpde.py $PLAIN_FLAGS --resume $PLAIN40" \
        "python -u mmpde.py $PLAIN_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] plain cy80 watchdog rc=$rc epochs=$(grep -c '^Epoch' logs/r5d_gnn_cy80.log)"
fi
pc=$(grep -oE '^models/[^ ]+' logs/r5d_gnn_cy80.log 2>/dev/null | tail -1)
if [ -n "$pc" ] && [ -e "$pc/state.msgpack" ] && [ ! -s logs/r5d_gnn_cy80_rollout.log ]; then
    evals "$pc" gnn_cy80 --experiment cy --base_resolution 30,2521
    ckpt_commit "plain-GNN cy ablation pushed toward the 80-epoch budget + evals (r5d 3)" \
        "$pc" logs/r5d_gnn_cy80.log logs/r5d_gnn_cy80_rollout.log logs/r5d_gnn_cy80_onestep.log
elif [ -s logs/r5d_gnn_cy80.log ]; then
    ckpt_commit "r5d plain cy80 log" logs/r5d_gnn_cy80.log
fi

# ---- 4. tail fillers ----
if [ ! -s logs/bisect3_g1_half_width.log ] && have_time 1500; then
    echo "[$(stamp)] === 4a: bisect3 body-size probe ==="
    timeout "$(tbudget 2000)" bash scripts/bisect3_bodysize.sh > logs/r5d_bisect3.log 2>&1
    rc=$?
    echo "[$(stamp)] bisect3 rc=$rc"
    ckpt_commit "bisect3 body-size probe driver log (r5d tail)" logs/r5d_bisect3.log
fi
if [ ! -s logs/r5d_bench.log ] && have_time 600; then
    echo "[$(stamp)] === 4b: bench refresh ==="
    timeout "$(tbudget 900)" python -u bench.py > logs/r5d_bench.log 2>&1
    rc=$?
    echo "[$(stamp)] bench rc=$rc -> $(tail -1 logs/r5d_bench.log)"
    ckpt_commit "r5d bench refresh" logs/r5d_bench.log
fi
echo "[$(stamp)] === r5d chain done ==="
