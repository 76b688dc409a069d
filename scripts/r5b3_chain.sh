#!/bin/bash
# Round-5b3: takeover of r5b stages 4-6 after the cy80 run hit the known
# TPU-side hang at epoch 16 (third occurrence of the r3f/r4c pattern).
# The r5b chain's fixed deadline (03:03) would have strangled stage 5
# after the 40-min watchdog threshold + resume; this script restarts the
# management with an explicit deadline and resumes cy80 immediately.
#   A. resume MM-PDE cy (80-epoch x 150-DMM) from its last per-epoch
#      checkpoint under the stall watchdog, then evals + commit
#   B. plain-GNN cy ablation 40 -> 80 under the watchdog, evals + commit
#   C. bench refresh (no cache-seed copy — final round, repo at 4 GiB)
# Usage: scripts/r5b3_chain.sh <cy80_ckpt> [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
CY80CKPT="$1"
DEADLINE=${2:-$(( $(date +%s) + 14400 ))}
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
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        > "logs/r5b_${tag}_rollout.log" 2>&1
    local rc=$?
    echo "[$(stamp)] $tag rollout rc=$rc -> $(tail -1 "logs/r5b_${tag}_rollout.log")"
    timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        --one_step > "logs/r5b_${tag}_onestep.log" 2>&1
    rc=$?
    echo "[$(stamp)] $tag one-step rc=$rc -> $(tail -1 "logs/r5b_${tag}_onestep.log")"
}

while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

# ---- A. resume cy80 ----
CY_FLAGS="--experiment cy --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch False"
done_epochs() {
    python - "$CY80CKPT" <<'EOF' 2>/dev/null || echo 0
import json, sys
print(json.load(open(sys.argv[1] + '/config.json')).get('epoch', 0))
EOF
}
if [ -e "$CY80CKPT/state.msgpack" ] && have_time 1800; then
    echo "[$(stamp)] === A: cy80 resume from epoch $(done_epochs) ($CY80CKPT) ==="
    STALL_S=1500 bash scripts/watchdog_run.sh logs/r5b_mmpde_cy80b.log \
        "$(tbudget 10800)" \
        "python -u mmpde.py $CY_FLAGS --resume $CY80CKPT" \
        "python -u mmpde.py $CY_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] cy80 resume watchdog rc=$rc"
fi
c=$(grep -oE '^models/[^ ]+' logs/r5b_mmpde_cy80b.log 2>/dev/null | tail -1)
[ -n "$c" ] && [ -e "$c/state.msgpack" ] || c="$CY80CKPT"
if [ -e "$c/state.msgpack" ]; then
    evals "$c" cy80 --experiment cy --base_resolution 30,2521
    ckpt_commit "MM-PDE cy at the reference 80-epoch budget x 150-epoch DMM + evals (r5b3 A)" \
        "$c" logs/r5b_mmpde_cy80.log logs/r5b_mmpde_cy80b.log \
        logs/r5b_cy80_rollout.log logs/r5b_cy80_onestep.log
fi

# ---- B. plain-GNN cy 40 -> 80 ----
PLAIN40=models/GNN_PDE_cy_meshFalse_xresolution30-2521_n35_knn_tw1_unrolling1_time08-20-04-51-06
PLAIN_FLAGS="--experiment cy --moving_mesh False --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch True"
if [ ! -s logs/r5b_gnn_cy80.log ] && [ -e "$PLAIN40/state.msgpack" ] && have_time 2400; then
    echo "[$(stamp)] === B: plain-GNN cy resume 40 -> 80 ==="
    STALL_S=1500 bash scripts/watchdog_run.sh logs/r5b_gnn_cy80.log \
        "$(tbudget 7200)" \
        "python -u mmpde.py $PLAIN_FLAGS --resume $PLAIN40" \
        "python -u mmpde.py $PLAIN_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] plain cy80 watchdog rc=$rc epochs=$(grep -c '^Epoch' logs/r5b_gnn_cy80.log)"
    pc=$(grep -oE '^models/[^ ]+' logs/r5b_gnn_cy80.log | tail -1)
    if [ -n "$pc" ] && [ -e "$pc/state.msgpack" ]; then
        evals "$pc" gnn_cy80 --experiment cy --base_resolution 30,2521
        ckpt_commit "plain-GNN cy ablation at the 80-epoch budget + evals (r5b3 B)" \
            "$pc" logs/r5b_gnn_cy80.log logs/r5b_gnn_cy80_rollout.log \
            logs/r5b_gnn_cy80_onestep.log
    else
        ckpt_commit "r5b3 plain cy80 log (no checkpoint)" logs/r5b_gnn_cy80.log
    fi
fi

# ---- C. bench refresh ----
if [ ! -s logs/r5b_bench.log ] && have_time 700; then
    echo "[$(stamp)] === C: bench refresh ==="
    timeout "$(tbudget 1800)" python -u bench.py > logs/r5b_bench.log 2>&1
    rc=$?
    echo "[$(stamp)] bench rc=$rc -> $(tail -1 logs/r5b_bench.log)"
    ckpt_commit "r5b3 bench refresh" logs/r5b_bench.log
fi
echo "[$(stamp)] === r5b3 chain done ==="
