#!/bin/bash
# Round-5e (final continuation window): the last un-run VERDICT item —
# the --input_noise rollout stabilizer (VERDICT r4 next-step 4).
#   1. Fine-tune the UNDAMPED flagship burgers solver (epoch 39 base,
#      same base checkpoint as the damp-0.5/0.75 FTs for a clean A/B)
#      with --input_noise 0.01 and train_branch_damp 0, 40 -> 55 epochs
#      under the stall watchdog.  input_noise>0 is a NEW program shape
#      (the noise add is traced into train_step) so the first step pays
#      a cold remote compile — the warmup stall threshold covers it.
#   2. Rollout + one-step evals on whatever epoch it reached (per-epoch
#      checkpoints; eval programs are cached so evals are cheap).
#   3. Optional second noise level (0.05) with any remaining budget.
# Usage: scripts/r5e_chain.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
DEADLINE=${1:-$(( $(date +%s) + 3300 ))}
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
    timeout "$(tbudget 900)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        > "logs/r5e_${tag}_rollout.log" 2>&1
    local rc=$?
    echo "[$(stamp)] $tag rollout rc=$rc -> $(tail -1 "logs/r5e_${tag}_rollout.log")"
    timeout "$(tbudget 600)" python -u scripts/eval_rollout.py "$BEST" "$@" \
        --one_step > "logs/r5e_${tag}_onestep.log" 2>&1
    rc=$?
    echo "[$(stamp)] $tag one-step rc=$rc -> $(tail -1 "logs/r5e_${tag}_onestep.log")"
}

while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

BASE=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40
# ONE LINE (chain invariant): embedded newlines split the watchdog's bash -c command.
FT_FLAGS="--experiment burgers --lr 6e-4 --num_epochs 55 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch False --train_branch_damp 0 --input_noise 0.01"

run_noise_cell() {  # run_noise_cell <noise> <tag> <budget_s>
    local noise="$1" tag="$2" budget="$3"
    local flags="${FT_FLAGS/--input_noise 0.01/--input_noise $noise}"
    echo "[$(stamp)] === input_noise $noise FT (40 -> 55, undamped) ==="
    bash scripts/watchdog_run.sh "logs/r5e_${tag}_ft.log" "$(tbudget "$budget")" \
        "python -u mmpde.py $flags --resume $BASE" \
        "python -u mmpde.py $flags --resume {CKPT}"
    local rc=$?
    echo "[$(stamp)] $tag watchdog rc=$rc epochs=$(grep -c '^Epoch' "logs/r5e_${tag}_ft.log")"
    local c
    c=$(grep -oE '^models/[^ ]+' "logs/r5e_${tag}_ft.log" 2>/dev/null | tail -1)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        evals "$c" "$tag"
        ckpt_commit "input_noise $noise undamped FT + rollout/one-step evals (r5e)" \
            "$c" "logs/r5e_${tag}_ft.log" "logs/r5e_${tag}_rollout.log" \
            "logs/r5e_${tag}_onestep.log"
    else
        ckpt_commit "input_noise $noise FT cell: no checkpoint reached (r5e, rc=$rc)" \
            "logs/r5e_${tag}_ft.log"
    fi
}

run_noise_cell 0.01 noise001 2400
# 0.05 is a different traced constant -> ANOTHER cold compile; only start
# it with enough budget to plausibly reach a checkpoint.
if have_time 2100; then
    run_noise_cell 0.05 noise005 2000
fi
echo "[$(stamp)] === r5e chain done ==="
