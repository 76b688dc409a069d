#!/bin/bash
# Round-6 opportunistic chain: every remaining ROADMAP follow-on, ordered
# by information-per-minute, each cell independently guarded so any chip
# window size yields a clean prefix.  COLD-COMPILE WARNING: cells 2-5 are
# all NEW program shapes (not in the committed cache seeds) — each first
# step pays a 10-60 min remote compile; budgets below include it.
#   0. (CPU) ensure data/burgers_96.npy exists (JAX_PLATFORMS=cpu, no chip)
#   1. bisect3 g2 discriminator: --neighbors 16 at full mesh — decides
#      edge-count vs node-count threshold for DIVERGENCES #41
#   2. input_noise 0.05 undamped FT cell (r5e ran 0.01)
#   3. throughput cells batch 24/48 (scripts/r5d_throughput.sh)
#   4. 96^2 plain-GNN short run (VERDICT r4 next-step 5)
# Usage: scripts/r6_chain.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
DEADLINE=${1:-$(( $(date +%s) + 14400 ))}
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

while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

# ---- 0. 96^2 data (CPU-only; ~15 min; skipped if present) ----
if [ ! -e data/burgers_96.npy ] && have_time 5400; then
    echo "[$(stamp)] === 0: generate burgers_96 cache (CPU) ==="
    timeout "$(tbudget 1800)" env JAX_PLATFORMS=cpu \
        python -u scripts/cache_burgers_96.py 50 > logs/r6_gen96.log 2>&1
    echo "[$(stamp)] gen96 rc=$? -> $(tail -1 logs/r6_gen96.log)"
    ckpt_commit "96^2 Burgers cache generated (subsampled from 192^2, r6 stage 0)" \
        logs/r6_gen96.log
fi

# ---- 1. bisect3 g2: half edge count at full mesh ----
if [ ! -s logs/bisect3_g2_half_edges.log ] && have_time 2700; then
    echo "[$(stamp)] === 1: bisect3 g2_half_edges (--neighbors 16) ==="
    timeout "$(tbudget 2400)" env MMPDE_FORCE_SCAN_PUSH=1 python -u mmpde.py \
        --num_epochs 2 --scan_epoch True --pushforward True \
        --residual_head True --neighbors 16 \
        > logs/bisect3_g2_half_edges.log 2>&1
    rc=$?
    ep=$(grep -c 'Mean Timestep Test Error' logs/bisect3_g2_half_edges.log)
    v=CRASH; [ "$ep" -ge 2 ] && v=PASS
    [ "$rc" -eq 124 ] && [ "$ep" -lt 2 ] && v=TIMEOUT-INCONCLUSIVE
    echo "[$(stamp)] g2 rc=$rc epochs=$ep -> $v"
    ckpt_commit "bisect3 g2 (half edge count) verdict: $v — DIVERGENCES #41 discriminator" \
        logs/bisect3_g2_half_edges.log
fi

# ---- 2. input_noise 0.05 cell ----
BASE=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40
N05_FLAGS="--experiment burgers --lr 6e-4 --num_epochs 55 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch False --train_branch_damp 0 --input_noise 0.05"
if [ ! -s logs/r6_noise005_ft.log ] && [ -e "$BASE/state.msgpack" ] && have_time 4500; then
    echo "[$(stamp)] === 2: input_noise 0.05 FT (40 -> 55, undamped) ==="
    bash scripts/watchdog_run.sh logs/r6_noise005_ft.log "$(tbudget 4200)" \
        "python -u mmpde.py $N05_FLAGS --resume $BASE" \
        "python -u mmpde.py $N05_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] noise005 watchdog rc=$rc epochs=$(grep -c '^Epoch' logs/r6_noise005_ft.log)"
    c=$(grep -oE '^models/[^ ]+' logs/r6_noise005_ft.log 2>/dev/null | tail -1)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        B="$c"; [ -e "$c/best/state.msgpack" ] && B="$c/best"
        timeout "$(tbudget 900)" python -u scripts/eval_rollout.py "$B" \
            > logs/r6_noise005_rollout.log 2>&1
        echo "[$(stamp)] rollout rc=$? -> $(tail -1 logs/r6_noise005_rollout.log)"
        timeout "$(tbudget 600)" python -u scripts/eval_rollout.py "$B" --one_step \
            > logs/r6_noise005_onestep.log 2>&1
        echo "[$(stamp)] one-step rc=$? -> $(tail -1 logs/r6_noise005_onestep.log)"
        ckpt_commit "input_noise 0.05 undamped FT + evals (r6 stage 2)" "$c" \
            logs/r6_noise005_ft.log logs/r6_noise005_rollout.log logs/r6_noise005_onestep.log
    else
        ckpt_commit "input_noise 0.05 cell: no checkpoint reached (r6, rc=$rc)" \
            logs/r6_noise005_ft.log
    fi
fi

# ---- 3. throughput cells (their own script; 2 cold compiles) ----
if [ ! -s logs/r5d_tp_b48.log ] && have_time 4200; then
    echo "[$(stamp)] === 3: throughput cells batch 24/48 ==="
    CELL_TIMEOUT_S=$(tbudget 1900) bash scripts/r5d_throughput.sh
fi

# ---- 4. 96^2 plain-GNN short run ----
G96_FLAGS="--experiment burgers --moving_mesh False --base_resolution 31,96,96 --lr 6e-4 --num_epochs 8 --unrolling 1 --pushforward True --residual_head True --n_traj 50 --scan_epoch True"
if [ ! -s logs/r6_gnn96.log ] && [ -e data/burgers_96.npy ] && have_time 5400; then
    echo "[$(stamp)] === 4: 96^2 plain-GNN short run ==="
    bash scripts/watchdog_run.sh logs/r6_gnn96.log "$(tbudget 5100)" \
        "python -u mmpde.py $G96_FLAGS" \
        "python -u mmpde.py $G96_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] gnn96 watchdog rc=$rc epochs=$(grep -c '^Epoch' logs/r6_gnn96.log)"
    c=$(grep -oE '^models/[^ ]+' logs/r6_gnn96.log 2>/dev/null | tail -1)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        B="$c"; [ -e "$c/best/state.msgpack" ] && B="$c/best"
        timeout "$(tbudget 900)" python -u scripts/eval_rollout.py "$B" \
            --experiment burgers --base_resolution 31,96,96 --one_step \
            > logs/r6_gnn96_onestep.log 2>&1
        echo "[$(stamp)] 96 one-step rc=$? -> $(tail -1 logs/r6_gnn96_onestep.log)"
        ckpt_commit "96^2 plain-GNN trained artifact + one-step eval (r6 stage 4)" \
            "$c" logs/r6_gnn96.log logs/r6_gnn96_onestep.log
    else
        ckpt_commit "96^2 cell: no checkpoint reached (r6, rc=$rc)" logs/r6_gnn96.log
    fi
fi
echo "[$(stamp)] === r6 chain done ==="
