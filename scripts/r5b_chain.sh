#!/bin/bash
# Round-5b chain — reprioritized over r5_chain.sh to match VERDICT r4's
# "next round" list (the scripted r5 chain would have spent the window on
# a second damp point before any of the top items).  Stages:
#   1. damp-0.5 fine-tune evals (closes the half-finished r5 stage 2)
#   2. step-time A/Bs on the unrolled default: fused_itp, bf16_itp, both
#      (VERDICT next-3; all prior A/Bs predate the unroll default)
#   3. refined scan+pushforward fault bisection (VERDICT next-2),
#      scripts/bisect2_scan_push.sh — bounded, runs alone
#   4. MM-PDE cy retrain on the FULL-budget (150-epoch) DMM at the
#      reference's 80-epoch default (VERDICT next-1), under the stall
#      watchdog (VERDICT next-6)
#   5. plain-GNN cy ablation resumed 40 -> 80 epochs (the other half of
#      the 80/80 head-to-head), under the watchdog
#   6. bench refresh + cache seed
#   7. optional: input-noise fine-tune at damp 0 (VERDICT next-4)
#   8. optional: 96x96 plain-GNN short run (VERDICT next-5)
# Usage: scripts/r5b_chain.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
DEADLINE=${1:-$(( $(date +%s) + 25200 ))}
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
solver_ckpt() { grep -oE '^models/[^ ]+' "$1" 2>/dev/null | tail -1; }

evals() {  # evals CKPT tag extra-rollout-flags...
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

# ---- wait for any live dmm.py/mmpde.py to release the chip ----
while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

# ---- stage 1: damp-0.5 FT evals (the FT itself ran under r5_chain) ----
FT05=$(solver_ckpt logs/r5_bdamp05_ft.log)
if [ -n "$FT05" ] && [ -e "$FT05/state.msgpack" ] \
       && [ ! -s logs/r5b_bd05_rollout.log ]; then
    echo "[$(stamp)] === stage 1: damp-0.5 FT evals ($FT05) ==="
    evals "$FT05" bd05 --branch_damp 0.5
    ckpt_commit "Damp-sweep 0.5 fine-tune + evals (r5b stage 1)" \
        "$FT05" logs/r5_bdamp05_ft.log logs/r5b_bd05_rollout.log \
        logs/r5b_bd05_onestep.log
fi

# ---- stage 2: A/B ladder on the unrolled default ----
ab() {
    local tag="$1"; shift
    [ -s "logs/r5b_ab_${tag}.log" ] && return
    have_time 1200 || { echo "[$(stamp)] SKIP A/B $tag"; return; }
    echo "[$(stamp)] === stage 2: A/B $tag ==="
    timeout "$(tbudget 2400)" env "$@" python -u bench.py --step-only \
        > "logs/r5b_ab_${tag}.log" 2>&1
    local rc=$?
    echo "[$(stamp)] A/B $tag rc=$rc -> $(tail -1 "logs/r5b_ab_${tag}.log")"
    ckpt_commit "A/B $tag step time on unrolled default (r5b stage 2)" \
        "logs/r5b_ab_${tag}.log"
}
ab fused_itp MMPDE_FUSED_ITP=1
ab bf16_itp MMPDE_BF16_ITP=1
ab fused_bf16_itp MMPDE_FUSED_ITP=1 MMPDE_BF16_ITP=1

# ---- stage 3: refined fault bisection (bounded, alone on the chip) ----
if [ ! -s logs/bisect2_t0.log ] && have_time 3000; then
    echo "[$(stamp)] === stage 3: scan+push bisection (bisect2) ==="
    bash scripts/bisect2_scan_push.sh $(( $(date +%s) + $(tbudget 5400) ))
fi

# ---- stage 4: MM-PDE cy on the 150-epoch DMM, 80-epoch budget ----
CY80_LOG=logs/r5b_mmpde_cy80.log
if [ ! -s "$CY80_LOG" ] && have_time 5400; then
    echo "[$(stamp)] === stage 4: MM-PDE cy 80 epochs x full-budget DMM ==="
    # ONE LINE: this string becomes a bash -c command inside watchdog_run —
    # an embedded newline splits it into separate (broken) commands
    CY_FLAGS="--experiment cy --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch False"
    # shellcheck disable=SC2086
    bash scripts/watchdog_run.sh "$CY80_LOG" "$(tbudget 16200)" \
        "python -u mmpde.py $CY_FLAGS" \
        "python -u mmpde.py $CY_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] cy80 watchdog rc=$rc epochs=$(grep -c '^Epoch' "$CY80_LOG")"
    c=$(solver_ckpt "$CY80_LOG")
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        evals "$c" cy80 --experiment cy --base_resolution 30,2521
        ckpt_commit "MM-PDE cy at the reference 80-epoch budget x 150-epoch DMM + evals (r5b stage 4)" \
            "$c" "$CY80_LOG" logs/r5b_cy80_rollout.log logs/r5b_cy80_onestep.log
    else
        ckpt_commit "r5b cy80 log (no checkpoint)" "$CY80_LOG"
    fi
fi

# ---- stage 5: plain-GNN cy ablation 40 -> 80 epochs ----
PLAIN40=models/GNN_PDE_cy_meshFalse_xresolution30-2521_n35_knn_tw1_unrolling1_time08-20-04-51-06
PLAIN_LOG=logs/r5b_gnn_cy80.log
if [ ! -s "$PLAIN_LOG" ] && [ -e "$PLAIN40/state.msgpack" ] && have_time 3600; then
    echo "[$(stamp)] === stage 5: plain-GNN cy resume 40 -> 80 ==="
    # ONE LINE (see CY_FLAGS note)
    PLAIN_FLAGS="--experiment cy --moving_mesh False --base_resolution 30,2521 --lr 6e-4 --num_epochs 80 --unrolling 1 --pushforward True --residual_head True --n_traj 100 --scan_epoch True"
    # shellcheck disable=SC2086
    bash scripts/watchdog_run.sh "$PLAIN_LOG" "$(tbudget 9000)" \
        "python -u mmpde.py $PLAIN_FLAGS --resume $PLAIN40" \
        "python -u mmpde.py $PLAIN_FLAGS --resume {CKPT}"
    rc=$?
    echo "[$(stamp)] plain cy80 watchdog rc=$rc epochs=$(grep -c '^Epoch' "$PLAIN_LOG")"
    c=$(solver_ckpt "$PLAIN_LOG")
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        evals "$c" gnn_cy80 --experiment cy --base_resolution 30,2521
        ckpt_commit "plain-GNN cy ablation at the 80-epoch budget + evals (r5b stage 5)" \
            "$c" "$PLAIN_LOG" logs/r5b_gnn_cy80_rollout.log logs/r5b_gnn_cy80_onestep.log
    else
        ckpt_commit "r5b plain cy80 log (no checkpoint)" "$PLAIN_LOG"
    fi
fi

# ---- stage 6: bench refresh + cache seed ----
if [ ! -s logs/r5b_bench.log ] && have_time 900; then
    echo "[$(stamp)] === stage 6: bench refresh ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r5b_bench.log 2>&1
    rc=$?
    echo "[$(stamp)] bench rc=$rc -> $(tail -1 logs/r5b_bench.log)"
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench .jax_cache_seed
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
        cp -n .jax_cache/* .jax_cache_seed/ 2>/dev/null
    fi
    ckpt_commit "r5b bench refresh + cache seed" logs/r5b_bench.log \
        .jax_cache_bench .jax_cache_seed
fi

# ---- stage 7 (optional): input-noise fine-tune at damp 0 ----
FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40
if [ ! -s logs/r5b_inoise_ft.log ] && have_time 4500; then
    echo "[$(stamp)] === stage 7: input-noise 0.01 fine-tune (damp 0) ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --lr 6e-4 --num_epochs 55 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch False --input_noise 0.01 --resume "$FLAG39" \
        > logs/r5b_inoise_ft.log 2>&1
    rc=$?
    echo "[$(stamp)] inoise FT rc=$rc epochs=$(grep -c '^Epoch' logs/r5b_inoise_ft.log)"
    c=$(solver_ckpt logs/r5b_inoise_ft.log)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        evals "$c" inoise
        ckpt_commit "Input-noise 0.01 fine-tune at damp 0 + evals (r5b stage 7)" \
            "$c" logs/r5b_inoise_ft.log logs/r5b_inoise_rollout.log \
            logs/r5b_inoise_onestep.log
    else
        ckpt_commit "r5b input-noise FT log (no checkpoint)" logs/r5b_inoise_ft.log
    fi
fi

# ---- stage 8 (optional): 96x96 plain-GNN short run ----
if [ ! -s logs/r5b_gnn96.log ] && have_time 3600; then
    echo "[$(stamp)] === stage 8: 96x96 plain-GNN short run ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --moving_mesh False \
        --base_resolution 31,96,96 --num_epochs 5 --n_traj 50 \
        --pushforward True --residual_head True --unrolling 1 \
        --scan_epoch True > logs/r5b_gnn96.log 2>&1
    rc=$?
    echo "[$(stamp)] gnn96 rc=$rc epochs=$(grep -c '^Epoch' logs/r5b_gnn96.log)"
    c=$(solver_ckpt logs/r5b_gnn96.log)
    ckpt_commit "96x96 plain-GNN short run beyond the reference's hard-coded 48 (r5b stage 8)" \
        "$c" logs/r5b_gnn96.log
fi

echo "[$(stamp)] === r5b chain done ==="
