#!/bin/bash
# Round-5 chain (ROADMAP round-5 candidates).  Stages:
#   1. cy DMM -> the FULL reference 150-Adam-epoch budget + RF refit
#      (resume loop; per-epoch checkpoints make every pass durable)
#   2. damped-training sweep: train_branch_damp in {0.5, 0.85} fine-tunes
#      from the epoch-39 flagship + rollout/one-step evals (the 0.75 FT
#      from r4c is the comparison row)
#   3. step-time A/B: unroll+fused_itp (the last unmeasured combo)
#   4. bench refresh + cache seeding
# Usage: scripts/r5_chain.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=${1:-$(( $(date +%s) + 36000 ))}
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

solver_ckpt() { grep '^models/' "$1" 2>/dev/null | tail -1; }
dmm_epochs() {
    python - "$1" <<'EOF' 2>/dev/null || echo 0
import json, sys
print(len(json.load(open(sys.argv[1] + '/config.json'))['test_equ_losses']))
EOF
}

FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40

# ---- wait for any live dmm.py/mmpde.py to release the chip ----
while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 120
done

# ---- stage 1: cy DMM to the full reference budget (resume loop) ----
pass=0
while [ "$(dmm_epochs cy_checkpoint)" -lt 150 ] && have_time 1200 \
      && [ "$pass" -lt 6 ]; do
    pass=$((pass + 1))
    e0=$(dmm_epochs cy_checkpoint)
    echo "[$(stamp)] === stage 1 pass $pass: cy DMM resume from epoch $e0 ==="
    timeout "$(tbudget 7200)" python -u dmm.py --experiment cy \
        --train_sample_grid 1500 --branch_layers 4,3 --trunk_layers 16,512 \
        --epochs_adam 150 --epochs_rf 1 --eval_every 25 --n_traj 100 \
        --plot True --resume True > "logs/r5_dmm_cy_p${pass}.log" 2>&1
    rc=$?
    e1=$(dmm_epochs cy_checkpoint)
    echo "[$(stamp)] pass $pass rc=$rc epochs $e0 -> $e1"
    [ "$e1" -gt "$e0" ] || break   # no progress: stop instead of spinning
    ckpt_commit "cy DMM resumed to epoch $e1/150 (r5 stage 1 pass $pass)" \
        cy_checkpoint "logs/r5_dmm_cy_p${pass}.log" cy
done
if [ "$(dmm_epochs cy_checkpoint)" -ge 150 ]; then
    echo "[$(stamp)] cy DMM at FULL reference budget (150 Adam + RF)"
fi

# ---- stage 2: damped-training sweep {0.5, 0.85} ----
damp_ft() {
    local d="$1" tag="$2"
    have_time 2700 || { echo "[$(stamp)] SKIP damp FT $d"; return; }
    echo "[$(stamp)] === stage 2: train_branch_damp $d fine-tune ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --lr 6e-4 \
        --num_epochs 55 --unrolling 1 --pushforward True \
        --residual_head True --n_traj 100 --scan_epoch False \
        --train_branch_damp "$d" --resume "$FLAG39" \
        > "logs/r5_bdamp${tag}_ft.log" 2>&1
    local rc=$?
    echo "[$(stamp)] ft $d rc=$rc ($(grep -c '^Epoch' "logs/r5_bdamp${tag}_ft.log") epochs)"
    local c; c=$(solver_ckpt "logs/r5_bdamp${tag}_ft.log")
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        local BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" \
            --branch_damp "$d" > "logs/r5_bdamp${tag}_rollout.log" 2>&1
        echo "[$(stamp)] rollout -> $(tail -1 "logs/r5_bdamp${tag}_rollout.log")"
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" \
            --branch_damp "$d" --one_step \
            > "logs/r5_bdamp${tag}_onestep.log" 2>&1
        echo "[$(stamp)] one-step -> $(tail -1 "logs/r5_bdamp${tag}_onestep.log")"
        ckpt_commit "Damp-sweep fine-tune train_branch_damp=$d + evals (r5 stage 2)" \
            "$c" "logs/r5_bdamp${tag}_ft.log" \
            "logs/r5_bdamp${tag}_rollout.log" "logs/r5_bdamp${tag}_onestep.log"
    else
        ckpt_commit "r5 damp FT $d log (no checkpoint)" "logs/r5_bdamp${tag}_ft.log"
    fi
}
damp_ft 0.5 05
damp_ft 0.85 085

# ---- stage 3: A/B unroll+fused_itp (unroll is default-on now) ----
if [ ! -s logs/r5_ab_unroll_fused_itp.log ] && have_time 1500; then
    echo "[$(stamp)] === stage 3: A/B unroll+fused_itp ==="
    timeout "$(tbudget 3600)" env MMPDE_FUSED_ITP=1 python -u bench.py \
        --step-only > logs/r5_ab_unroll_fused_itp.log 2>&1
    rc=$?
    echo "[$(stamp)] rc=$rc -> $(tail -1 logs/r5_ab_unroll_fused_itp.log)"
    ckpt_commit "A/B unroll+fused_itp step time (r5 stage 3)" \
        logs/r5_ab_unroll_fused_itp.log
fi

# ---- stage 3b (optional): cy solver retrain on the 150-epoch DMM ----
# the r4d cy head-to-head (one-step 9.92e-4, rollout 0.660) froze the
# 76-epoch cy DMM; a full-budget DMM may push both further
if [ "$(dmm_epochs cy_checkpoint)" -ge 150 ] && have_time 7200; then
    echo "[$(stamp)] === stage 3b: MM-PDE cy retrain on full-budget DMM ==="
    timeout "$(tbudget 7200)" python -u mmpde.py --experiment cy \
        --base_resolution 30,2521 --lr 6e-4 --num_epochs 40 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch False > logs/r5_mmpde_cy_dmm150.log 2>&1
    rc=$?
    echo "[$(stamp)] rc=$rc ($(grep -c '^Epoch' logs/r5_mmpde_cy_dmm150.log) epochs)"
    c=$(solver_ckpt logs/r5_mmpde_cy_dmm150.log)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r5_rollout_cy_dmm150.log 2>&1
        echo "[$(stamp)] rollout -> $(tail -1 logs/r5_rollout_cy_dmm150.log)"
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" \
            --experiment cy --base_resolution 30,2521 --one_step \
            > logs/r5_onestep_cy_dmm150.log 2>&1
        echo "[$(stamp)] one-step -> $(tail -1 logs/r5_onestep_cy_dmm150.log)"
        ckpt_commit "MM-PDE cy retrained on the full-budget (150-epoch) DMM + evals (r5 stage 3b)" \
            "$c" logs/r5_mmpde_cy_dmm150.log logs/r5_rollout_cy_dmm150.log \
            logs/r5_onestep_cy_dmm150.log
    else
        ckpt_commit "r5 cy retrain log (no checkpoint)" logs/r5_mmpde_cy_dmm150.log
    fi
fi

# ---- stage 4: bench refresh + cache seed ----
if have_time 900; then
    echo "[$(stamp)] === stage 4: bench refresh ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r5_bench.log 2>&1
    rc=$?
    echo "[$(stamp)] bench rc=$rc -> $(tail -1 logs/r5_bench.log)"
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
    fi
    ckpt_commit "r5 bench refresh + cache seed" logs/r5_bench.log .jax_cache_bench
fi

echo "[$(stamp)] === r5 chain done ==="
