#!/bin/bash
# Round-4 tail chain — swapped in for r4_chain stages 5-7 once the
# cylinder leg (stage 4) lands.  Prioritized by VERDICT r3:
#   1. damped-correction fine-tune (meet "rollout <= plain while keeping
#      the one-step win"): resume the epoch-39 flagship 15 epochs at
#      --train_branch_damp 0.75, eval one-step + rollout at that point
#   2. BaseCNN ablation (20 epochs + rollout)
#   3. Burgers DMM resume -> 150 Adam epochs + RF
#   4. pallas_mp / unroll_layers step-time A/Bs (profile-guided)
#   5. scan-path bench compile + bench refresh + cache seeds
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=$(date -d '2026-08-21 14:10 UTC' +%s)
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
ckpt_epoch() {
    python -c "import json,sys; print(json.load(open(sys.argv[1]+'/config.json')).get('epoch',-1))" "$1" 2>/dev/null || echo -1
}
seed_cache() {
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_seed
        cp -n .jax_cache/* .jax_cache_seed/ 2>/dev/null
        local sz=$(du -sm .jax_cache_seed | cut -f1)
        [ "$sz" -lt 250 ] && ckpt_commit "Cache seed refresh (${sz} MB)" .jax_cache_seed
    fi
}

FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40

# ---- stage 1: damped-correction fine-tune ----
if have_time 3000; then
    echo "[$(stamp)] === r4c stage 1: train_branch_damp 0.75 fine-tune ==="
    timeout "$(tbudget 7200)" python -u mmpde.py --lr 6e-4 \
        --num_epochs 55 --unrolling 1 --pushforward True \
        --residual_head True --n_traj 100 --scan_epoch False \
        --train_branch_damp 0.75 --resume "$FLAG39" \
        > logs/r4c_bdamp_ft.log 2>&1
    echo "[$(stamp)] ft rc=$? ($(grep -c '^Epoch' logs/r4c_bdamp_ft.log) epochs)"
    c=$(solver_ckpt logs/r4c_bdamp_ft.log)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" \
            --branch_damp 0.75 > logs/r4c_ft_rollout.log 2>&1
        echo "[$(stamp)] ft rollout rc=$? -> $(tail -1 logs/r4c_ft_rollout.log)"
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" \
            --branch_damp 0.75 --one_step > logs/r4c_ft_onestep.log 2>&1
        echo "[$(stamp)] ft one-step rc=$? -> $(tail -1 logs/r4c_ft_onestep.log)"
        ckpt_commit "Damped-correction fine-tune (train_branch_damp 0.75) + evals (r4c stage 1)" \
            "$c" logs/r4c_bdamp_ft.log logs/r4c_ft_rollout.log \
            logs/r4c_ft_onestep.log
    else
        ckpt_commit "r4c fine-tune log (no checkpoint)" logs/r4c_bdamp_ft.log
    fi
    seed_cache
fi

# ---- stage 2: BaseCNN ablation ----
if have_time 2400; then
    echo "[$(stamp)] === r4c stage 2: BaseCNN 20 epochs ==="
    timeout "$(tbudget 3600)" python -u mmpde.py --model BaseCNN \
        --num_epochs 20 --n_traj 100 > logs/r4_cnn.log 2>&1
    echo "[$(stamp)] rc=$? ($(grep -c '^Epoch' logs/r4_cnn.log) epochs)"
    c=$(solver_ckpt logs/r4_cnn.log)
    if [ -n "$c" ]; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$c" \
            > logs/r4_rollout_cnn.log 2>&1 || true
        ckpt_commit "BaseCNN ablation: 20 epochs + test MSE + rollout (r4c stage 2)" \
            "$c" logs/r4_cnn.log logs/r4_rollout_cnn.log
    else
        ckpt_commit "r4 BaseCNN log (no checkpoint)" logs/r4_cnn.log
    fi
    seed_cache
fi

# ---- stage 3: Burgers DMM resume 29 -> 150 Adam epochs + RF ----
if have_time 2400; then
    ep=$(ckpt_epoch burgers_checkpoint)
    echo "[$(stamp)] === r4c stage 3: DMM burgers resume (epoch $ep -> 150) ==="
    timeout "$(tbudget 7200)" python -u dmm.py --resume True \
        --epochs_adam 150 --epochs_rf 1 --eval_every 10 --n_traj 100 \
        --plot True > logs/r4_dmm_burgers_resume.log 2>&1
    echo "[$(stamp)] rc=$? (now epoch $(ckpt_epoch burgers_checkpoint))"
    if [ "$(ckpt_epoch burgers_checkpoint)" -gt "$ep" ]; then
        ckpt_commit "Burgers DMM resumed toward the reference 150-epoch budget (r4c stage 3)" \
            burgers_checkpoint logs/r4_dmm_burgers_resume.log burgers
    fi
fi

# ---- stage 4: profile-guided step-time A/Bs ----
ab() {
    local name="$1"; shift
    local log="logs/r4b_ab_${name}.log"
    [ -s "$log" ] && { echo "[$(stamp)] A/B $name done"; return; }
    have_time 1500 || { echo "[$(stamp)] SKIP A/B $name"; return; }
    echo "[$(stamp)] === A/B $name ==="
    timeout "$(tbudget 3600)" env "$@" python -u bench.py --step-only \
        > "$log" 2>&1
    echo "[$(stamp)] A/B $name rc=$? -> $(tail -1 "$log")"
}
ab pallas_mp MMPDE_PALLAS_MP=1
ab remat_layers MMPDE_REMAT_LAYERS=1
ab unroll_layers MMPDE_UNROLL_LAYERS=1
ab pallas_remat MMPDE_PALLAS_MP=1 MMPDE_REMAT_LAYERS=1
ckpt_commit "Profile-guided step-time A/Bs: pallas_mp, remat_layers, unroll_layers (r4c stage 4)" \
    logs/r4b_ab_pallas_mp.log logs/r4b_ab_remat_layers.log \
    logs/r4b_ab_unroll_layers.log logs/r4b_ab_pallas_remat.log

# ---- stage 5: scan-path bench compile + bench refresh ----
if have_time 2400; then
    echo "[$(stamp)] === r4c stage 5: scan-path bench ==="
    timeout "$(tbudget 5400)" python -u bench.py --scan \
        > logs/r4_bench_scan.log 2>&1
    echo "[$(stamp)] scan bench rc=$? -> $(tail -1 logs/r4_bench_scan.log)"
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
    fi
    ckpt_commit "Scan-path bench + bench cache seed (r4c stage 5)" \
        logs/r4_bench_scan.log .jax_cache_bench
fi
if have_time 900; then
    echo "[$(stamp)] === r4c stage 5b: bench refresh ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r4_bench.log 2>&1
    echo "[$(stamp)] bench rc=$? -> $(tail -1 logs/r4_bench.log)"
    ckpt_commit "Bench refresh with fixed FLOPs accounting (r4c stage 5b)" \
        logs/r4_bench.log
fi

echo "[$(stamp)] === r4c chain done ==="
