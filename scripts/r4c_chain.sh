#!/bin/bash
# Round-4 tail chain (v2 — after the r4 chain's cy stage faulted the TPU
# runtime via the scan+pushforward program and was killed before its scan
# stages could refault the chip).  Stages:
#   1. cy MM-PDE retry with --scan_epoch False (the per-batch cond-unroll
#      path that trains the burgers flagship fine) + rollout head-to-head
#   2. damped-correction fine-tune (train_branch_damp 0.75) + evals
#   3. profile-guided step-time A/Bs (pallas_mp / remat / unroll)
#   4. scan-path bench (NO pushforward — the plain scan epoch is the
#      default burgers training path and has never faulted) + bench
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

FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40

# ---- wait for any live dmm.py/mmpde.py to release the chip ----
while pgrep -x python > /dev/null 2>&1 && \
      ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 120
done

# ---- stage 1: cy MM-PDE pushforward, per-batch path ----
if have_time 3600; then
    echo "[$(stamp)] === r4c stage 1: MM-PDE cy pushforward (per-batch) ==="
    timeout "$(tbudget 7200)" python -u mmpde.py --experiment cy \
        --base_resolution 30,2521 --lr 6e-4 --num_epochs 40 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch False > logs/r4c_mmpde_cy.log 2>&1
    echo "[$(stamp)] rc=$?; epochs: $(grep -c '^Epoch' logs/r4c_mmpde_cy.log)"
    c=$(solver_ckpt logs/r4c_mmpde_cy.log)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r4c_rollout_mmpde_cy.log 2>&1
        echo "[$(stamp)] cy rollout rc=$? -> $(tail -1 logs/r4c_rollout_mmpde_cy.log)"
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" \
            --experiment cy --base_resolution 30,2521 --branch_damp 0.75 \
            > logs/r4c_rollout_mmpde_cy_damp.log 2>&1
        echo "[$(stamp)] cy damped rollout rc=$? -> $(tail -1 logs/r4c_rollout_mmpde_cy_damp.log)"
        ckpt_commit "MM-PDE cy pushforward (per-batch path) + rollouts (r4c stage 1)" \
            "$c" logs/r4c_mmpde_cy.log logs/r4c_rollout_mmpde_cy.log \
            logs/r4c_rollout_mmpde_cy_damp.log
    else
        ckpt_commit "r4c cy MM-PDE log (no checkpoint)" logs/r4c_mmpde_cy.log
    fi
fi

# ---- stage 2: damped-correction fine-tune ----
if have_time 3000; then
    echo "[$(stamp)] === r4c stage 2: train_branch_damp 0.75 fine-tune ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --lr 6e-4 \
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
        ckpt_commit "Damped-correction fine-tune (train_branch_damp 0.75) + evals (r4c stage 2)" \
            "$c" logs/r4c_bdamp_ft.log logs/r4c_ft_rollout.log \
            logs/r4c_ft_onestep.log
    else
        ckpt_commit "r4c fine-tune log (no checkpoint)" logs/r4c_bdamp_ft.log
    fi
fi

# ---- stage 2b: BaseCNN rerun with best-epoch snapshot ----
# the r4 run's final epoch had diverged (5.45e-2 vs best 5.8e-5) and its
# rollout is NaN; with best/ saving the ablation gets usable numbers.
if have_time 1800; then
    echo "[$(stamp)] === r4c stage 2b: BaseCNN rerun ==="
    timeout "$(tbudget 2400)" python -u mmpde.py --model BaseCNN \
        --num_epochs 20 --n_traj 100 > logs/r4c_cnn.log 2>&1
    echo "[$(stamp)] rc=$? ($(grep -c '^Epoch' logs/r4c_cnn.log) epochs)"
    c=$(solver_ckpt logs/r4c_cnn.log)
    if [ -n "$c" ]; then
        BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$BEST" \
            > logs/r4c_rollout_cnn.log 2>&1 || true
        echo "[$(stamp)] cnn rollout -> $(tail -1 logs/r4c_rollout_cnn.log)"
        ckpt_commit "BaseCNN rerun with best-epoch snapshot + rollout (r4c stage 2b)" \
            "$c" logs/r4c_cnn.log logs/r4c_rollout_cnn.log
    fi
fi

# ---- stage 3: profile-guided step-time A/Bs ----
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
ckpt_commit "Profile-guided step-time A/Bs: pallas_mp, remat_layers, unroll_layers (r4c stage 3)" \
    logs/r4b_ab_pallas_mp.log logs/r4b_ab_remat_layers.log \
    logs/r4b_ab_unroll_layers.log logs/r4b_ab_pallas_remat.log

# ---- stage 4: scan-path bench (no pushforward) + bench refresh ----
if have_time 2400; then
    echo "[$(stamp)] === r4c stage 4: scan-path bench ==="
    timeout "$(tbudget 4800)" python -u bench.py --scan \
        > logs/r4_bench_scan.log 2>&1
    echo "[$(stamp)] scan bench rc=$? -> $(tail -1 logs/r4_bench_scan.log)"
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
    fi
    ckpt_commit "Scan-path bench + bench cache seed (r4c stage 4)" \
        logs/r4_bench_scan.log .jax_cache_bench
fi
if have_time 900; then
    echo "[$(stamp)] === r4c stage 4b: bench refresh ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r4_bench.log 2>&1
    echo "[$(stamp)] bench rc=$? -> $(tail -1 logs/r4_bench.log)"
    ckpt_commit "Bench refresh with fixed FLOPs accounting (r4c stage 4b)" \
        logs/r4_bench.log
fi

echo "[$(stamp)] === r4c chain done ==="
