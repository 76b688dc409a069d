#!/bin/bash
# Round-5 tail (runs after r5b_chain exits, in whatever chip window
# remains before the round closes):
#   1. re-run the fused_itp+bf16_itp A/B cell (the r5b measurement printed
#      an impossible 0.78 ms/step with 0-s warmup; the combo itself is
#      numerically validated on CPU — test_fused_paths_match_unfused[flags3])
#   2. input-noise 0.01 fine-tune at damp 0 + evals (VERDICT r4 next-4)
#   3. 96x96 plain-GNN short run (VERDICT r4 next-5; data/burgers_96.npy
#      pre-generated off-window by scripts/cache_burgers_96.py)
# Usage: scripts/r5c_tail.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models
DEADLINE=${1:-$(( $(date +%s) + 5400 ))}
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
solver_ckpt() { grep -oE '^models/[^ ]+' "$1" 2>/dev/null | tail -1; }

while ps -eo args | grep -E "^python -u (dmm|mmpde)\.py" > /dev/null; do
    echo "[$(stamp)] waiting for a running CLI to finish..."
    sleep 60
done

# ---- 1. A/B re-run ----
if [ ! -s logs/r5c_ab_fused_bf16_itp.log ] && have_time 1200; then
    echo "[$(stamp)] === tail 1: A/B fused_bf16_itp re-run ==="
    timeout "$(tbudget 2400)" env MMPDE_FUSED_ITP=1 MMPDE_BF16_ITP=1 \
        python -u bench.py --step-only > logs/r5c_ab_fused_bf16_itp.log 2>&1
    rc=$?
    echo "[$(stamp)] A/B re-run rc=$rc -> $(tail -1 logs/r5c_ab_fused_bf16_itp.log)"
    ckpt_commit "A/B fused_itp+bf16_itp re-run (r5c tail)" \
        logs/r5c_ab_fused_bf16_itp.log
fi

# ---- 2. input-noise fine-tune at damp 0 ----
FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40
if [ ! -s logs/r5c_inoise_ft.log ] && [ ! -s logs/r5b_inoise_ft.log ] \
       && have_time 2700; then
    echo "[$(stamp)] === tail 2: input-noise 0.01 fine-tune (damp 0) ==="
    timeout "$(tbudget 3600)" python -u mmpde.py --lr 6e-4 --num_epochs 55 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch False --input_noise 0.01 --resume "$FLAG39" \
        > logs/r5c_inoise_ft.log 2>&1
    rc=$?
    echo "[$(stamp)] inoise FT rc=$rc epochs=$(grep -c '^Epoch' logs/r5c_inoise_ft.log)"
    c=$(solver_ckpt logs/r5c_inoise_ft.log)
    if [ -n "$c" ] && [ -e "$c/state.msgpack" ]; then
        BEST="$c"; [ -e "$c/best/state.msgpack" ] && BEST="$c/best"
        timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$BEST" \
            > logs/r5c_inoise_rollout.log 2>&1
        echo "[$(stamp)] rollout -> $(tail -1 logs/r5c_inoise_rollout.log)"
        timeout "$(tbudget 1500)" python -u scripts/eval_rollout.py "$BEST" \
            --one_step > logs/r5c_inoise_onestep.log 2>&1
        echo "[$(stamp)] one-step -> $(tail -1 logs/r5c_inoise_onestep.log)"
        ckpt_commit "Input-noise 0.01 fine-tune at damp 0 + evals (r5c tail)" \
            "$c" logs/r5c_inoise_ft.log logs/r5c_inoise_rollout.log \
            logs/r5c_inoise_onestep.log
    else
        ckpt_commit "r5c input-noise FT log (no checkpoint)" logs/r5c_inoise_ft.log
    fi
fi

# ---- 3. 96x96 plain-GNN short run ----
if [ ! -s logs/r5c_gnn96.log ] && [ ! -s logs/r5b_gnn96.log ] \
       && have_time 1500; then
    echo "[$(stamp)] === tail 3: 96x96 plain-GNN short run ==="
    timeout "$(tbudget 3000)" python -u mmpde.py --moving_mesh False \
        --base_resolution 31,96,96 --num_epochs 5 --n_traj 50 \
        --pushforward True --residual_head True --unrolling 1 \
        --scan_epoch True > logs/r5c_gnn96.log 2>&1
    rc=$?
    echo "[$(stamp)] gnn96 rc=$rc epochs=$(grep -c 'Mean Timestep' logs/r5c_gnn96.log)"
    c=$(solver_ckpt logs/r5c_gnn96.log)
    ckpt_commit "96x96 plain-GNN short run beyond the reference's hard-coded 48 (r5c tail)" \
        "$c" logs/r5c_gnn96.log
fi

# NOTE: no cache-seed refresh here — the committed seeds
# (.jax_cache_seed 1.8G, .jax_cache_bench 259M) already cover the bench
# and CLI programs, the repo pack is at 4 GiB, and this is the final
# round: bulk-copying the 5.9G active cache would double the repo for
# zero future compile savings.  (The r5b stage-6 copy is neutralized the
# same way: both seed dirs are chmod 555 for the rest of the round.)
echo "[$(stamp)] === r5c tail done ==="
