#!/bin/bash
# Round-3 final tail — launched manually after the r3d chain's stage-1
# rollout commit (the remaining r3d stages are superseded by this
# prioritisation; r3d is stopped first).
#   1. top up the flagship MM-PDE pushforward checkpoint to the full 50
#      epochs via --resume (the per-batch program is warm in .jax_cache
#      now, so the top-up is pure training time), then re-rollout + commit
#   2. commit the training-program compile cache as .jax_cache_seed/
#      (round-4 warm start for ALL entry points)
#   3. step-time A/Bs: fused_both, bf16-itp
#   4. cylinder DMM -> cy_checkpoint
#   5. MM-PDE cy pushforward + rollout
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=$(date -d '2026-08-21 01:20 UTC' +%s)
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

validate_ckpt() {
    python - "$@" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1] + "/config.json"))
a = d["args"]
ok = (str(a.get("moving_mesh")) == sys.argv[2]
      and str(a.get("pushforward")) == sys.argv[3])
print(f"ckpt {sys.argv[1]}: epoch={d.get('epoch')} "
      f"moving_mesh={a.get('moving_mesh')} pushforward={a.get('pushforward')}"
      f" -> {'OK' if ok else 'MISMATCH'}")
sys.exit(0 if ok else 1)
EOF
}

ckpt_epoch() {
    python -c "import json,sys; print(json.load(open(sys.argv[1]+'/config.json')).get('epoch',-1))" "$1" 2>/dev/null || echo -1
}

# ---- stage 1: flagship top-up ----
MM_CKPT=""
for log in logs/r3d_mmpde_push_perbatch.log logs/r3d_mmpde_push_fusedscan.log \
           logs/r3d_mmpde_push_staticpush.log; do
    c=$(solver_ckpt "$log")
    if [ -n "$c" ] && validate_ckpt "$c" True True; then MM_CKPT="$c"; fi
done
if [ -n "$MM_CKPT" ]; then
    ep=$(ckpt_epoch "$MM_CKPT")
    echo "[$(stamp)] flagship ckpt $MM_CKPT at epoch $ep"
    if [ "$ep" -lt 49 ] && have_time 1800; then
        echo "[$(stamp)] === stage 1: resume flagship to 50 epochs ==="
        # leave >= 1500s of the window for the rollout eval + commit
        rb=$(( $(remain) - 1500 )); [ "$rb" -gt 60 ] || rb=60
        timeout "$(tbudget $rb)" python -u mmpde.py --lr 6e-4 \
            --num_epochs 50 --unrolling 1 --pushforward True \
            --residual_head True --n_traj 100 --scan_epoch False \
            --resume "$MM_CKPT" > logs/r3f_mmpde_push_resume.log 2>&1
        echo "[$(stamp)] resume rc=$? (now epoch $(ckpt_epoch "$MM_CKPT"))"
        c=$(solver_ckpt logs/r3f_mmpde_push_resume.log)
        if [ -n "$c" ] && validate_ckpt "$c" True True \
           && [ "$(ckpt_epoch "$c")" -gt "$ep" ]; then MM_CKPT="$c"; fi
    fi
elif have_time 3000; then
    echo "[$(stamp)] === stage 1: fresh flagship run (warm cache) ==="
    timeout "$(tbudget 7200)" python -u mmpde.py --lr 6e-4 --num_epochs 50 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch False > logs/r3f_mmpde_push.log 2>&1
    echo "[$(stamp)] fresh rc=$?"
    c=$(solver_ckpt logs/r3f_mmpde_push.log)
    if [ -n "$c" ] && validate_ckpt "$c" True True; then MM_CKPT="$c"; fi
fi
if [ -n "$MM_CKPT" ] && have_time 600; then
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$MM_CKPT" \
        > logs/r3f_rollout_mmpde.log 2>&1
    echo "[$(stamp)] rollout rc=$? -> $(tail -1 logs/r3f_rollout_mmpde.log)"
    ckpt_commit "Flagship MM-PDE pushforward topped up to 50 epochs + rollout (r3f)" \
        "$MM_CKPT" logs/r3f_mmpde_push_resume.log logs/r3f_mmpde_push.log \
        logs/r3f_rollout_mmpde.log
fi

# ---- stage 2: commit the training compile cache as the round-4 seed ----
if [ -d .jax_cache ]; then
    mkdir -p .jax_cache_seed
    cp -n .jax_cache/* .jax_cache_seed/ 2>/dev/null
    sz=$(du -sm .jax_cache_seed | cut -f1)
    if [ "$sz" -lt 250 ]; then
        ckpt_commit "Commit training-program compile cache (.jax_cache_seed, ${sz} MB): round-4 warm start" \
            .jax_cache_seed
    else
        echo "[$(stamp)] .jax_cache_seed too large to commit (${sz} MB)"
    fi
fi

# ---- stage 3: step-time A/Bs ----
run_ab() {
    local name="$1"; shift
    have_time 1200 || { echo "[$(stamp)] SKIP A/B $name"; return; }
    echo "[$(stamp)] === A/B $name ==="
    timeout "$(tbudget 2400)" env "$@" python -u bench.py --step-only \
        > "logs/r3f_ab_${name}.log" 2>&1
    echo "[$(stamp)] A/B $name rc=$? -> $(tail -1 "logs/r3f_ab_${name}.log")"
}
run_ab fused_both MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1
run_ab bf16_itp MMPDE_BF16_ITP=1
ckpt_commit "Step-time A/Bs on the real chip (fused_both, bf16_itp)" \
    logs/r3f_ab_fused_both.log logs/r3f_ab_bf16_itp.log

# ---- stage 4: cylinder DMM ----
if have_time 2400; then
    echo "[$(stamp)] === stage 4: DMM cy ==="
    timeout "$(tbudget 5400)" python -u dmm.py --experiment cy \
        --train_sample_grid 1500 --branch_layers 4,3 --trunk_layers 16,512 \
        --epochs_adam 150 --epochs_rf 1 --eval_every 25 --n_traj 100 \
        --plot True > logs/r3f_dmm_cy.log 2>&1
    echo "[$(stamp)] stage 4 rc=$? ($(grep -c '^Epoch' logs/r3f_dmm_cy.log) epochs)"
    if [ "$(grep -c '^Epoch' logs/r3f_dmm_cy.log)" -gt 0 ]; then
        ckpt_commit "Cylinder DMM checkpoint (r3f stage 4)" \
            cy_checkpoint logs/r3f_dmm_cy.log
    else
        ckpt_commit "r3f cy DMM log (no epochs)" logs/r3f_dmm_cy.log
    fi
fi

# ---- stage 5: MM-PDE cy pushforward + rollout ----
if [ -d cy_checkpoint ] && have_time 2400; then
    echo "[$(stamp)] === stage 5: MM-PDE cy pushforward ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --experiment cy \
        --base_resolution 30,2521 --lr 6e-4 --num_epochs 40 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100 \
        > logs/r3f_mmpde_cy.log 2>&1
    echo "[$(stamp)] stage 5 rc=$?; epochs: $(grep -c '^Epoch' logs/r3f_mmpde_cy.log)"
    c=$(solver_ckpt logs/r3f_mmpde_cy.log)
    if [ -n "$c" ] && validate_ckpt "$c" True True; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$c" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r3f_rollout_mmpde_cy.log 2>&1
        echo "[$(stamp)] cy rollout rc=$? -> $(tail -1 logs/r3f_rollout_mmpde_cy.log)"
        ckpt_commit "MM-PDE cy pushforward run + rollout (r3f stage 5)" \
            "$c" logs/r3f_mmpde_cy.log logs/r3f_rollout_mmpde_cy.log
    else
        ckpt_commit "MM-PDE cy pushforward log (no valid checkpoint)" \
            logs/r3f_mmpde_cy.log
    fi
fi

echo "[$(stamp)] === r3f chain done ==="
