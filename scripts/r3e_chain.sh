#!/bin/bash
# Round-3 opportunistic tail chain — runs ONLY if r3d releases the chip
# before the driver window closes.  Priorities:
#   1. bf16-itp step-time A/B (validates today's MMPDE_BF16_ITP path on chip)
#   2. cylinder DMM (the r2c attempt crashed at epoch 0 on a remote-compile
#      fault; cy datagen is analytic/cheap) -> commit cy_checkpoint
#   3. MM-PDE cy pushforward + rollout vs the plain-GNN cy 0.716 (r2c)
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

R3D_PID=$(cat /tmp/r3d_chain.pid 2>/dev/null || true)
if [ -n "${R3D_PID:-}" ] && kill -0 "$R3D_PID" 2>/dev/null; then
    echo "[$(stamp)] waiting for r3d chain (pid $R3D_PID)"
    while kill -0 "$R3D_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(stamp)] r3d done — starting r3e"

# ---- stage 1: bf16-itp A/B ----
if have_time 900; then
    echo "[$(stamp)] === r3e stage 1: bf16-itp step-time A/B ==="
    timeout "$(tbudget 1800)" env MMPDE_BF16_ITP=1 python -u bench.py \
        --step-only > logs/r3e_ab_bf16_itp.log 2>&1
    echo "[$(stamp)] rc=$? -> $(tail -1 logs/r3e_ab_bf16_itp.log)"
    ckpt_commit "bf16-itp step-time A/B on the real chip" \
        logs/r3e_ab_bf16_itp.log
fi

# ---- stage 2: cylinder DMM ----
if have_time 2400; then
    echo "[$(stamp)] === r3e stage 2: DMM cy (as many of 150 epochs as fit) ==="
    timeout "$(tbudget 5400)" python -u dmm.py --experiment cy \
        --train_sample_grid 1500 --branch_layers 4,3 --trunk_layers 16,512 \
        --epochs_adam 150 --epochs_rf 1 --eval_every 25 --n_traj 100 \
        --plot True > logs/r3e_dmm_cy.log 2>&1
    echo "[$(stamp)] stage 2 rc=$? ($(grep -c '^Epoch' logs/r3e_dmm_cy.log) epochs)"
    grep "Test equ loss" logs/r3e_dmm_cy.log | tail -1
    if [ "$(grep -c '^Epoch' logs/r3e_dmm_cy.log)" -gt 0 ]; then
        ckpt_commit "Cylinder DMM checkpoint (r3e stage 2)" \
            cy_checkpoint logs/r3e_dmm_cy.log
    else
        ckpt_commit "r3e cy DMM log (no epochs)" logs/r3e_dmm_cy.log
    fi
fi

# ---- stage 3: MM-PDE cy pushforward + rollout ----
if [ -d cy_checkpoint ] && have_time 2400; then
    echo "[$(stamp)] === r3e stage 3: MM-PDE cy pushforward ==="
    timeout "$(tbudget 5400)" python -u mmpde.py --experiment cy \
        --base_resolution 30,2521 --lr 6e-4 --num_epochs 40 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100 \
        > logs/r3e_mmpde_cy.log 2>&1
    echo "[$(stamp)] stage 3 rc=$?; epochs: $(grep -c '^Epoch' logs/r3e_mmpde_cy.log)"
    c=$(solver_ckpt logs/r3e_mmpde_cy.log)
    if [ -n "$c" ] && validate_ckpt "$c" True True; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$c" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r3e_rollout_mmpde_cy.log 2>&1
        echo "[$(stamp)] cy rollout rc=$?"
        tail -1 logs/r3e_rollout_mmpde_cy.log
        ckpt_commit "MM-PDE cy pushforward run + rollout (r3e stage 3)" \
            "$c" logs/r3e_mmpde_cy.log logs/r3e_rollout_mmpde_cy.log
    else
        ckpt_commit "MM-PDE cy pushforward log (no valid checkpoint)" \
            logs/r3e_mmpde_cy.log
    fi
fi

echo "[$(stamp)] === r3e chain done ==="
