#!/bin/bash
# Round-3 compute chain — the evidence round (VERDICT r2 items 1, 2, 4):
#   0. generate + COMMIT the Burgers dataset cache (data/burgers_48.npy)
#   1. DMM Burgers at the reference 150-Adam-epoch budget -> commit ckpt
#   2. MM-PDE Burgers, 50 epochs, REAL pushforward + residual head -> rollout
#   3. plain GNN Burgers, same recipe head-to-head -> rollout
#   4. DMM cylinder at the reference budget (retry: r2c died on a transient
#      remote-compile network error) -> commit ckpt
#   5. MM-PDE cylinder, 40 epochs, pushforward -> rollout
#      (the plain-GNN cy leg already ran in r2c: rollout rel-L2 0.716)
#   6. bench seed cache: warm .jax_cache_bench from scratch and commit it so
#      the driver's end-of-round bench survives a VM wipe
#
# Chain engineering fixes from ADVICE.md r2: python -u everywhere (no more
# buffered logs lost to timeouts), checkpoints resolved from the run's OWN
# log and validated against the stage recipe before committing, loud commit
# failures, and a budget that can never emit `timeout 0` (= unbounded).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models data

DEADLINE=$(date -d '2026-08-20 16:20 UTC' +%s)
stamp() { date +%H:%M:%S; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
tbudget() {  # tbudget <planned_s> -> min(planned, remaining-60), >= 1
    local r=$(( $(remain) - 60 ))
    if [ "$r" -lt 1 ]; then echo 1
    elif [ "$1" -lt "$r" ]; then echo "$1"
    else echo "$r"; fi
}
have_time() { [ "$(remain)" -gt "${1:-600}" ]; }

ckpt_commit() {  # ckpt_commit <message> <path...>  (loud on failure)
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

run_stage() {  # run_stage <name> <budget_s> <log> <cmd...>  — retry once on
    # a non-timeout crash (transient remote-compile tunnel errors happen)
    local name="$1" planned="$2" log="$3"; shift 3
    if ! have_time 600; then
        echo "[$(stamp)] SKIP $name: only $(remain)s left"; return 2
    fi
    echo "[$(stamp)] === $name (budget $(tbudget "$planned")s) ==="
    timeout "$(tbudget "$planned")" "$@" > "$log" 2>&1
    local rc=$?
    echo "[$(stamp)] $name rc=$rc"
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && have_time 900; then
        echo "[$(stamp)] $name crashed (rc=$rc) — retrying once"
        tail -3 "$log"
        timeout "$(tbudget "$planned")" "$@" > "$log" 2>&1
        rc=$?
        echo "[$(stamp)] $name retry rc=$rc"
    fi
    return "$rc"
}

solver_ckpt() {  # solver_ckpt <log> — the save path mmpde.py printed
    grep -m1 '^models/' "$1" 2>/dev/null
}

validate_ckpt() {  # validate_ckpt <dir> <moving_mesh> <pushforward>
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

rollout_eval() {  # rollout_eval <name> <ckpt> <log> [extra args...]
    local name="$1" ckpt="$2" log="$3"; shift 3
    if [ -z "$ckpt" ] || [ ! -f "$ckpt/state.msgpack" ]; then
        echo "[$(stamp)] $name rollout SKIPPED: no checkpoint ('$ckpt')"
        return 1
    fi
    timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$ckpt" "$@" \
        > "$log" 2>&1
    echo "[$(stamp)] $name rollout rc=$?"
    tail -1 "$log"
}

# ---- stage 0: Burgers dataset cache (VERDICT item 2 enabler) ----
if [ ! -f data/burgers_48.npy ]; then
    run_stage "stage 0: burgers datagen + 48^2 cache" 2400 \
        logs/r3_datagen.log python -u scripts/cache_burgers_lowres.py
fi
ckpt_commit "Commit the 48^2 Burgers dataset cache (29 MB; loaders fall back to it after a VM wipe)" \
    data/burgers_48.npy logs/r3_datagen.log

# ---- stage 1: DMM Burgers, reference budget ----
if have_time 1800; then
    run_stage "stage 1: DMM Burgers 150 Adam epochs + 2 RF" 7800 \
        logs/r3_dmm_burgers.log \
        python -u dmm.py --epochs_adam 150 --epochs_rf 2 --eval_every 25 \
            --n_traj 100 --plot True
    grep "Test equ loss" logs/r3_dmm_burgers.log | tail -2
    ckpt_commit "Full-budget Burgers DMM (150 Adam epochs); commit checkpoint" \
        burgers_checkpoint logs/r3_dmm_burgers.log
fi

# ---- stage 2: MM-PDE Burgers, pushforward head-to-head leg A ----
run_stage "stage 2: MM-PDE Burgers 50 epochs pushforward" 10800 \
    logs/r3_mmpde_push.log \
    python -u mmpde.py --lr 6e-4 --num_epochs 50 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100
MM_CKPT=$(solver_ckpt logs/r3_mmpde_push.log)
echo "MM-PDE ckpt: $MM_CKPT"
if [ -n "$MM_CKPT" ] && validate_ckpt "$MM_CKPT" True True; then
    rollout_eval "MM-PDE burgers" "$MM_CKPT" logs/r3_rollout_mmpde.log
    ckpt_commit "MM-PDE Burgers pushforward run + rollout (r3 stage 2)" \
        "$MM_CKPT" logs/r3_mmpde_push.log logs/r3_rollout_mmpde.log
else
    echo "[$(stamp)] stage 2 checkpoint missing/mismatched — NOT committing"
    ckpt_commit "MM-PDE Burgers pushforward log (no checkpoint)" \
        logs/r3_mmpde_push.log
fi

# ---- stage 3: plain GNN Burgers, pushforward head-to-head leg B ----
run_stage "stage 3: plain GNN Burgers 50 epochs pushforward" 7200 \
    logs/r3_gnn_push.log \
    python -u mmpde.py --lr 6e-4 --moving_mesh False --num_epochs 50 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100
GNN_CKPT=$(solver_ckpt logs/r3_gnn_push.log)
echo "GNN ckpt: $GNN_CKPT"
if [ -n "$GNN_CKPT" ] && validate_ckpt "$GNN_CKPT" False True; then
    rollout_eval "plain GNN burgers" "$GNN_CKPT" logs/r3_rollout_gnn.log
    ckpt_commit "Plain-GNN Burgers pushforward run + rollout (r3 stage 3)" \
        "$GNN_CKPT" logs/r3_gnn_push.log logs/r3_rollout_gnn.log
else
    echo "[$(stamp)] stage 3 checkpoint missing/mismatched — NOT committing"
    ckpt_commit "Plain-GNN Burgers pushforward log (no checkpoint)" \
        logs/r3_gnn_push.log
fi

# ---- stage 4: DMM cylinder, reference budget (r2c retry) ----
if [ ! -f cy_checkpoint/state.msgpack ] && have_time 1800; then
    run_stage "stage 4: DMM cy 150 Adam epochs" 6600 \
        logs/r3_dmm_cy.log \
        python -u dmm.py --experiment cy --train_sample_grid 1500 \
            --branch_layers 4,3 --trunk_layers 16,512 --epochs_adam 150 \
            --epochs_rf 1 --eval_every 25 --n_traj 100 --plot True
    grep "Test equ loss" logs/r3_dmm_cy.log | tail -2
    ckpt_commit "Full-budget cylinder DMM (150 Adam epochs); commit checkpoint" \
        cy_checkpoint logs/r3_dmm_cy.log
fi

# ---- stage 5: MM-PDE cylinder, pushforward ----
if [ -f cy_checkpoint/state.msgpack ]; then
    run_stage "stage 5: MM-PDE cy 40 epochs pushforward" 7200 \
        logs/r3_mmpde_cy.log \
        python -u mmpde.py --experiment cy --base_resolution 30,2521 \
            --lr 6e-4 --num_epochs 40 --unrolling 1 --pushforward True \
            --residual_head True --n_traj 100
    CY_CKPT=$(solver_ckpt logs/r3_mmpde_cy.log)
    echo "MM-PDE cy ckpt: $CY_CKPT"
    if [ -n "$CY_CKPT" ] && validate_ckpt "$CY_CKPT" True True; then
        rollout_eval "MM-PDE cy" "$CY_CKPT" logs/r3_rollout_mmpde_cy.log \
            --experiment cy --base_resolution 30,2521
        ckpt_commit "MM-PDE cy pushforward run + rollout (r3 stage 5)" \
            "$CY_CKPT" logs/r3_mmpde_cy.log logs/r3_rollout_mmpde_cy.log
    else
        echo "[$(stamp)] stage 5 checkpoint missing/mismatched — NOT committing"
        ckpt_commit "MM-PDE cy pushforward log (no checkpoint)" \
            logs/r3_mmpde_cy.log
    fi
else
    echo "[$(stamp)] stage 5 SKIPPED: no cy_checkpoint"
fi

# ---- stage 6: bench seed cache (driver-proofing insurance) ----
if have_time 1500; then
    run_stage "stage 6: bench seed cache (per-step path, fresh cache dir)" 2400 \
        logs/r3_bench_seed.log \
        env MMPDE_JAX_CACHE="$PWD/.jax_cache_bench" \
            python -u bench.py --step-only
    tail -1 logs/r3_bench_seed.log
    size_mb=$(du -sm .jax_cache_bench 2>/dev/null | cut -f1)
    if [ -n "${size_mb:-}" ] && [ "$size_mb" -lt 200 ]; then
        ckpt_commit "Commit the bench seed compile cache (${size_mb} MB): the driver bench warm-starts after a VM wipe" \
            .jax_cache_bench logs/r3_bench_seed.log
    else
        echo "[$(stamp)] seed cache too large (${size_mb:-?} MB) — not committed"
    fi
fi

# ---- stage 7: end-to-end bench sanity (warm) ----
if have_time 900; then
    run_stage "stage 7: bench.py sanity" 2400 logs/r3_bench.log \
        python -u bench.py
    tail -1 logs/r3_bench.log
    ckpt_commit "Round-3 bench sanity run" logs/r3_bench.log
fi

echo "[$(stamp)] === r3 chain done ==="
