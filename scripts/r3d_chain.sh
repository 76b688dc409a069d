#!/bin/bash
# Round-3 fourth chain — fresh driver window (starts ~21:20 UTC, driver end
# ~01:47 UTC).  The r3b/r3c chains never ran (VM recycled between driver
# windows), so this chain carries their outstanding stages, re-prioritised:
#
#   0. bench.py (VERDICT #1: a recorded perf number) + seed .jax_cache_bench
#      so the driver's cold end-of-round bench warm-starts.
#   1. flagship MM-PDE Burgers pushforward retry ladder (the r3 stage-2 run
#      died twice on a TPU-worker fault compiling the scan+pushforward
#      program): perbatch -> fused scan -> statically-unrolled pushforward.
#      Then rollout-eval + commit — the round's headline head-to-head
#      against the plain-GNN pushforward rollout (2.28).
#   2. step-time A/B of the fused fast paths (fused_both / pallas_mp / all;
#      the stage-0 bench records the default-env baseline).
#   3. resume the full-budget Burgers DMM (epoch 29 -> 150).
#   4. BaseCNN ablation (last reference experiment without a number).
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

# ---- stage 0: bench + seed cache ----
if have_time 1800; then
    echo "[$(stamp)] === stage 0: bench.py (budget 2400s) ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r3d_bench.log 2>&1
    echo "[$(stamp)] stage 0 rc=$? -> $(tail -1 logs/r3d_bench.log)"
    # seed the committed bench cache from whatever just compiled
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
        sz=$(du -sm .jax_cache_bench | cut -f1)
        echo "[$(stamp)] .jax_cache_bench seeded (${sz} MB)"
        if [ "$sz" -lt 150 ]; then
            ckpt_commit "Bench run + committed compile-cache seed (driver bench warm-start)" \
                logs/r3d_bench.log .jax_cache_bench .bench_baseline.json
        else
            ckpt_commit "Bench run (cache seed too large to commit: ${sz} MB)" \
                logs/r3d_bench.log
        fi
    else
        ckpt_commit "Bench run (no cache dir produced)" logs/r3d_bench.log
    fi
fi

# ---- stage 1: flagship MM-PDE pushforward ladder ----
# attempt order: perbatch (smallest program; avoids the scan+pushforward
# combination that faulted the TPU worker twice in r3), fused scan
# (MMPDE_FUSED_BRANCHES + MMPDE_FUSED_ITP halve the scan body op count;
# exact rewrites, equivalence-tested incl. the pushforward step), then the
# statically-unrolled pushforward escape hatch (no dynamic-trip-count loop
# anywhere).
MM_CKPT=""
for attempt in perbatch fusedscan staticpush; do
    have_time 2400 || break
    [ -n "$MM_CKPT" ] && break
    extra=""
    envs=(MMPDE_NOOP=0)
    [ "$attempt" = perbatch ] && extra="--scan_epoch False"
    [ "$attempt" = fusedscan ] && envs=(MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1)
    [ "$attempt" = staticpush ] && { extra="--scan_epoch False"
                                     envs=(MMPDE_STATIC_PUSH=1); }
    log="logs/r3d_mmpde_push_${attempt}.log"
    echo "[$(stamp)] === stage 1 ($attempt): MM-PDE Burgers 50 epochs pushforward ==="
    timeout "$(tbudget 5400)" env "${envs[@]}" python -u mmpde.py --lr 6e-4 \
        --num_epochs 50 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
        $extra > "$log" 2>&1
    rc=$?
    echo "[$(stamp)] stage 1 ($attempt) rc=$rc; epochs: $(grep -c '^Epoch' "$log")"
    c=$(solver_ckpt "$log")
    if [ -n "$c" ] && validate_ckpt "$c" True True; then
        MM_CKPT="$c"
    fi
done
if [ -n "$MM_CKPT" ]; then
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$MM_CKPT" \
        > logs/r3d_rollout_mmpde.log 2>&1
    echo "[$(stamp)] MM-PDE rollout rc=$?"
    tail -1 logs/r3d_rollout_mmpde.log
    ckpt_commit "MM-PDE Burgers pushforward run + rollout (r3d stage 1)" \
        "$MM_CKPT" logs/r3d_mmpde_push_perbatch.log \
        logs/r3d_mmpde_push_fusedscan.log logs/r3d_mmpde_push_staticpush.log \
        logs/r3d_rollout_mmpde.log
else
    echo "[$(stamp)] stage 1: no valid checkpoint"
    ckpt_commit "MM-PDE Burgers pushforward retry logs (no checkpoint)" \
        logs/r3d_mmpde_push_perbatch.log logs/r3d_mmpde_push_fusedscan.log \
        logs/r3d_mmpde_push_staticpush.log
fi

# ---- stage 2: step-time A/B of the fused fast paths ----
run_ab() {
    local name="$1"; shift
    have_time 900 || { echo "[$(stamp)] SKIP A/B $name"; return; }
    echo "[$(stamp)] === A/B $name ==="
    timeout "$(tbudget 1800)" env "$@" python -u bench.py --step-only \
        > "logs/r3d_ab_${name}.log" 2>&1
    echo "[$(stamp)] A/B $name rc=$? -> $(tail -1 "logs/r3d_ab_${name}.log")"
}
run_ab fused_both MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1
run_ab pallas_mp MMPDE_PALLAS_MP=1
run_ab all MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1 MMPDE_PALLAS_MP=1
ckpt_commit "Step-time A/B of the round-3 fused fast paths on the real chip" \
    logs/r3d_ab_fused_both.log logs/r3d_ab_pallas_mp.log logs/r3d_ab_all.log

# ---- stage 3: resume full-budget Burgers DMM (29 -> 150) ----
if have_time 2100; then
    echo "[$(stamp)] === stage 3: DMM Burgers resume to 150 Adam + 2 RF ==="
    timeout "$(tbudget 6000)" python -u dmm.py --epochs_adam 150 \
        --epochs_rf 2 --eval_every 25 --n_traj 100 --plot True \
        --resume True > logs/r3d_dmm_burgers.log 2>&1
    echo "[$(stamp)] stage 3 rc=$? ($(grep -c '^Epoch' logs/r3d_dmm_burgers.log) epochs)"
    grep "Test equ loss" logs/r3d_dmm_burgers.log | tail -1
    if [ "$(grep -c '^Epoch' logs/r3d_dmm_burgers.log)" -gt 0 ]; then
        ckpt_commit "Burgers DMM resumed beyond epoch 29; commit checkpoint" \
            burgers_checkpoint logs/r3d_dmm_burgers.log
    else
        ckpt_commit "r3d DMM resume log (no epochs completed)" \
            logs/r3d_dmm_burgers.log
    fi
fi

# ---- stage 4: BaseCNN ablation ----
if have_time 1500; then
    echo "[$(stamp)] === stage 4: BaseCNN Burgers 20 epochs ==="
    timeout "$(tbudget 3000)" python -u mmpde.py --model BaseCNN \
        --num_epochs 20 --n_traj 100 > logs/r3d_basecnn.log 2>&1
    echo "[$(stamp)] stage 4 rc=$?"
    grep "Mean Timestep" logs/r3d_basecnn.log | tail -2
    ckpt_commit "BaseCNN ablation run (r3d stage 4)" logs/r3d_basecnn.log
fi

echo "[$(stamp)] === r3d chain done ==="
