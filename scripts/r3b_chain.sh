#!/bin/bash
# Round-3 follow-up chain — runs after r3_chain releases the chip.
#
#   A. retry the flagship MM-PDE Burgers pushforward run (r3 stage 2 died
#      twice on a TPU-worker crash mid-compile of the scan-epoch program):
#      attempt 1 scan path, attempt 2 per-batch dispatch (--scan_epoch
#      False) — the smaller program the r2 full-budget runs demonstrably
#      compiled.  Then rollout-eval + commit.
#   B. step-time A/B of the round-3 fused fast paths on the real chip:
#      MMPDE_FUSED_BRANCHES / MMPDE_FUSED_ITP / MMPDE_PALLAS_MP and the
#      combination (each exact rewrites, equivalence-tested in
#      tests/test_solver.py::test_fused_paths_match_unfused).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=$(date -d '2026-08-20 17:40 UTC' +%s)
stamp() { date +%H:%M:%S; }
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

# ---- wait for the main chain to release the chip ----
R3_PID=$(cat /tmp/r3_chain.pid 2>/dev/null || true)
if [ -n "${R3_PID:-}" ] && kill -0 "$R3_PID" 2>/dev/null; then
    echo "[$(stamp)] waiting for r3 chain (pid $R3_PID)"
    while kill -0 "$R3_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(stamp)] r3 chain done — starting r3b"

# ---- stage A: flagship MM-PDE pushforward retry ----
# attempt order: scan (the default path), fused (MMPDE_FUSED_BRANCHES +
# MMPDE_FUSED_ITP halve the per-step op count — a smaller program for the
# remote compiler that crashed twice on the plain one; exact rewrites,
# equivalence-tested), perbatch (no scan wrapper at all)
MM_CKPT=""
for attempt in scan fused perbatch staticpush; do
    have_time 2400 || break
    [ -n "$MM_CKPT" ] && break
    extra=""
    envs=()
    [ "$attempt" = perbatch ] && extra="--scan_epoch False"
    [ "$attempt" = fused ] && envs=(MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1)
    # staticpush: no dynamic fori_loop anywhere in the program (per-batch,
    # one compiled program per unrolled value) — last-resort escape hatch
    # for TPU-runtime faults in the dynamic-trip-count path
    [ "$attempt" = staticpush ] && { extra="--scan_epoch False"
                                     envs=(MMPDE_STATIC_PUSH=1); }
    log="logs/r3b_mmpde_push_${attempt}.log"
    echo "[$(stamp)] === stage A ($attempt): MM-PDE Burgers 50 epochs pushforward ==="
    timeout "$(tbudget 7800)" env "${envs[@]}" python -u mmpde.py --lr 6e-4 \
        --num_epochs 50 \
        --unrolling 1 --pushforward True --residual_head True --n_traj 100 \
        $extra > "$log" 2>&1
    rc=$?
    echo "[$(stamp)] stage A ($attempt) rc=$rc; epochs: $(grep -c '^Epoch' "$log")"
    c=$(solver_ckpt "$log")
    if [ -n "$c" ] && validate_ckpt "$c" True True; then
        MM_CKPT="$c"
    fi
done
if [ -n "$MM_CKPT" ]; then
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$MM_CKPT" \
        > logs/r3b_rollout_mmpde.log 2>&1
    echo "[$(stamp)] MM-PDE rollout rc=$?"
    tail -1 logs/r3b_rollout_mmpde.log
    ckpt_commit "MM-PDE Burgers pushforward run + rollout (r3b stage A)" \
        "$MM_CKPT" logs/r3b_mmpde_push_scan.log \
        logs/r3b_mmpde_push_perbatch.log logs/r3b_rollout_mmpde.log
else
    echo "[$(stamp)] stage A: no valid checkpoint"
    ckpt_commit "MM-PDE Burgers pushforward retry logs (no checkpoint)" \
        logs/r3b_mmpde_push_scan.log logs/r3b_mmpde_push_perbatch.log
fi

# ---- stage B: step-time A/B of the fused fast paths ----
run_ab() {
    local name="$1"; shift
    have_time 900 || { echo "[$(stamp)] SKIP A/B $name"; return; }
    echo "[$(stamp)] === A/B $name ==="
    timeout "$(tbudget 2700)" env "$@" python -u bench.py --step-only \
        > "logs/r3b_ab_${name}.log" 2>&1
    echo "[$(stamp)] A/B $name rc=$? -> $(tail -1 "logs/r3b_ab_${name}.log")"
}
run_ab baseline MMPDE_NOOP=0
run_ab fused_branches MMPDE_FUSED_BRANCHES=1
run_ab fused_itp MMPDE_FUSED_ITP=1
run_ab fused_both MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1
run_ab pallas_mp MMPDE_PALLAS_MP=1
run_ab all MMPDE_FUSED_BRANCHES=1 MMPDE_FUSED_ITP=1 MMPDE_PALLAS_MP=1
ckpt_commit "Step-time A/B of the round-3 fused fast paths on the real chip" \
    logs/r3b_ab_baseline.log logs/r3b_ab_fused_branches.log \
    logs/r3b_ab_fused_itp.log logs/r3b_ab_fused_both.log \
    logs/r3b_ab_pallas_mp.log logs/r3b_ab_all.log

echo "[$(stamp)] === r3b chain done ==="
