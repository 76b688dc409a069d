#!/bin/bash
# Refined bisection of the axon scan+pushforward worker crash
# (DIVERGENCES.md #41) — supersedes the a/b/c ladder in
# bisect_scan_push_fault.sh using two facts already on record:
#   * tiny plain-GNN scan+push PASSES on the chip (r4 tail, twice)
#   * FULL-SIZE plain-GNN scan+push PASSES: logs/r3_gnn_push.log ran 50
#     epochs at 31x48x48, n_traj 100, scan_epoch=True, pushforward=True
#     (and the cy plain GNN did 40 epochs the same way) — so sheer
#     program size is NOT the trigger; the fault needs the moving-mesh
#     ingredients (device kNN sort/gather, Pallas IDW, DMM forward, the
#     second branch) inside the scanned cond.
#
# Ladder:
#   t0  tiny moving-mesh scan+push (cheap compile).  If it CRASHES the
#       trigger bisects at tiny scale in minutes: t1 no-Pallas,
#       t2 exact kNN, t3 rolled layers, t4 f32.
#   If t0 passes: f0 full-size moving-mesh baseline (confirm the fault is
#       still live post-unroll-default), then f1 MMPDE_PALLAS=0 and
#       f2 MMPDE_LOCAL_KNN=0 MMPDE_GRID_KNN=0 — a stage that PASSES names
#       its disabled ingredient as the trigger.
#
# Each stage is its own process (a crash kills only that process's
# worker; the next respawns).  RUN ALONE ON THE CHIP.
# Usage: scripts/bisect2_scan_push.sh [deadline-epoch-seconds]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs
DEADLINE=${1:-$(( $(date +%s) + 5400 ))}
stamp() { date -u +%H:%M:%S; }
remain() { echo $(( DEADLINE - $(date +%s) )); }

TINY="--base_resolution 9,12,12 --neighbors 4 --n_traj 6 --batch_size 3
      --inner_loops 1 --dmm_checkpoint burgers_checkpoint --log False"

run_stage() {  # run_stage tag timeout extra-env... -- extra-flags...
    local tag="$1" to="$2"; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
    local r=$(( $(remain) - 30 ))
    [ "$r" -lt 120 ] && { echo "[$(stamp)] SKIP $tag (out of time)"; return 2; }
    [ "$to" -gt "$r" ] && to=$r
    echo "[$(stamp)] === bisect $tag: env=${envs[*]:-none} flags=$* ==="
    timeout "$to" env MMPDE_FORCE_SCAN_PUSH=1 "${envs[@]}" python -u mmpde.py \
        --num_epochs 2 --scan_epoch True --pushforward True \
        --residual_head True "$@" > "logs/bisect2_${tag}.log" 2>&1
    local rc=$?
    local ep; ep=$(grep -c 'Mean Timestep Test Error' "logs/bisect2_${tag}.log")
    local verdict=CRASH
    [ "$ep" -ge 2 ] && verdict=PASS
    [ "$rc" -eq 124 ] && [ "$ep" -lt 2 ] && verdict=TIMEOUT-INCONCLUSIVE
    echo "[$(stamp)] $tag rc=$rc epochs=$ep -> $verdict"
    # distinct codes so callers never mistake SKIP/TIMEOUT for CRASH:
    # 0=PASS, 1=CRASH, 3=TIMEOUT-INCONCLUSIVE (2=SKIP from the gate above)
    case "$verdict" in PASS) return 0;; CRASH) return 1;; *) return 3;; esac
}

# shellcheck disable=SC2086
run_stage t0 1500 -- $TINY; t0=$?
if [ "$t0" -ge 2 ]; then
    echo "[$(stamp)] t0 SKIP/TIMEOUT — ladder stops (no verdict to act on)"
elif [ "$t0" -eq 0 ]; then
    echo "[$(stamp)] tiny moving-mesh PASSES -> full-size ladder"
    run_stage f0 2400 -- ; f0=$?
    if [ "$f0" -eq 1 ]; then
        run_stage f1_nopallas 2400 MMPDE_PALLAS=0 --
        run_stage f2_exactknn 2400 MMPDE_LOCAL_KNN=0 MMPDE_GRID_KNN=0 --
    elif [ "$f0" -eq 0 ]; then
        echo "[$(stamp)] f0 PASSED: the fault is GONE at the current program"
        echo "[$(stamp)] (unroll-layers default changed the program since r4)"
    else
        echo "[$(stamp)] f0 SKIP/TIMEOUT — ingredient stages would be meaningless, stopping"
    fi
else
    echo "[$(stamp)] tiny moving-mesh CRASHES -> tiny knob ladder"
    # shellcheck disable=SC2086
    run_stage t1_nopallas 1500 MMPDE_PALLAS=0 -- $TINY
    # shellcheck disable=SC2086
    run_stage t2_exactknn 1500 MMPDE_LOCAL_KNN=0 MMPDE_GRID_KNN=0 -- $TINY
    # shellcheck disable=SC2086
    run_stage t3_rolled 1500 MMPDE_UNROLL_LAYERS=0 -- $TINY
    # shellcheck disable=SC2086
    run_stage t4_f32 1500 MMPDE_BF16=0 -- $TINY
fi

git add -f logs/bisect2_*.log 2>/dev/null
git commit -q -m "scan+pushforward refined bisection results" -- logs/bisect2_*.log \
    && echo "[$(stamp)] committed bisect2 logs"
echo "[$(stamp)] === bisect2 done ==="
