#!/bin/bash
# DIVERGENCES-41 follow-up discriminator (round-5 bisection verdict: the
# fault is the full-size moving-mesh two-branch body inside scan(cond),
# kernel-independent).  Remaining axis: BODY SIZE.  This probe re-runs the
# faulting config with the step body shrunk two independent ways while
# keeping the full mesh/batch shapes:
#   g1: hidden_channels 20 (half the MP width -> ~1/4 the edge-MLP flops)
#   g2: neighbors 16       (half the edge count)
# If either PASSES, the worker fault is a program/body-size threshold; if
# both crash at half size, the trigger is structural (the moving-mesh
# subgraph inside the cond regardless of size).
# RUN ALONE ON THE CHIP (each crash kills that process's worker).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs
stamp() { date -u +%H:%M:%S; }

run_probe() {
    local tag="$1"; shift
    echo "[$(stamp)] === bisect3 $tag: $* ==="
    timeout 2400 env MMPDE_FORCE_SCAN_PUSH=1 python -u mmpde.py \
        --num_epochs 2 --scan_epoch True --pushforward True \
        --residual_head True "$@" > "logs/bisect3_${tag}.log" 2>&1
    local rc=$?
    local ep; ep=$(grep -c 'Mean Timestep Test Error' "logs/bisect3_${tag}.log")
    local verdict=CRASH
    [ "$ep" -ge 2 ] && verdict=PASS
    [ "$rc" -eq 124 ] && [ "$ep" -lt 2 ] && verdict=TIMEOUT-INCONCLUSIVE
    echo "[$(stamp)] $tag rc=$rc epochs=$ep -> $verdict"
}

run_probe g1_half_width --hidden_channels 20
run_probe g2_half_edges --neighbors 16

git add -f logs/bisect3_*.log 2>/dev/null
git commit -q -m "scan+pushforward body-size probe results" -- logs/bisect3_*.log \
    && echo "[$(stamp)] committed bisect3 logs"
echo "[$(stamp)] === bisect3 done ==="
