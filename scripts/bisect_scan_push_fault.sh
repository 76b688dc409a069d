#!/bin/bash
# Bisect the axon-TPU scan+pushforward worker crash (DIVERGENCES.md #41).
#
# The minimal structural repro (scripts/repro_scan_push_fault.py) PASSES,
# so the trigger needs more of the real step.  This ladder isolates which
# ingredient of the real scan-epoch pushforward program faults the worker:
#
#   a. plain GNN (no moving mesh)  @ tiny res (9,12,12), scan+pushforward
#      -> no kNN/graph build inside the cond; static uniform table only
#   b. plain GNN                   @ flagship res, scan+pushforward
#      -> (a) at full program size
#   c. moving mesh                 @ flagship res, scan+pushforward
#      -> the original faulting program (DMM mesh movement + device kNN +
#         interpolation inside the cond); confirms the fault is still live
#
# Outcomes: if (a) crashes -> scan(cond(grad(GNN))) at any real-model
# scale is enough; if only (b)+(c) crash -> program size; if only (c)
# crashes -> the moving-mesh ingredients (kNN sort/gather in the cond).
#
# PRIOR DATA (2026-08-21): stage (a) already PASSED twice by accident —
# before the on_axon_runtime() guard fix, tiny plain-GNN scan+pushforward
# runs executed the scan path on the axon TPU and completed cleanly
# (losses identical to per-batch).  So tiny-scale is safe; the fault
# needs (b) full-size and/or (c) moving-mesh ingredients.
#
# RUN ONLY IN A DEDICATED CHIP WINDOW: each crash kills the shared TPU
# worker process (every stage is a separate process so the ladder itself
# continues; the worker respawns per-process on this runtime).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs
stamp() { date -u +%H:%M:%S; }

run_stage() {
    local tag="$1"; shift
    echo "[$(stamp)] === bisect stage $tag: $* ==="
    timeout 2700 env MMPDE_FORCE_SCAN_PUSH=1 python -u mmpde.py \
        --num_epochs 2 --n_traj 8 \
        --scan_epoch True --pushforward True --residual_head True "$@" \
        > "logs/bisect_${tag}.log" 2>&1
    local rc=$?
    local ep; ep=$(grep -c '^Epoch' "logs/bisect_${tag}.log")
    echo "[$(stamp)] stage $tag rc=$rc epochs=$ep ($([ "$ep" -ge 2 ] && echo PASS || echo CRASH/INCOMPLETE))"
}

# tiny res: 9 timesteps, 12x12 grid (the test_cli.py shapes)
run_stage a_plain_tiny  --moving_mesh False --base_resolution 9,12,12 \
                        --neighbors 4 --inner_loops 1 --batch_size 3
run_stage b_plain_full  --moving_mesh False
run_stage c_moving_full

git add -f logs/bisect_*.log 2>/dev/null && \
    git commit -q -m "scan+pushforward fault bisection ladder results" \
        -- logs/bisect_*.log && echo "[$(stamp)] committed bisect logs"
echo "[$(stamp)] === bisect done ==="
