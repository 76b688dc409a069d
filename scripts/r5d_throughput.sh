#!/bin/bash
# Throughput-mode cells (ROADMAP round-6 candidate 5, run opportunistically
# in any spare chip gap): the headline bench stays the reference's batch-6
# training step, but the MXU sits at ~2.3% there — larger batches amortize
# the HBM traffic of the [B,N,k,H] edge stacks and show the chip's real
# training throughput ceiling.  Each cell prints the usual one-line JSON
# with "samples/s" derivable as steps/s * batch.
# RUN ALONE ON THE CHIP.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs
stamp() { date -u +%H:%M:%S; }
for B in 24 48; do
    [ -s "logs/r5d_tp_b${B}.log" ] && continue
    echo "[$(stamp)] === throughput batch $B ==="
    timeout "${CELL_TIMEOUT_S:-900}" env MMPDE_BENCH_BATCH=$B \
        python -u bench.py --step-only > "logs/r5d_tp_b${B}.log" 2>&1
    echo "[$(stamp)] batch $B rc=$? -> $(tail -1 "logs/r5d_tp_b${B}.log")"
done
git add -f logs/r5d_tp_b*.log 2>/dev/null
git commit -q -m "Throughput-mode training-step cells at batch 24/48" \
    -- logs/r5d_tp_b*.log && echo "[$(stamp)] committed"
