#!/bin/bash
# Round-4 follow-up evals (run when the chip is idle — after r4_chain.sh
# or in a gap): finer branch-damp sweep + one-step test MSE at the damped
# operating points, on the newest flagship checkpoint.
# Usage: bash scripts/r4b_evals.sh [checkpoint_dir]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
stamp() { date -u +%H:%M:%S; }

CKPT="${1:-}"
if [ -z "$CKPT" ]; then
    # newest moving-mesh burgers checkpoint by config epoch
    CKPT=$(python - <<'EOF'
import glob, json, os
best, arg = -1, ""
for d in glob.glob("models/GNN_PDE_burgers_meshTrue_*"):
    try:
        c = json.load(open(os.path.join(d, "config.json")))
        if c.get("epoch", -1) > best:
            best, arg = c["epoch"], d
    except Exception:
        pass
print(arg)
EOF
)
fi
[ -d "$CKPT" ] || { echo "no checkpoint"; exit 1; }
echo "[$(stamp)] r4b evals on $CKPT"

run() {  # run <tag> <extra args...>
    local tag="$1"; shift
    local log="logs/r4b_${tag}.log"
    [ -s "$log" ] && { echo "[$(stamp)] $tag done"; return; }
    timeout 2400 python -u scripts/eval_rollout.py "$CKPT" "$@" \
        > "$log" 2>&1
    echo "[$(stamp)] $tag rc=$? -> $(tail -1 "$log")"
}

# finer rollout sweep around the r4 ladder's 0.75 optimum
run bd060 --branch_damp 0.6
run bd085 --branch_damp 0.85
run bd090 --branch_damp 0.9
# one-step test MSE at the undamped + damped operating points
run onestep_bd0   --one_step
run onestep_bd075 --one_step --branch_damp 0.75
run onestep_bd085 --one_step --branch_damp 0.85

git add -f logs/r4b_*.log && \
    git commit -q -m "Finer branch-damp sweep + one-step MSE at damped operating points (r4b)" \
    && echo "[$(stamp)] committed r4b evals"
