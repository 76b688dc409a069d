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

# ---- profile-guided step-time A/Bs (r4 profile: scan whiles = 133/192ms) ----
ab() {
    local name="$1"; shift
    local log="logs/r4b_ab_${name}.log"
    [ -s "$log" ] && { echo "[$(stamp)] A/B $name done"; return; }
    echo "[$(stamp)] === A/B $name ==="
    timeout 3600 env "$@" python -u bench.py --step-only > "$log" 2>&1
    echo "[$(stamp)] A/B $name rc=$? -> $(tail -1 "$log")"
}
ab pallas_mp MMPDE_PALLAS_MP=1
ab unroll_layers MMPDE_UNROLL_LAYERS=1
ab pallas_unroll MMPDE_PALLAS_MP=1 MMPDE_UNROLL_LAYERS=1
git add -f logs/r4b_ab_*.log 2>/dev/null && \
    git commit -q -m "Profile-guided step-time A/Bs: pallas_mp, unroll_layers (r4b)" \
    && echo "[$(stamp)] committed r4b A/Bs"
if [ -d .jax_cache ]; then
    mkdir -p .jax_cache_seed && cp -n .jax_cache/* .jax_cache_seed/ 2>/dev/null
    git add -f .jax_cache_seed && git commit -q -m "Cache seed refresh (r4b A/Bs)" || true
fi
