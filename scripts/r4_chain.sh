#!/bin/bash
# Round-4 chain — VERDICT r3 "next round" items that need the real chip:
#   1. mesh-damp ladder on the committed epoch-39 flagship checkpoint
#      (eval-time lever for the rollout gap; DIVERGENCES 38)
#   2. flagship resume -> 80 epochs with --unrolling 2 pushforward
#      (training lever), then rollout at damp 0 + the ladder's best
#   3. cylinder DMM at the reference config -> cy_checkpoint
#   4. MM-PDE cy pushforward + rollout, plus the plain-cy rollout for the
#      head-to-head row
#   5. BaseCNN ablation number (20 epochs + test MSE + rollout)
#   6. Burgers DMM resume 29 -> 150 Adam epochs + RF refit
#   7. compile-cache seed + scan-pushforward proof + bench refresh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p logs models

DEADLINE=$(date -d '2026-08-21 14:00 UTC' +%s)
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

ckpt_epoch() {
    python -c "import json,sys; print(json.load(open(sys.argv[1]+'/config.json')).get('epoch',-1))" "$1" 2>/dev/null || echo -1
}

seed_cache() {
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_seed
        cp -n .jax_cache/* .jax_cache_seed/ 2>/dev/null
        local sz=$(du -sm .jax_cache_seed | cut -f1)
        if [ "$sz" -lt 250 ]; then
            ckpt_commit "Compile-cache seed refresh (${sz} MB)" .jax_cache_seed
        else
            echo "[$(stamp)] .jax_cache_seed too large (${sz} MB) — pruning to newest 200MB not attempted"
        fi
    fi
}

FLAG39=models/GNN_PDE_burgers_meshTrue_xresolution31-48_n35_knn_tw1_unrolling1_time08-20-23-39-40

# ---- stage 1: damp ladders on the committed flagship ckpt ----
# mesh_damp=0.5 measured ~neutral (28.35 vs 28.47, logs/r4_damp05.log):
# the divergence is not displacement-magnitude-driven.  Diagnose the
# correction branch instead: branch_damp ladder + the mesh_damp=1 extreme.
# All points share ONE compiled program (damps are traced operands).
ladder() {
    local flagval="$1" flag="$2" log="$3"
    [ -s "$log" ] && { echo "[$(stamp)] ladder $flag=$flagval done"; return; }
    have_time 900 || return
    echo "[$(stamp)] === ladder $flag $flagval ==="
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$FLAG39" \
        "$flag" "$flagval" > "$log" 2>&1
    echo "[$(stamp)] $flag=$flagval rc=$? -> $(tail -1 "$log")"
}
ladder 0.25 --branch_damp logs/r4_bdamp025.log
ladder 0.5  --branch_damp logs/r4_bdamp05.log
ladder 0.75 --branch_damp logs/r4_bdamp075.log
ladder 1.0  --branch_damp logs/r4_bdamp10.log
ladder 1.0  --mesh_damp   logs/r4_damp10.log
ckpt_commit "Damp rollout ladders on the epoch-39 flagship checkpoint (r4 stage 1)" \
    logs/r4_damp05.log logs/r4_damp10.log logs/r4_bdamp025.log \
    logs/r4_bdamp05.log logs/r4_bdamp075.log logs/r4_bdamp10.log

# ---- stage 1.5: latency probe + profiled bench (ROADMAP #8) ----
if [ ! -s logs/r4_latency.log ] && have_time 900; then
    echo "[$(stamp)] === stage 1.5: dispatch-latency probe ==="
    timeout "$(tbudget 600)" python -u scripts/latency_probe.py \
        > logs/r4_latency.log 2>&1
    echo "[$(stamp)] latency rc=$? -> $(tail -1 logs/r4_latency.log)"
fi
if [ ! -d logs/profile_bench ] && have_time 1500; then
    echo "[$(stamp)] === stage 1.5b: profiled per-step bench ==="
    timeout "$(tbudget 2400)" python -u bench.py --step-only --profile \
        > logs/r4_bench_profiled.log 2>&1
    echo "[$(stamp)] profiled bench rc=$? -> $(tail -1 logs/r4_bench_profiled.log)"
fi
ckpt_commit "Dispatch-latency probe + profiled bench trace (r4 stage 1.5)" \
    logs/r4_latency.log logs/r4_bench_profiled.log logs/profile_bench

# ---- stage 2: flagship unrolling-2 pushforward resume -> 80 epochs ----
MM_CKPT="$FLAG39"
if have_time 5400; then
    echo "[$(stamp)] === stage 2: resume flagship to 80 epochs, unrolling 2 ==="
    rb=$(( $(remain) - 14400 )); [ "$rb" -gt 10800 ] || rb=10800
    timeout "$(tbudget $rb)" python -u mmpde.py --lr 6e-4 \
        --num_epochs 80 --unrolling 2 --pushforward True \
        --residual_head True --n_traj 100 --scan_epoch False \
        --resume "$FLAG39" > logs/r4_mmpde_push_u2.log 2>&1
    echo "[$(stamp)] stage 2 rc=$?"
    c=$(solver_ckpt logs/r4_mmpde_push_u2.log)
    if [ -n "$c" ] && validate_ckpt "$c" True True \
       && [ "$(ckpt_epoch "$c")" -gt 39 ]; then MM_CKPT="$c"; fi
    seed_cache
fi
if [ "$MM_CKPT" != "$FLAG39" ] && have_time 600; then
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$MM_CKPT" \
        > logs/r4_rollout_u2.log 2>&1
    echo "[$(stamp)] u2 rollout rc=$? -> $(tail -1 logs/r4_rollout_u2.log)"
    # best (flag, value) across both ladders (smallest rel-L2)
    BEST_DAMP=$(python - <<'EOF'
import glob, json
best, args = 1e30, "--branch_damp 0.5"
for f in glob.glob("logs/r4_damp*.log") + glob.glob("logs/r4_bdamp*.log"):
    try:
        d = json.loads(open(f).read().strip().splitlines()[-1])
        if d["value"] < best:
            if d.get("branch_damp"):
                a = f"--branch_damp {d['branch_damp']}"
            else:
                a = f"--mesh_damp {d.get('mesh_damp', 0.5)}"
            best, args = d["value"], a
    except Exception:
        pass
print(args)
EOF
)
    timeout "$(tbudget 2400)" python -u scripts/eval_rollout.py "$MM_CKPT" \
        $BEST_DAMP > logs/r4_rollout_u2_damp.log 2>&1
    echo "[$(stamp)] u2 $BEST_DAMP rollout rc=$? -> $(tail -1 logs/r4_rollout_u2_damp.log)"
    ckpt_commit "Flagship unrolling-2 pushforward to 80 epochs + rollouts (r4 stage 2)" \
        "$MM_CKPT" logs/r4_mmpde_push_u2.log logs/r4_rollout_u2.log \
        logs/r4_rollout_u2_damp.log
fi

# ---- stage 3: cylinder DMM (reference config) ----
if [ ! -d cy_checkpoint ] && have_time 2400; then
    echo "[$(stamp)] === stage 3: DMM cy ==="
    timeout "$(tbudget 5400)" python -u dmm.py --experiment cy \
        --train_sample_grid 1500 --branch_layers 4,3 --trunk_layers 16,512 \
        --epochs_adam 150 --epochs_rf 1 --eval_every 25 --n_traj 100 \
        --plot True > logs/r4_dmm_cy.log 2>&1
    echo "[$(stamp)] stage 3 rc=$? ($(grep -c '^Epoch' logs/r4_dmm_cy.log) epochs)"
    if [ "$(grep -c '^Epoch' logs/r4_dmm_cy.log)" -gt 0 ]; then
        ckpt_commit "Cylinder DMM checkpoint at the reference config (r4 stage 3)" \
            cy_checkpoint logs/r4_dmm_cy.log cy data/cylinder_rot_tri.npy
    else
        ckpt_commit "r4 cy DMM log (no epochs)" logs/r4_dmm_cy.log
    fi
    seed_cache
fi

# ---- stage 4: MM-PDE cy pushforward + rollout head-to-head ----
if [ -d cy_checkpoint ] && have_time 3000; then
    echo "[$(stamp)] === stage 4: MM-PDE cy pushforward ==="
    timeout "$(tbudget 7200)" python -u mmpde.py --experiment cy \
        --base_resolution 30,2521 --lr 6e-4 --num_epochs 40 --unrolling 1 \
        --pushforward True --residual_head True --n_traj 100 \
        > logs/r4_mmpde_cy.log 2>&1
    echo "[$(stamp)] stage 4 rc=$?; epochs: $(grep -c '^Epoch' logs/r4_mmpde_cy.log)"
    c=$(solver_ckpt logs/r4_mmpde_cy.log)
    if [ -n "$c" ] && validate_ckpt "$c" True True; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$c" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r4_rollout_mmpde_cy.log 2>&1
        echo "[$(stamp)] cy rollout rc=$? -> $(tail -1 logs/r4_rollout_mmpde_cy.log)"
        ckpt_commit "MM-PDE cy pushforward run + rollout (r4 stage 4)" \
            "$c" logs/r4_mmpde_cy.log logs/r4_rollout_mmpde_cy.log
    else
        ckpt_commit "MM-PDE cy pushforward log (no valid checkpoint)" \
            logs/r4_mmpde_cy.log
    fi
    # plain-cy rollout for the head-to-head row (committed r2 checkpoint)
    PLAIN_CY=models/GNN_PDE_cy_meshFalse_xresolution30-2521_n35_knn_tw1_unrolling1_time08-20-04-51-06
    if [ -d "$PLAIN_CY" ] && [ ! -s logs/r4_rollout_gnn_cy.log ] && have_time 900; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$PLAIN_CY" \
            --experiment cy --base_resolution 30,2521 \
            > logs/r4_rollout_gnn_cy.log 2>&1
        echo "[$(stamp)] plain cy rollout rc=$? -> $(tail -1 logs/r4_rollout_gnn_cy.log)"
        ckpt_commit "Plain-GNN cy rollout (head-to-head row, r4)" \
            logs/r4_rollout_gnn_cy.log
    fi
    seed_cache
fi

# ---- stage 5: BaseCNN ablation ----
if have_time 2400; then
    echo "[$(stamp)] === stage 5: BaseCNN 20 epochs ==="
    timeout "$(tbudget 3600)" python -u mmpde.py --model BaseCNN \
        --num_epochs 20 --n_traj 100 > logs/r4_cnn.log 2>&1
    echo "[$(stamp)] stage 5 rc=$? ($(grep -c '^Epoch' logs/r4_cnn.log) epochs)"
    c=$(solver_ckpt logs/r4_cnn.log)
    if [ -n "$c" ]; then
        timeout "$(tbudget 1800)" python -u scripts/eval_rollout.py "$c" \
            > logs/r4_rollout_cnn.log 2>&1 || true
        ckpt_commit "BaseCNN ablation: 20 epochs + test MSE + rollout (r4 stage 5)" \
            "$c" logs/r4_cnn.log logs/r4_rollout_cnn.log
    else
        ckpt_commit "r4 BaseCNN log (no checkpoint)" logs/r4_cnn.log
    fi
    seed_cache
fi

# ---- stage 6: Burgers DMM resume 29 -> 150 Adam epochs + RF ----
if have_time 2400; then
    ep=$(ckpt_epoch burgers_checkpoint)
    echo "[$(stamp)] === stage 6: DMM burgers resume (epoch $ep -> 150) ==="
    timeout "$(tbudget 7200)" python -u dmm.py --resume True \
        --epochs_adam 150 --epochs_rf 1 --eval_every 10 --n_traj 100 \
        --plot True > logs/r4_dmm_burgers_resume.log 2>&1
    echo "[$(stamp)] stage 6 rc=$? (now epoch $(ckpt_epoch burgers_checkpoint))"
    if [ "$(ckpt_epoch burgers_checkpoint)" -gt "$ep" ]; then
        ckpt_commit "Burgers DMM resumed to the reference 150-epoch budget (r4 stage 6)" \
            burgers_checkpoint logs/r4_dmm_burgers_resume.log burgers
    fi
fi

# ---- stage 7: scan-pushforward proof + bench refresh ----
if [ "$MM_CKPT" != "$FLAG39" ] && have_time 3000; then
    echo "[$(stamp)] === stage 7a: scan-epoch pushforward proof (3 epochs) ==="
    timeout "$(tbudget 4800)" python -u mmpde.py --lr 6e-4 \
        --num_epochs $(( $(ckpt_epoch "$MM_CKPT") + 4 )) --unrolling 2 \
        --pushforward True --residual_head True --n_traj 100 \
        --scan_epoch True --resume "$MM_CKPT" \
        > logs/r4_scan_push_proof.log 2>&1
    echo "[$(stamp)] 7a rc=$? ($(grep -c '^Epoch' logs/r4_scan_push_proof.log) epochs)"
    ckpt_commit "Scan-epoch pushforward proof run (cond-unroll program, r4 stage 7a)" \
        logs/r4_scan_push_proof.log
    seed_cache
fi
if have_time 3600; then
    # compile + measure the scan-epoch bench path once with a real budget
    # (every r2/r3 bench window timed its cold compile out), then seed the
    # cache so the driver bench can pick the faster path warm
    echo "[$(stamp)] === stage 7b-pre: scan-path bench compile ==="
    timeout "$(tbudget 5400)" python -u bench.py --scan \
        > logs/r4_bench_scan.log 2>&1
    echo "[$(stamp)] scan bench rc=$? -> $(tail -1 logs/r4_bench_scan.log)"
    if [ -d .jax_cache ]; then
        mkdir -p .jax_cache_bench
        cp -n .jax_cache/* .jax_cache_bench/ 2>/dev/null
    fi
    ckpt_commit "Scan-path bench measurement + bench cache seed (r4 stage 7b-pre)" \
        logs/r4_bench_scan.log .jax_cache_bench
fi
if have_time 1200; then
    echo "[$(stamp)] === stage 7b: bench refresh ==="
    timeout "$(tbudget 2400)" python -u bench.py > logs/r4_bench.log 2>&1
    echo "[$(stamp)] bench rc=$? -> $(tail -1 logs/r4_bench.log)"
    ckpt_commit "Bench refresh with fixed FLOPs accounting (r4 stage 7b)" \
        logs/r4_bench.log
fi

echo "[$(stamp)] === r4 chain done ==="
