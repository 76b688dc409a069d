#!/bin/bash
# watchdog_run.sh LOG BUDGET_S "INITIAL_CMD" "RESUME_CMD"
#
# Chain watchdog (VERDICT r4 next-step 6): two TPU-side hangs in two
# rounds (r3f epoch 40, r4c cy epoch 25) each cost the rest of a chip
# window because the chain blocked on a process that never exited.  This
# wrapper runs a training CLI, watches its log for output growth, and on
# a stall kills the exact recorded PID (never by pattern) and relaunches
# the resume command, substituting {CKPT} with the last checkpoint dir
# the run printed (mmpde.py prints "models/<name>"; dmm.py resumes via
# --resume True so its template simply omits {CKPT}).
#
# Stall thresholds: before the first completed epoch (cold remote XLA
# compiles legitimately take 25-60 min of silence) the threshold is
# WARMUP_STALL_S (default 4500); after the first "Mean Timestep Test
# Error"/"test_equ" line it tightens to STALL_S (default 2400 — epochs
# are 100 s (burgers) to 150 s (cy), so 40 min of silence is a hang).
# Overridable via env for the CPU rehearsal
# (scripts/test_watchdog_rehearsal.sh).
#
# Exit code: the wrapped command's final exit code (124 if the overall
# BUDGET_S ran out, 125 if MAX_RESUMES exhausted while still stalled).
set -u
LOG="$1"; BUDGET_S="$2"; INITIAL_CMD="$3"; RESUME_CMD="${4:-}"
STALL_S="${STALL_S:-2400}"
WARMUP_STALL_S="${WARMUP_STALL_S:-4500}"
MAX_RESUMES="${MAX_RESUMES:-4}"
POLL_S="${POLL_S:-30}"

stamp() { date -u +%H:%M:%S; }
start=$(date +%s)
deadline=$(( start + BUDGET_S ))

launch() {
    # shellcheck disable=SC2086
    bash -c "$1" >> "$LOG" 2>&1 &
    CHILD=$!
    echo "[$(stamp)] watchdog: launched pid $CHILD: $1" >&2
}

progressed() {  # has at least one epoch eval line appeared?
    grep -qE 'Mean Timestep Test Error|test_equ|^Epoch [1-9]' "$LOG" 2>/dev/null
}

: > "$LOG"
launch "$INITIAL_CMD"
resumes=0
last_size=0
last_growth=$(date +%s)
rc=0

while :; do
    sleep "$POLL_S"
    now=$(date +%s)
    if ! kill -0 "$CHILD" 2>/dev/null; then
        wait "$CHILD"; rc=$?
        echo "[$(stamp)] watchdog: pid $CHILD exited rc=$rc" >&2
        break
    fi
    if [ "$now" -ge "$deadline" ]; then
        echo "[$(stamp)] watchdog: budget ${BUDGET_S}s exhausted, stopping pid $CHILD" >&2
        kill "$CHILD" 2>/dev/null; sleep 10; kill -9 "$CHILD" 2>/dev/null
        wait "$CHILD" 2>/dev/null
        rc=124; break
    fi
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$size" -ne "$last_size" ]; then
        last_size=$size; last_growth=$now; continue
    fi
    thresh=$WARMUP_STALL_S
    progressed && thresh=$STALL_S
    if [ $(( now - last_growth )) -ge "$thresh" ]; then
        echo "[$(stamp)] watchdog: STALL (${thresh}s no output), killing pid $CHILD" >&2
        kill "$CHILD" 2>/dev/null; sleep 10; kill -9 "$CHILD" 2>/dev/null
        wait "$CHILD" 2>/dev/null
        if [ -z "$RESUME_CMD" ] || [ "$resumes" -ge "$MAX_RESUMES" ]; then
            echo "[$(stamp)] watchdog: no resume available (resumes=$resumes), giving up" >&2
            rc=125; break
        fi
        # newest-to-oldest: every (re)launch prints a NEW save dir, and a
        # relaunch that stalls before its first save must fall back to the
        # previous launch's checkpoint, not restart from scratch
        ckpt=""
        for c in $(grep -oE '^models/[^ ]+' "$LOG" | tac); do
            [ -e "$c/state.msgpack" ] && { ckpt=$c; break; }
        done
        if [ -n "$ckpt" ] && [ -e "$ckpt/state.msgpack" ]; then
            cmd=${RESUME_CMD//\{CKPT\}/$ckpt}
        else
            # stalled before the first per-epoch save (e.g. a compile
            # hang): nothing to resume, relaunch fresh instead of handing
            # the CLI a checkpoint dir without a state file
            echo "[$(stamp)] watchdog: no saved state yet, relaunching fresh" >&2
            cmd="$INITIAL_CMD"
        fi
        resumes=$(( resumes + 1 ))
        echo "[$(stamp)] watchdog: resume #$resumes (ckpt='$ckpt')" >&2
        launch "$cmd"
        last_growth=$(date +%s)
    fi
done
exit "$rc"
