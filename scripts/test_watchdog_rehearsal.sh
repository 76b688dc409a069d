#!/bin/bash
# CPU rehearsal for scripts/watchdog_run.sh (VERDICT r4 next-step 6):
# inject a mid-training hang via scripts/_fake_trainer.py and assert the
# watchdog (a) detects the stall, (b) kills the recorded PID only,
# (c) relaunches with {CKPT} resolved from the log, and (d) the resumed
# run completes.  Runs in ~1 min with tightened thresholds.
set -eu
cd "$(dirname "$0")/.."
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
mkdir -p "$WORK/models"
CKPT="$WORK/models/wd_rehearsal_ckpt"
LOG="$WORK/run.log"

cd "$WORK"
STALL_S=5 WARMUP_STALL_S=5 POLL_S=2 MAX_RESUMES=2 \
bash /root/repo/scripts/watchdog_run.sh "$LOG" 120 \
    "python -u /root/repo/scripts/_fake_trainer.py --ckpt_dir $CKPT" \
    "python -u /root/repo/scripts/_fake_trainer.py --ckpt_dir $CKPT --resume {CKPT}" \
    2> "$WORK/wd.log" || rc=$?
rc=${rc:-0}  # set -e must not skip the diagnostics below on failure

echo "--- watchdog stderr ---"; cat "$WORK/wd.log"
echo "--- run log tail ---"; tail -5 "$LOG"

grep -q "STALL" "$WORK/wd.log" || { echo "FAIL: stall never detected"; exit 1; }
grep -q "resume #1" "$WORK/wd.log" || { echo "FAIL: no resume attempted"; exit 1; }
grep -q "Finish!" "$LOG" || { echo "FAIL: resumed run did not finish"; exit 1; }
[ "$rc" -eq 0 ] || { echo "FAIL: watchdog exit rc=$rc"; exit 1; }
echo "PASS: watchdog rehearsal (stall detected, PID killed, resumed to completion)"
