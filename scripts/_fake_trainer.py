"""Hang-injection stand-in for mmpde.py, used only by
scripts/test_watchdog_rehearsal.sh (VERDICT r4 next-step 6: prove the
chain watchdog survives a stalled epoch in a CPU rehearsal).

Fresh run: prints a checkpoint dir + two epoch lines, writes a marker
checkpoint, then hangs forever (the injected fault).  Resumed run
(--resume <dir>): verifies the marker, finishes the remaining epochs and
prints Finish! like the real CLI."""
import argparse
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--resume", default=None)
p.add_argument("--ckpt_dir", default="/tmp/wd_rehearsal_ckpt")
a = p.parse_args()

if a.resume:
    assert os.path.exists(os.path.join(a.resume, "state.msgpack")), \
        "resume pointed at a checkpoint that was never written"
    print(a.resume, flush=True)
    for e in range(2, 5):
        print(f"Epoch {e}", flush=True)
        print(f"Mean Timestep Test Error: {1e-4 * (5 - e)}", flush=True)
        time.sleep(0.2)
    print("Finish!", flush=True)
    sys.exit(0)

os.makedirs(a.ckpt_dir, exist_ok=True)
print(f"models/{os.path.basename(a.ckpt_dir)}", flush=True)
# the watchdog resolves {CKPT} from the "models/..." line; the rehearsal
# maps that relative name back onto ckpt_dir via a models/ symlink
for e in range(2):
    print(f"Epoch {e}", flush=True)
    print(f"Mean Timestep Test Error: {1e-3}", flush=True)
    time.sleep(0.2)
with open(os.path.join(a.ckpt_dir, "state.msgpack"), "w") as f:
    f.write("ok")
time.sleep(10_000)  # injected hang
