"""Summarize a jax.profiler trace directory (ROADMAP #8).

Finds the newest ``*.trace.json.gz`` under the given directory (default
logs/profile_bench), aggregates chrome-trace complete events by name per
process/track, and prints the top spans — enough to see where the
~95 ms/step the component table does not account for goes (device op
breakdown when the plugin exports device tracks; host-side dispatch gaps
otherwise).

    python scripts/analyze_profile.py [trace_dir] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(path):
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir", nargs="?", default="logs/profile_bench")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        sys.exit(f"no *.trace.json.gz under {args.trace_dir}")
    path = files[-1]
    print(f"trace: {path}")
    data = load_trace(path)
    events = data.get("traceEvents", [])

    pids = {e["pid"]: e["args"].get("name", str(e["pid"]))
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and isinstance(e.get("args"), dict)}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", str(e["tid"]))
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and isinstance(e.get("args"), dict)}

    # complete events (ph == 'X') carry wall duration in us
    by_track = collections.defaultdict(
        lambda: collections.defaultdict(lambda: [0.0, 0]))
    span = collections.defaultdict(lambda: [float("inf"), 0.0])
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        track = (pids.get(pid, str(pid)), tids.get((pid, tid), str(tid)))
        dur = float(e.get("dur", 0.0))
        agg = by_track[track][e.get("name", "?")]
        agg[0] += dur
        agg[1] += 1
        ts = float(e.get("ts", 0.0))
        span[track][0] = min(span[track][0], ts)
        span[track][1] = max(span[track][1], ts + dur)

    for track in sorted(by_track,
                        key=lambda t: -sum(v[0] for v in
                                           by_track[t].values())):
        names = by_track[track]
        total = sum(v[0] for v in names.values())
        lo, hi = span[track]
        print(f"\n== track {track[0]} / {track[1]} — busy "
              f"{total / 1e3:.1f} ms over {(hi - lo) / 1e3:.1f} ms wall "
              f"({100 * total / max(hi - lo, 1):.0f}% occupancy)")
        for name, (dur, cnt) in sorted(names.items(),
                                       key=lambda kv: -kv[1][0])[:args.top]:
            print(f"  {dur / 1e3:9.2f} ms  x{cnt:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
