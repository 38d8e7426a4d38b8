#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r02.json vs BENCH_r03.json):
per-query deltas, regressions sorted first.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold_pct] [--floor SEC]

--floor SEC treats the streaming drain floor (measured by
`runMain graft.tools.StreamFloor`; recorded in NOTES_r8.md) as the noise
band for st* queries: an st* delta whose absolute size is within half
the floor is indistinguishable from the runtime's own micro-batch
machinery jitter (the floor itself spreads ~0.97-1.37 s run to run) and
is suppressed instead of reported as a percentage regression.
"""
import json, sys

def load(p):
    with open(p) as f:
        line = f.read().strip()
    return json.loads(line)

def main(old_p, new_p, thresh=10.0, floor=0.0):
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for k in sorted(set(oq) | set(nq)):
        a, b = oq.get(k), nq.get(k)
        if a is None or b is None or a <= 0 or b <= 0:
            rows.append((float("inf"), k, a, b, "added/removed/failed"))
        else:
            pct = (b - a) / a * 100
            if k.startswith("st") and floor > 0 and abs(b - a) <= 0.5 * floor:
                # inside the streaming floor's own jitter: unadjudicatable
                rows.append((0.0, k, a, b, f"{pct:+.0f}% (floor jitter)"))
            else:
                rows.append((pct, k, a, b, f"{pct:+.0f}%"))
    rows.sort(reverse=True)
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
    for pct, k, a, b, label in rows:
        if pct == float("inf") or abs(pct) >= thresh:
            fa = "-" if a is None else f"{a:.2f}"
            fb = "-" if b is None else f"{b:.2f}"
            print(f"  {label:>18}  {k}: {fa}s -> {fb}s")

if __name__ == "__main__":
    argv = sys.argv[1:]
    floor = 0.0
    if "--floor" in argv:
        i = argv.index("--floor")
        floor = float(argv[i + 1])
        del argv[i:i + 2]
    t = float(argv[2]) if len(argv) > 2 else 10.0
    main(argv[0], argv[1], t, floor)
