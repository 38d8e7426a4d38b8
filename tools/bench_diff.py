#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r02.json vs BENCH_r03.json):
per-query deltas, regressions sorted first.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold_pct]
"""
import json, sys

def load(p):
    with open(p) as f:
        line = f.read().strip()
    return json.loads(line)

def main(old_p, new_p, thresh=10.0):
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for k in sorted(set(oq) | set(nq)):
        a, b = oq.get(k), nq.get(k)
        if a is None or b is None or a <= 0 or b <= 0:
            rows.append((float("inf"), k, a, b, "added/removed/failed"))
        else:
            pct = (b - a) / a * 100
            rows.append((pct, k, a, b, f"{pct:+.0f}%"))
    rows.sort(reverse=True)
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
    for pct, k, a, b, label in rows:
        if pct == float("inf") or abs(pct) >= thresh:
            fa = "-" if a is None else f"{a:.2f}"
            fb = "-" if b is None else f"{b:.2f}"
            print(f"  {label:>18}  {k}: {fa}s -> {fb}s")

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], t)
