#!/usr/bin/env python3
"""Interleaved bench A/B: current worktree vs a named commit.

Automates the per-round drift decomposition previously assembled by hand:
builds the baseline commit in a throwaway git worktree, runs graft.Bench in
both trees INTERLEAVED (new, old, new, old, ...) so machine drift hits both
sides equally, then decomposes the delta into

  - common-set drift (same queries, both trees): the machine/environment
    band — a uniform ratio here is drift, not a code regression;
  - new-coverage cost (queries only in the current tree);
  - removed queries (only in the baseline);
  - per-query regressions on the common set, worst first.

Usage:
  python3 tools/bench_ab.py <baseline-commitish> [--sf DIR] [--reps N]
                            [--cpus N] [--out FILE]

Each rep is a full graft.Bench run (itself min-of-3 per query); per-query
times are min-of-reps per side. Output JSON: bench_ab.json (and stdout).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

def run(cmd, cwd=None, env=None, check=True):
    r = subprocess.run(cmd, cwd=cwd, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    if check and r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:])
        raise SystemExit(f"command failed ({r.returncode}): {' '.join(cmd)}")
    return r.stdout

def bench_once(tree, sf, cpus):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    run(["sbt", "-batch", "runMain graft.Bench"], cwd=tree, env=env)
    with open(os.path.join(tree, "bench_full.json")) as f:
        d = json.load(f)
    if d.get("failed"):
        sys.stderr.write(f"WARNING: failed queries in {tree}: {d['failed']}\n")
    return {k: v for k, v in d["queries"].items() if v >= 0}

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="commit-ish to compare against")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1,
                    help="interleaved reps per side (Bench is min-of-3 "
                         "per query internally; raise for noisy machines)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="bench_ab.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_sha = run(["git", "rev-parse", "--short", args.baseline],
                   cwd=repo).strip()
    head_sha = run(["git", "rev-parse", "--short", "HEAD"], cwd=repo).strip()
    wt = f"/tmp/graft-ab-{base_sha}"
    if os.path.isdir(wt):
        run(["git", "worktree", "remove", "--force", wt], cwd=repo,
            check=False)
        shutil.rmtree(wt, ignore_errors=True)
    run(["git", "worktree", "add", "--detach", wt, args.baseline], cwd=repo)
    try:
        new_runs, old_runs = [], []
        for i in range(args.reps):  # interleaved: drift hits both sides
            print(f"[ab] rep {i + 1}/{args.reps}: current ({head_sha})",
                  flush=True)
            new_runs.append(bench_once(repo, args.sf, args.cpus))
            print(f"[ab] rep {i + 1}/{args.reps}: baseline ({base_sha})",
                  flush=True)
            old_runs.append(bench_once(wt, args.sf, args.cpus))
    finally:
        run(["git", "worktree", "remove", "--force", wt], cwd=repo,
            check=False)

    def fold(runs):
        out = {}
        for r in runs:
            for k, v in r.items():
                out[k] = min(out.get(k, v), v)
        return out

    new, old = fold(new_runs), fold(old_runs)
    common = sorted(set(new) & set(old))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    old_c = sum(old[q] for q in common)
    new_c = sum(new[q] for q in common)
    regress = sorted(
        ({"q": q, "old": round(old[q], 3), "new": round(new[q], 3),
          "ratio": round(new[q] / old[q], 3)}
         for q in common if old[q] > 0.05),
        key=lambda r: -r["ratio"])[:10]
    report = {
        "baseline": base_sha, "current": head_sha, "sf": args.sf,
        "reps": args.reps,
        "common": {"n": len(common), "old_total": round(old_c, 2),
                   "new_total": round(new_c, 2),
                   "drift_pct": round(100.0 * (new_c - old_c) / old_c, 1)
                   if old_c else 0.0},
        "new_coverage": {"total": round(sum(new[q] for q in added), 2),
                         "queries": {q: round(new[q], 3) for q in added}},
        "removed_queries": removed,
        "top_common_ratios": regress,
    }
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))

if __name__ == "__main__":
    main()
