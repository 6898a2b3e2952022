#!/usr/bin/env python3
"""Merge N full-bench sidecars into one by per-query minimum.

Usage: python3 scripts/bench_merge.py run1.json run2.json [...] > merged

Dev-only (driver-side python). The committed sidecar takes the
per-query/per-setup-row MIN across independent full runs — the r13
discipline for benching on a host with documented bursty external
contention: each run is already best-of-SPARK_GRAFT_BENCH_REPS, but a
burst lasting minutes can swallow all of one query's reps within a
single run (q352, round 14: isolated-profile floor ~1.0 s, single-run
min 2.84 s). `spread` is merged by per-query MAX (the most honest
noise band observed) and kept for EVERY query (r15 — the regression
gate reads it). A query that failed (-1) in one run takes the other
run's value; failed everywhere stays -1. `value` is recomputed as
sum(queries) + sum(setup) — a total no single run achieved, which is
exactly why the merged JSON records its provenance (ADVICE r14):
`merged_from` carries each source file's name + sha256 prefix and
`git_sha` the working-tree HEAD at merge time, and the merge asserts
the runs' query AND setup key sets match exactly (a stale sidecar from
an older code revision would differ in its key sets or show up in the
recorded hashes).
"""
import hashlib
import json
import subprocess
import sys


def main():
    paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in paths]
    assert len(runs) >= 2, "need at least two sidecars to merge"
    sfs = {r["sf"] for r in runs}
    assert len(sfs) == 1, f"mixed sf dirs: {sfs}"
    names = set()
    for r in runs:
        names |= set(r["queries"])
    for r in runs:
        missing = names - set(r["queries"])
        assert not missing, f"query sets differ: {sorted(missing)[:5]}"
    # setup keys are the DfCache build set — a different set means the
    # runs came from different code (a stale sidecar sneaking minima in)
    setup_sets = [frozenset(r.get("setup", {})) for r in runs]
    assert len(set(setup_sets)) == 1, (
        "setup key sets differ across runs — sidecars are from "
        f"different code revisions: {sorted(set(setup_sets[0]) ^ set(setup_sets[-1]))[:5]}")
    queries = {}
    for q in sorted(names):
        vals = [r["queries"][q] for r in runs if r["queries"][q] >= 0]
        queries[q] = min(vals) if vals else -1
    setup_keys = set()
    for r in runs:
        setup_keys |= set(r.get("setup", {}))
    setup = {k: min(r["setup"][k] for r in runs if k in r.get("setup", {}))
             for k in sorted(setup_keys)}
    spread = {}
    for r in runs:
        for q, s in r.get("spread", {}).items():
            spread[q] = max(spread.get(q, 0.0), s)
    total = sum(v for v in queries.values() if v >= 0) + sum(setup.values())
    sources = [
        p.split("/")[-1] + ":" +
        hashlib.sha256(open(p, "rb").read()).hexdigest()[:12]
        for p in paths
    ]
    try:
        git_sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        git_sha = "unknown"
    out = {
        "metric": "total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {q: round(v, 4) for q, v in queries.items()},
        "setup": {k: round(v, 4) for k, v in setup.items()},
        "spread": {q: round(s, 2) for q, s in sorted(spread.items())},
        "sf": runs[0]["sf"],
        "merged_from": sources,
        "git_sha": git_sha,
    }
    json.dump(out, sys.stdout, separators=(",", ":"))
    print()


if __name__ == "__main__":
    main()
