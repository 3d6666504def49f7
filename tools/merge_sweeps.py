#!/usr/bin/env python3
"""Merge N single-run bench sweeps (separate JVMs) into one per-row
cross-JVM-median artifact (r16 sweep protocol).

Why: per-row medians WITHIN one JVM cannot remove per-JVM-lifetime speed
modes — r15 measured code-identical sweeps whose rows disagree as a
block (one JVM globally 15-25% slower: JIT inlining luck / heap layout),
so two single-JVM sweeps cap out at ~70-86% row agreement no matter the
in-JVM protocol. The fix is to take each row's median ACROSS independent
JVMs: per-JVM modes become samples the median rejects. Bench is run K
times with SPARK_GRAFT_RUNS=1 (one timed run per row per JVM, after the
shared warmup + per-row block-drop + GC settle); this script emits an
artifact in Bench's exact schema — queries = per-row cross-JVM medians,
runs = the per-JVM values (<row>_jvmN), value = sum of medians, n_runs =
the JVM count — so agree.py / round-over-round diffs work unchanged.

Usage: merge_sweeps.py OUT.json IN1.json IN2.json [IN3.json ...]
"""
import json
import sys


def main() -> None:
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    sweeps = [json.load(open(p)) for p in in_paths]
    keys = sorted(set.intersection(*(set(s["queries"]) for s in sweeps)))
    queries, runs = {}, {}
    for k in keys:
        vals = [s["queries"][k] for s in sweeps]
        ok = sorted(v for v in vals if v >= 0)
        # median over successes only, Bench's rule; no successes -> -1
        queries[k] = ok[len(ok) // 2] if ok else -1.0
        for i, v in enumerate(vals):
            runs[f"{k}_jvm{i + 1}"] = v
    total = sum(v for v in queries.values() if v >= 0)
    merged = {
        "metric": "total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "runs": {k: round(v, 3) for k, v in runs.items()},
        "sf": sweeps[0].get("sf"),
        "n_queries": len(keys),
        "heap_gb": sweeps[0].get("heap_gb"),
        "cpus": sweeps[0].get("cpus"),
        "n_failed": sum(1 for v in queries.values() if v < 0),
        "n_runs": len(sweeps),
        "protocol": "cross-jvm-median",
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out_path}: {len(keys)} rows, total {total:.1f}s, "
          f"{merged['n_failed']} failed, {len(sweeps)} JVMs")


if __name__ == "__main__":
    main()
