#!/usr/bin/env python3
"""Merge N single-run bench sweeps (separate JVMs) into one per-row
cross-JVM artifact (r16 sweep protocol).

Why: per-row medians WITHIN one JVM cannot remove per-JVM-lifetime speed
modes — r15 measured code-identical sweeps whose rows disagree as a
block (one JVM globally 15-25% slower: JIT inlining luck / heap layout),
so two single-JVM sweeps cap out at ~70-86% row agreement no matter the
in-JVM protocol. Bench is run K times with SPARK_GRAFT_RUNS=1 (one timed
run per row per JVM, after the shared warmup + per-row block-drop + GC
settle) and the per-row values are combined ACROSS JVMs.

Statistic (r16, measured on a 10-JVM marathon at HEAD — SCALE.md
"Protocol results"): the cross-JVM MEDIAN stalls at 94.6% row agreement
because some rows are per-JVM BIMODAL at ~50/50 (d2_ngram_jaccard: five
JVMs ~50 s, five ~95 s) — the median of any K samples of a p=0.5
bimodal is itself bimodal — and the box adds a machine-lifetime warming
trend (first ~5 serial JVMs read IO-adjacent rows 2-4x slower while the
page cache fills). Every observed noise mechanism is ONE-SIDED —
compilation stalls, cold caches, GC, warming only ever ADD time — so
the distribution's lower edge estimates the operator's intrinsic cost
and upper-tail statistics estimate the environment. Measured agreement
between two interleaved 5-JVM aggregates: median 94.6%, trimmed mean
94.0%, mean 75.6%, min 97.6%, mean-of-2-fastest **98.8%**. The default
statistic is therefore `fast2` (mean of the two fastest JVMs — the
min's reproducibility with a 2-sample guard against a lone fluke);
`--stat=median` keeps the old behavior for comparisons.

The output is an artifact in Bench's exact schema — queries = per-row
cross-JVM fast2, runs = the per-JVM values (<row>_jvmN), value = sum of
rows, n_runs = the JVM count — so agree.py / round-over-round diffs
work unchanged.

Usage: merge_sweeps.py [--stat=fast2|median|min] OUT.json IN1.json IN2.json [...]
"""
import json
import sys


def combine(vals, stat):
    ok = sorted(v for v in vals if v >= 0)
    if not ok:
        return -1.0
    if stat == "median":
        return ok[len(ok) // 2]
    if stat == "min":
        return ok[0]
    # fast2: mean of the two fastest successful runs (one if only one)
    return sum(ok[:2]) / len(ok[:2])


def main() -> None:
    args = sys.argv[1:]
    stat = "fast2"
    if args and args[0].startswith("--stat="):
        stat = args[0].split("=", 1)[1]
        args = args[1:]
    if stat not in ("fast2", "median", "min"):
        sys.exit(f"merge_sweeps.py: unknown --stat={stat} "
                 f"(expected fast2|median|min)")
    out_path, in_paths = args[0], args[1:]
    sweeps = [json.load(open(p)) for p in in_paths]
    keys = sorted(set.intersection(*(set(s["queries"]) for s in sweeps)))
    queries, runs = {}, {}
    for k in keys:
        vals = [s["queries"][k] for s in sweeps]
        queries[k] = combine(vals, stat)
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
        "protocol": f"cross-jvm-{stat}",
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out_path}: {len(keys)} rows, total {total:.1f}s, "
          f"{merged['n_failed']} failed, {len(sweeps)} JVMs, stat={stat}")


if __name__ == "__main__":
    main()
