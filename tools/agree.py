#!/usr/bin/env python3
"""Row-agreement gate between two bench sweep artifacts (SCALE.md r16).

Two sweeps "agree" on a row when the slower value is within TOL (default
20%) of the faster one: max(a,b) <= (1+TOL)*min(a,b). Prints per-row
disagreements (worst first) and the summary line the protocol gate reads.
Measurement tooling only — not part of the shipped library.

FLOOR (--floor=SEC, default 0) drops rows whose FASTER side is under SEC
seconds from the gate denominator: a 20% window on a 0.2 s fixture row is
40 ms — timer/JIT jitter, not operator cost — so the r17 protocol gate
runs with --floor=1.0 and the excluded rows are reported, not hidden.

Usage: agree.py [--floor=SEC] A.json B.json [TOL]
"""
import json
import sys


def main() -> None:
    args = sys.argv[1:]
    floor = 0.0
    if args and args[0].startswith("--floor="):
        floor = float(args[0].split("=", 1)[1])
        args = args[1:]
    a = json.load(open(args[0]))["queries"]
    b = json.load(open(args[1]))["queries"]
    tol = float(args[2]) if len(args) > 2 else 0.20
    keys = sorted(set(a) & set(b))
    if not keys:
        sys.exit("agree.py: the two artifacts share no query keys")
    ok, bad, floored = [], [], []
    for k in keys:
        va, vb = a[k], b[k]
        if va < 0 or vb < 0:
            bad.append((float("inf"), k, va, vb))
            continue
        lo, hi = min(va, vb), max(va, vb)
        if lo < floor:
            floored.append(k)
            continue
        ratio = hi / lo if lo > 0 else float("inf")
        (ok if hi <= (1 + tol) * lo else bad).append((ratio, k, va, vb))
    for ratio, k, va, vb in sorted(bad, reverse=True):
        print(f"  DISAGREE {k}: {va:.3f} vs {vb:.3f} ({ratio:.2f}x)")
    if floored:
        print(f"  (floor {floor}s excluded {len(floored)} sub-floor rows: "
              f"{', '.join(floored)})")
    n = len(ok) + len(bad)
    if n == 0:
        sys.exit(f"agree.py: every common row is under the {floor}s floor")
    agree = len(ok)
    print(f"agreement: {agree}/{n} = {100.0 * agree / n:.1f}% within "
          f"{int(tol * 100)}% ({len(bad)} disagree)")


if __name__ == "__main__":
    main()
