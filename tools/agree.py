#!/usr/bin/env python3
"""Row-agreement gate between two bench sweep artifacts (SCALE.md r16).

Two sweeps "agree" on a row when the slower value is within TOL (default
20%) of the faster one: max(a,b) <= (1+TOL)*min(a,b). Prints per-row
disagreements (worst first) and the summary line the protocol gate reads.
Measurement tooling only — not part of the shipped library.

Usage: agree.py A.json B.json [TOL]
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20
    keys = sorted(set(a) & set(b))
    ok, bad = [], []
    for k in keys:
        va, vb = a[k], b[k]
        if va < 0 or vb < 0:
            bad.append((float("inf"), k, va, vb))
            continue
        lo, hi = min(va, vb), max(va, vb)
        ratio = hi / lo if lo > 0 else float("inf")
        (ok if hi <= (1 + tol) * lo else bad).append((ratio, k, va, vb))
    for ratio, k, va, vb in sorted(bad, reverse=True):
        print(f"  DISAGREE {k}: {va:.3f} vs {vb:.3f} ({ratio:.2f}x)")
    n = len(keys)
    agree = len(ok)
    print(f"agreement: {agree}/{n} = {100.0 * agree / n:.1f}% within "
          f"{int(tol * 100)}% ({len(bad)} disagree)")


if __name__ == "__main__":
    main()
