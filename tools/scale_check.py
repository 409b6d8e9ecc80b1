#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines across scale factors (or run orders).

Usage:
  scale_check.py <small.json> <big.json> [--factor 10] [--budget 12]
      flags queries whose big/small time ratio exceeds --budget (linear
      budget with constant slack); sub-second small-side queries are
      reported but never flagged (fixed overhead dominates them).
  scale_check.py <a.json> <b.json> --order-check
      same-scale comparison (e.g. forward vs reverse registry order):
      reports queries whose times disagree by more than 2x + 2s.
"""
import json, sys


def load(p):
    with open(p) as f:
        return json.loads(f.read().strip())


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a.split("=")[0]: (a.split("=")[1] if "=" in a else True)
             for a in sys.argv[1:] if a.startswith("--")}
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"total: {a['value']:.1f}s -> {b['value']:.1f}s  ({len(common)} common entries)")

    if "--order-check" in flags:
        bad = []
        for q in common:
            lo, hi = sorted([qa[q], qb[q]])
            if hi > 2 * lo + 2.0:
                bad.append((q, qa[q], qb[q]))
        for q, x, y in sorted(bad, key=lambda t: -max(t[1], t[2])):
            print(f"  ORDER-SENSITIVE {q}: {x:.2f}s vs {y:.2f}s")
        print("order check:", "FAIL" if bad else "PASS",
              f"({len(bad)} entries disagree beyond 2x+2s)")
        sys.exit(1 if bad else 0)

    budget = float(flags.get("--budget", 12))
    rows = []
    for q in common:
        small, big = qa[q], qb[q]
        ratio = big / small if small > 0 else float("inf")
        rows.append((q, small, big, ratio))
    rows.sort(key=lambda r: -r[3])
    flagged = []
    print(f"{'query':42s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for q, small, big, ratio in rows:
        mark = ""
        if ratio > budget and small >= 1.0:
            mark = "  <-- SUPERLINEAR"
            flagged.append(q)
        elif ratio > budget:
            mark = "  (sub-second base; overhead-bound)"
        print(f"{q:42s} {small:8.2f} {big:8.2f} {ratio:7.1f}{mark}")
    print(f"\nscale check vs budget {budget}x:",
          "FAIL" if flagged else "PASS",
          f"({len(flagged)} superlinear: {flagged})" if flagged else "")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
