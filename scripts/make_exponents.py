#!/usr/bin/env python3
"""Three-point scaling-exponent table (r11 verdict item 8).

Reads per-query COLD times at sf0.1 (BENCH_DETAIL_*.json runs[0]),
x10 and x100 (BenchColdSweep JSONs) and prints the markdown table for
docs/SCALE.md: per-family cold totals at each point plus the fitted
decade exponents e01_10 = log10(t10/t01), e10_100 = log10(t100/t10)
(e = 1 is linear in data size; local fixed overhead pushes e below the
work's true order at small times, so read the SECOND decade as the
asymptotic signal). Also lists the top-N single queries by x100 time
with their exponents.

Usage: make_exponents.py <BENCH_DETAIL_sf01> <X10_COLD> <X100> [topN]
"""
import sys, json, math
from collections import defaultdict


def main():
    d01 = {k: v["runs"][0]
           for k, v in json.load(open(sys.argv[1]))["detail"].items()}
    d10 = json.load(open(sys.argv[2]))["cold"]
    d100 = json.load(open(sys.argv[3]))["cold"]
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    common = sorted(set(d01) & set(d10) & set(d100))

    def exp(a, b):
        return math.log10(b / a) if a > 0 and b > 0 else float("nan")

    # NaN keys make max() order-dependent in Python — a 0/negative time
    # (e.g. a failed sweep entry carried through) could name an arbitrary
    # query as the worst exponent (r12 ADVICE). Drop them loudly up front.
    dropped = [q for q in common
               if math.isnan(exp(d01[q], d10[q]))
               or math.isnan(exp(d10[q], d100[q]))]
    if dropped:
        print(f"WARNING: dropped {len(dropped)} queries with non-positive "
              f"times from exponent fits: {dropped}", file=sys.stderr)
        common = [q for q in common if q not in set(dropped)]

    fam = defaultdict(lambda: [0.0, 0.0, 0.0])
    for q in common:
        f = q.split("_")[0]
        fam[f][0] += d01[q]
        fam[f][1] += d10[q]
        fam[f][2] += d100[q]
    print("| family | sf0.1 cold s | ×10 s | ×100 s | e(0.1→×10) | e(×10→×100) |")
    print("|---|---|---|---|---|---|")
    for f in sorted(fam):
        a, b, c = fam[f]
        print(f"| {f} | {a:.1f} | {b:.1f} | {c:.1f} "
              f"| {exp(a, b):.2f} | {exp(b, c):.2f} |")
    ta = sum(v[0] for v in fam.values())
    tb = sum(v[1] for v in fam.values())
    tc = sum(v[2] for v in fam.values())
    print(f"| **total** | {ta:.1f} | {tb:.1f} | {tc:.1f} "
          f"| {exp(ta, tb):.2f} | {exp(tb, tc):.2f} |")
    print()
    print(f"| query (top {top_n} by ×100 cold) | sf0.1 | ×10 | ×100 "
          "| e(0.1→×10) | e(×10→×100) |")
    print("|---|---|---|---|---|---|")
    for q in sorted(common, key=lambda q: -d100[q])[:top_n]:
        print(f"| {q} | {d01[q]:.2f} | {d10[q]:.2f} | {d100[q]:.2f} "
              f"| {exp(d01[q], d10[q]):.2f} | {exp(d10[q], d100[q]):.2f} |")
    worst = max(common, key=lambda q: exp(d10[q], d100[q]))
    print(f"\nworst second-decade exponent: {worst} "
          f"e={exp(d10[worst], d100[worst]):.2f} "
          f"({d10[worst]:.2f}s → {d100[worst]:.2f}s)")


if __name__ == "__main__":
    main()
