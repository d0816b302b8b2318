#!/usr/bin/env python3
"""Old-code/new-code epoch A/B over BENCH_DETAIL sidecars (r11 protocol).

Usage: ab_epoch.py <committed_old_detail> <oldcode_today_detail> \
                   <newcode_today_detail>

For the queries all three runs share, prints the per-query healed-warm
ratio medians:
  - oldcode-today / committed-old  -> the HOST EPOCH alone (same binary)
  - newcode-today / committed-old  -> epoch x code drift
  - newcode-today / oldcode-today  -> code drift alone (same host session)
Warm = min of runs[1:] (runs[0] is cold).
"""
import sys, json, statistics


def warm(path):
    d = json.load(open(path))["detail"]
    out = {}
    for name, q in d.items():
        runs = q.get("runs", [])
        if q.get("rows", 0) < 0 or not runs:
            continue
        out[name] = min(runs[1:]) if len(runs) > 1 else runs[0]
    return out


def main():
    old_commit, old_today, new_today = map(warm, sys.argv[1:4])
    common = sorted(set(old_commit) & set(old_today) & set(new_today))
    print(f"common queries: {len(common)}")

    def med(a, b, label):
        rs = sorted(b[q] / a[q] for q in common if a[q] > 0)
        m = statistics.median(rs)
        lo, hi = rs[len(rs) // 10], rs[-1 - len(rs) // 10]
        print(f"{label}: median {m:.3f}  p10 {lo:.3f}  p90 {hi:.3f}")
        return m

    med(old_commit, old_today, "oldcode-today / committed-old (EPOCH)")
    med(old_commit, new_today, "newcode-today / committed-old (epoch*code)")
    med(old_today, new_today, "newcode-today / oldcode-today (CODE)")


if __name__ == "__main__":
    main()
