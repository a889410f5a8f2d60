#!/usr/bin/env python3
"""Build the SCALE.md series-cardinality table from Bench JSON lines.

Usage:
  python3 tools/series.py /tmp/serv2_base_{1,2,3}.json -- /tmp/serv2_s100_{1,2,3}.json \
      -- /tmp/serv2_s1k_{1,2,3}.json -- /tmp/serv2_s10k_1.json

Each `--`-separated group is one scale point (p50 over its passes).
Prints a markdown table with per-decade exponents on the SERIES axis:
exp = log10(t2/t1) / log10(series2/series1) per adjacent pair of the
5 / 500 / 5000 / 50000 ladder.
"""
import json
import math
import statistics
import sys


def p50s(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            line = [l for l in f if '"queries"' in l][0]
        runs.append(json.loads(line)["queries"])
    out = {}
    for q in runs[0]:
        vals = [r[q] for r in runs if q in r and r[q] >= 0]
        out[q] = statistics.median(vals)
    return out


def main():
    groups, cur = [], []
    for a in sys.argv[1:]:
        if a == "--":
            groups.append(cur)
            cur = []
        else:
            cur.append(a)
    if cur:
        groups.append(cur)
    series = [5, 500, 5000, 50000][: len(groups)]
    pts = [p50s(g) for g in groups]
    qs = sorted(pts[0])
    hdr = " | ".join(f"{s} series (s)" for s in series)
    exps = " | ".join(
        f"exp {series[i]}→{series[i + 1]}" for i in range(len(series) - 1))
    print(f"| query | {hdr} | {exps} |")
    print("|" + "---|" * (1 + len(series) + len(series) - 1))
    for q in qs:
        row = [q]
        for p in pts:
            row.append(f"{p.get(q, float('nan')):.2f}")
        for i in range(len(series) - 1):
            a, b = pts[i].get(q), pts[i + 1].get(q)
            if a and b and a > 0:
                e = math.log10(b / a) / math.log10(series[i + 1] / series[i])
                row.append(f"{e:.2f}")
            else:
                row.append("–")
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
