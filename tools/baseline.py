#!/usr/bin/env python3
"""Merge N BENCH_FULL.json captures into BASELINE_LOCAL.md: per-query
p50-of-N wall times at sf0.1 (VERDICT r9 #2 — the committed numeric
local baseline the driver's BASELINE.json never published).

Usage: python3 tools/baseline.py BASELINE_LOCAL.md run1.json run2.json run3.json
"""
import json
import statistics
import subprocess
import sys
import time


def main():
    out_path = sys.argv[1]
    runs = [json.load(open(p)) for p in sys.argv[2:]]
    names = sorted(runs[0]["queries"].keys())
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()[:12]
    host = subprocess.run(["uname", "-srm"], capture_output=True, text=True).stdout.strip()
    cpus = subprocess.run(["nproc"], capture_output=True, text=True).stdout.strip()
    p50 = {}
    for q in names:
        vals = [r["queries"].get(q) for r in runs]
        vals = [v for v in vals if v is not None and v >= 0]
        p50[q] = statistics.median(vals) if vals else float("nan")
    totals = [r["value"] for r in runs]
    with open(out_path, "w") as f:
        f.write("# BASELINE_LOCAL — committed numeric per-query baseline\n\n")
        f.write(f"- sf: {runs[0]['sf']}\n")
        f.write(f"- runs: {len(runs)} full Bench passes, per-query p50\n")
        f.write(f"- git: {sha}\n- host: {host}, {cpus} cpus, local[32]\n")
        f.write(f"- generated: {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
        f.write(f"- totals per pass (s): {[round(t, 1) for t in totals]}"
                f" (median {round(statistics.median(totals), 1)})\n\n")
        f.write("Round-over-round comparisons should diff these p50s; single-pass\n"
                "driver numbers on a contended host are a variance band (VERDICT r8/r9).\n\n")
        f.write("| query | p50 (s) |\n|---|---|\n")
        for q in names:
            f.write(f"| {q} | {p50[q]:.3f} |\n")
    slow = sorted(p50.items(), key=lambda kv: -kv[1])[:15]
    print("slowest:", [(q, round(v, 2)) for q, v in slow])
    print(f"written: {out_path} ({len(names)} queries)")


if __name__ == "__main__":
    main()
