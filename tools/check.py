#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle and report per-query match.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--gate GATE.json] [query...]

With --gate, also writes a builder-side correctness artifact with the
driver's CORRECTNESS schema per query ({rows_match, schema_match,
hash_match, err}) plus sf / git sha / timestamp — the self-insurance
against an empty driver CORRECTNESS file (VERDICT r9 item #1).

With --correctness CORRECTNESS_rN.json, ALSO writes the flat
name → {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err} map in the driver's EXACT schema (VERDICT r10 item: the driver
artifact shipped empty two rounds running; this file can stand in).
"""
import decimal
import json
import math
import subprocess
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(rows):
    # Hash-strict like the driver: keep type identity and the sign of zero
    # (repr(-0.0) != repr(0.0)), so serialization-level mismatches fail here
    # too, not only in the driver's hash compare.
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("f:NaN")
                else:
                    rr.append("f:" + repr(round(v, 6)))
            elif isinstance(v, bool):
                rr.append("b:" + repr(v))
            elif isinstance(v, int):
                rr.append("i:" + repr(v))
            elif isinstance(v, decimal.Decimal):
                rr.append("f:" + repr(round(float(v), 6)))
            else:
                rr.append("o:" + str(v))
        out.append(tuple(rr))
    # every normalized value is a tagged string, so plain tuple sort is total
    out.sort()
    return out


def compare(con, name, sql, out_dir):
    """One query's gate record: CORRECTNESS-schema booleans + err."""
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        want_rel = con.sql(sql)
        want_cols = want_rel.columns
        want_types = [str(t) for t in want_rel.types]
        want = want_rel.fetchall()
    except Exception as e:
        rec["err"] = f"oracle error: {e}"
        return rec
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = got_rel.columns
        got = got_rel.fetchall()
    except Exception as e:
        rec["err"] = f"spark output missing: {e}"
        return rec
    rec["rows_match"] = len(want) == len(got)
    rec["spark_rows"] = len(got)
    rec["oracle_rows"] = len(want)
    # driver sorts columns by name before hashing
    wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    if sorted(want_cols) != sorted(got_cols):
        rec["err"] = f"columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}"
        return rec
    # The driver's hash tolerates int-width and decimal/double drift
    # (q_ann_* passed r3 with INTEGER vs BIGINT) but NOT int128: a
    # HUGEINT survives the value compare yet breaks the serialized hash
    # (q_infer_freq r3). Flag only the genuinely hash-breaking types.
    bad_types = {c: t for c, t in zip(want_cols, want_types) if "HUGEINT" in t}
    if bad_types:
        rec["err"] = f"oracle emits int128 (hash-breaking): {bad_types}"
        return rec
    rec["schema_match"] = True
    w = norm([tuple(r[i] for i in wi) for r in want])
    g = norm([tuple(r[i] for i in gi) for r in got])
    rec["hash_match"] = w == g
    if not rec["hash_match"]:
        diff_w = [r for r in w if r not in set(g)][:3]
        diff_g = [r for r in g if r not in set(w)][:3]
        rec["err"] = (f"rows oracle={len(w)} spark={len(g)} cols={sorted(want_cols)}"
                      + "".join(f" | oracle-only: {r}" for r in diff_w)
                      + "".join(f" | spark-only: {r}" for r in diff_g))
    rec["n_rows"] = len(g)
    return rec


def main():
    args = [a for a in sys.argv[1:]]
    gate_path = correctness_path = None
    if "--gate" in args:
        i = args.index("--gate")
        gate_path = args[i + 1]
        del args[i:i + 2]
    if "--correctness" in args:
        i = args.index("--correctness")
        correctness_path = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    gate = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rec = compare(con, name, sql, out_dir)
        gate[name] = rec
        if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
            print(f"OK   {name} ({rec['n_rows']} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: {rec['err']}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    if gate_path:
        try:
            sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                                 text=True).stdout.strip()
        except Exception:
            sha = "unknown"
        artifact = {
            "sf_dir": sf_dir,
            "git_sha": sha,
            "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_ok": ok,
            "n_fail": fail,
            "queries": gate,
        }
        with open(gate_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"gate artifact written: {gate_path}")
    if correctness_path:
        keys = ["rows_match", "schema_match", "hash_match", "spark_rows", "oracle_rows", "err"]
        flat = {n: {k: r.get(k) for k in keys} for n, r in gate.items()}
        with open(correctness_path, "w") as f:
            json.dump(flat, f, indent=1, sort_keys=True)
        print(f"driver-schema correctness artifact written: {correctness_path}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
