#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle and report per-query match.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query...]
"""
import decimal
import json
import math
import sys

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


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want_rel = con.sql(sql)
            want_cols = want_rel.columns
            want_types = [str(t) for t in want_rel.types]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got_rel.columns
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            fail += 1
            continue
        # driver sorts columns by name before hashing
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}")
            fail += 1
            continue
        # The driver's hash tolerates int-width and decimal/double drift
        # (q_ann_* passed r3 with INTEGER vs BIGINT) but NOT int128: a
        # HUGEINT survives the value compare yet breaks the serialized hash
        # (q_infer_freq r3). Flag only the genuinely hash-breaking types.
        bad_types = {c: t for c, t in zip(want_cols, want_types) if "HUGEINT" in t}
        if bad_types:
            print(f"FAIL {name}: oracle emits int128 (hash-breaking): {bad_types}")
            fail += 1
            continue
        w = norm([tuple(r[i] for i in wi) for r in want])
        g = norm([tuple(r[i] for i in gi) for r in got])
        if w == g:
            print(f"OK   {name} ({len(g)} rows)")
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: rows oracle={len(w)} spark={len(g)}")
            diff_w = [r for r in w if r not in set(g)][:3]
            diff_g = [r for r in g if r not in set(w)][:3]
            print(f"     cols={sorted(want_cols)}")
            for r in diff_w:
                print(f"     oracle-only: {r}")
            for r in diff_g:
                print(f"     spark-only:  {r}")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
