#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query result parquet under outDir, runs the matching oracle SQL
(outDir/oracle_sql.json) in DuckDB over the sfDir tables and compares:
  - row count, column name set
  - exact equality for non-float columns
  - exact + approx (1e-9 rel) equality for float columns, reported separately
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    try:
        mine = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: no spark output: {str(e)[:100]}"); bad += 1; continue
    try:
        ora = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); bad += 1; continue
    errs = []
    if sorted(mine.columns) != sorted(ora.columns):
        errs.append(f"cols mine={sorted(mine.columns)} ora={sorted(ora.columns)}")
    elif len(mine) != len(ora):
        errs.append(f"rows mine={len(mine)} ora={len(ora)}")
    else:
        mine = mine[sorted(mine.columns)]
        ora = ora[sorted(ora.columns)]
        for c in mine.columns:
            a, b = mine[c], ora[c]
            exact = 0
            approx = 0
            for i in range(len(a)):
                x, y = a.iloc[i], b.iloc[i]
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                try:
                    xn = xn or (x != x)
                    yn = yn or (y != y)
                except Exception:
                    pass
                if xn and yn:
                    continue
                if xn != yn:
                    exact += 1; approx += 1; continue
                if isinstance(x, float) or isinstance(y, float):
                    if x != y:
                        exact += 1
                        if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-12):
                            approx += 1
                else:
                    if str(x) != str(y):
                        exact += 1; approx += 1
            if exact:
                tag = "EXACT-ONLY" if approx == 0 else "VALUE"
                errs.append(f"col {c}: {exact} exact diffs, {approx} beyond-1e-9 diffs [{tag}]")
    if len(mine) == 0 and not errs:
        errs.append("empty result (suspicious)")
    if errs:
        print(f"FAIL {name} ({len(mine)} rows): " + "; ".join(errs)); bad += 1
    else:
        print(f"ok   {name} ({len(mine)} rows)"); ok += 1

print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
