#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir: read the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB over views of the
sf_dir tables, sort columns by name + rows by all columns, and compare.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value rendering: round-trip floats through repr so
    # -0.0 vs 0.0 and float32/64 artifacts surface clearly
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                msg = str(e).replace("\n", " | ")[:300]
                results[name] = f"VALUE-MISMATCH {msg}"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "NO-ORACLE")))
    for k, v in results.items():
        flag = "  " if v.startswith(("OK", "NO-ORACLE")) else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
