#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [only...]

For each query dir under verify_out_dir: read the Spark parquet result
the way the driver does (pandas/pyarrow — parquet DECIMAL becomes
decimal.Decimal, not float64), run the matching oracle SQL
(oracle_sql.json) in DuckDB over views of the sf_dir tables, sort
columns by name + rows by all columns, and compare RENDERED cell
values exactly. The driver hashes rendered values, so `290` (int64)
vs `290.0` (HUGEINT→float64) is a mismatch even when numerically
equal — this tool must flag exactly what the driver would flag.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def render(v):
    # one canonical rendering per cell, dtype-sensitive like the
    # driver's hash: repr distinguishes 290 / 290.0 / Decimal('290')
    return v if isinstance(v, str) else repr(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    rendered = df.apply(lambda col: col.map(render))
    return rendered.sort_values(by=list(rendered.columns),
                                ignore_index=True)


def main(out_dir: str, sf_dir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        parts = sorted(glob.glob(f"{qdir}/*.parquet"))
        spark_df = pd.concat([pd.read_parquet(p) for p in parts],
                             ignore_index=True)
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
            results[name] = (f"SCHEMA-MISMATCH spark={list(a.columns)} "
                             f"oracle={list(b.columns)}")
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}"
        elif a.equals(b):
            results[name] = "OK"
        else:
            diff = (a != b)
            cells = int(diff.to_numpy().sum())
            loc = [(int(i), c) for i in diff.index[diff.any(axis=1)][:3]
                   for c in diff.columns[diff.loc[i]]][:3]
            samp = "; ".join(f"r{i}.{c}: spark={a.at[i, c]} oracle={b.at[i, c]}"
                             for i, c in loc)
            results[name] = f"RENDER-MISMATCH {cells} cells | {samp}"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "NO-ORACLE")))
    for k, v in results.items():
        flag = "  " if v.startswith(("OK", "NO-ORACLE")) else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
