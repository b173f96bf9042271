#!/usr/bin/env python3
"""Staged DuckDB oracles for the two queries whose one-statement oracle
is infeasible at sf10: `dedup_incremental` and `graph_pagerank`.

Both generated oracles define an expensive CTE referenced many times
(`mh` by 14 band branches; `e`/`dg` by every power-iteration step).
DuckDB inlines multiply-referenced CTEs, so the heavy subplan
re-executes PER REFERENCE — at sf10 the concurrent re-executions
spilled >70 GB and filled the disk on two drives. This tool runs the
SAME SQL text in stages, materializing each heavy CTE as a temp table
so it is computed exactly once. The stage SQL is byte-derived from the
generated oracle's shapes, and hardcoded constants are asserted to
appear verbatim in oracle_sql.json at runtime, so formula drift fails
loudly instead of silently validating a stale replica.

Usage: staged_check.py <verify_out_dir> <sf_dir> [--json OUTFILE]
                       [--only q1,q2]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

OUT = sys.argv[1]
SF = sys.argv[2]
JSON_OUT = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
ONLY = (set(sys.argv[sys.argv.index("--only") + 1].split(","))
        if "--only" in sys.argv else None)

P = 4294967311
oracles = json.load(open(f"{OUT}/oracle_sql.json"))


def connect():
    con = duckdb.connect()
    con.sql("SET memory_limit='48GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in ("documents", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def compare(got, want, float_cols=()):
    v = {"rows_spark": int(len(got)), "rows_oracle": int(len(want))}
    if len(got) != len(want) or sorted(got.columns) != sorted(want.columns):
        v["status"] = "fail"
        v["err"] = "row/column mismatch"
        return v
    v["status"] = "ok"
    for c in sorted(want.columns):
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if c in float_cols:
            bad = ~np.isclose(a.astype(np.float64), b.astype(np.float64),
                              rtol=1e-9, atol=1e-12)
        else:
            bad = a != b
        if bad.any():
            i = int(np.argmax(bad))
            v["status"] = "fail"
            v["err"] = (f"col {c} row {i}: got {a[i]} want {b[i]} "
                        f"({int(bad.sum())} diffs)")
            break
    return v


def mh_a(k):
    return 104729 * (k + 1) + 12345


def mh_b(k):
    return 7919 * (k + 1) + 271


def check_dedup_incremental():
    oracle = oracles["dedup_incremental"]
    for k in (0, 41, 83):  # drift guard
        assert f"(s * {mh_a(k)} + {mh_b(k)}) % {P}" in oracle, "oracle drifted"
    assert oracle.count(" AS band") == 14, "band count drifted"
    con = connect()
    con.sql("""
CREATE TEMP TABLE sh AS SELECT DISTINCT doc_id,
       CAST(('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]), 1, 8)) AS BIGINT) AS s
  FROM (SELECT doc_id, string_split(text,' ') ws FROM documents) tk,
       unnest(range(1, len(ws)-1)) t(i)""")
    mins = ",\n".join(
        f"MIN((s * {mh_a(k)} + {mh_b(k)}) % {P}) AS m{k}" for k in range(84))
    con.sql(f"CREATE TEMP TABLE mh AS SELECT doc_id, {mins} FROM sh GROUP BY doc_id")
    con.sql("DROP TABLE sh")
    branches = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {sig} AS sig FROM mh".format(
            b=b, sig=" || '_' || ".join(
                f"CAST(m{b * 6 + r} AS VARCHAR)" for r in range(6)))
        for b in range(14))
    con.sql(f"CREATE TEMP TABLE bands AS {branches}")
    con.sql("DROP TABLE mh")
    want = con.sql("""
WITH newkeys AS (
  SELECT doc_id, md5(text) AS key FROM documents WHERE doc_id % 5 = 4),
corpuskeys AS (
  SELECT DISTINCT md5(text) AS key FROM documents WHERE doc_id % 5 <> 4),
exact AS (
  SELECT n.doc_id, (c.key IS NOT NULL) AS is_exact_dup
  FROM newkeys n LEFT JOIN corpuskeys c USING (key)),
corpusbands AS (
  SELECT DISTINCT band, sig FROM bands WHERE doc_id % 5 <> 4),
bandhits AS (
  SELECT b.doc_id, COUNT(c.band) > 0 AS is_band_candidate
  FROM bands b LEFT JOIN corpusbands c
    ON b.band = c.band AND b.sig = c.sig
  WHERE b.doc_id % 5 = 4 GROUP BY b.doc_id)
SELECT e.doc_id, e.is_exact_dup,
  COALESCE(h.is_band_candidate, FALSE) AS is_band_candidate
FROM exact e LEFT JOIN bandhits h USING (doc_id)
ORDER BY doc_id""").df()
    got = pd.read_parquet(f"{OUT}/dedup_incremental").sort_values(
        "doc_id").reset_index(drop=True)
    con.close()
    return compare(got, want)


def check_graph_pagerank():
    oracle = oracles["graph_pagerank"]
    for frag in ("HAVING COUNT(*) >= 2", "1000000 // nn.n",
                 "(150000 // nn.n) + (85 * CAST(SUM(r.ru // dg.deg) AS BIGINT))",
                 "ORDER BY rank_micro DESC, node LIMIT 50"):  # drift guard
        assert frag in oracle, f"oracle drifted: {frag}"
    assert oracle.count("// 100 AS ru") == 3, "iteration count drifted"
    con = connect()
    con.sql("CREATE TEMP TABLE bk AS SELECT DISTINCT l_orderkey AS ok, "
            "l_partkey AS pk FROM lineitem")
    con.sql("""
CREATE TEMP TABLE pc AS
  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
  FROM bk a JOIN bk b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING COUNT(*) >= 2""")
    con.sql("DROP TABLE bk")
    con.sql("CREATE TEMP TABLE e AS SELECT pa AS src, pb AS dst FROM pc "
            "UNION ALL SELECT pb, pa FROM pc")
    con.sql("CREATE TEMP TABLE dg AS SELECT src, COUNT(*) AS deg FROM e GROUP BY src")
    n = con.sql("SELECT COUNT(DISTINCT src) FROM e").fetchone()[0]
    con.sql(f"CREATE TEMP TABLE r0 AS SELECT DISTINCT src AS node, "
            f"1000000 // {n} AS ru FROM e")
    for i in (1, 2, 3):
        con.sql(f"""
CREATE TEMP TABLE r{i} AS
  SELECT e.dst AS node,
    (150000 // {n}) + (85 * CAST(SUM(r.ru // dg.deg) AS BIGINT)) // 100 AS ru
  FROM e JOIN dg ON dg.src = e.src
  JOIN r{i - 1} r ON r.node = e.src
  GROUP BY e.dst""")
        con.sql(f"DROP TABLE r{i - 1}")
    want = con.sql("SELECT node, CAST(ru AS BIGINT) AS rank_micro FROM r3 "
                   "ORDER BY rank_micro DESC, node LIMIT 50").df()
    got = pd.read_parquet(f"{OUT}/graph_pagerank")
    con.close()
    # LIMIT 50 over ties: both sides order identically (rank desc, node)
    return compare(got.reset_index(drop=True), want)


CHECKS = {
    "dedup_incremental": check_dedup_incremental,
    "graph_pagerank": check_graph_pagerank,
}
verdict = {}
for name, fn in CHECKS.items():
    if ONLY is not None and name not in ONLY:
        continue
    try:
        verdict[name] = fn()
    except Exception as exc:  # keep the other verdict independent
        verdict[name] = {"status": "fail", "err": f"{type(exc).__name__}: {exc}"}
    print(f"{verdict[name]['status']:4s} {name} {verdict[name]}", flush=True)

out = json.dumps(verdict, indent=1)
if JSON_OUT:
    open(JSON_OUT, "w").write(out + "\n")
sys.exit(0 if all(v["status"] == "ok" for v in verdict.values()) else 1)
