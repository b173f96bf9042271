#!/usr/bin/env python3
"""Assemble CORRECTNESS_TAILS_sf10.json from the ROUND-13 per-tool
verdicts — the round-12 artifact was produced at the round-11 HEAD
plans (its note says so); this refresh re-verifies the ENTIRE tail set
at the round-13 HEAD, adding the three polygon-subtrahend queries the
r12 verdict asked for (#1) and the rings query round 13 added.

Inputs (all produced this round, same engine outputs under
/tmp/verify_sf10 written by graft.Verify at HEAD):

  /tmp/r13_check_sf10.json    check.py --json  (plain DuckDB oracles)
  /tmp/r13_slice_sf10.json    slice_check.py   (pair whales, K=20000)
  /tmp/r13_ivf_sf10.json      ivf_check.py     (numpy replica)
  /tmp/r13_staged_sf10.json   staged_check.py  (staged-CTE oracles)
  /tmp/r13_polysub_sf10.json  PolySubReplay    (kernel replay + ring
                                                conservation)

Usage: assemble_tails_r13.py <out.json>
"""
import json
import sys

import pandas as pd

queries = {}

# plain DuckDB oracles
d = json.load(open("/tmp/r13_check_sf10.json"))
for q, v in d.get("queries", {}).items():
    v["method"] = "duckdb-oracle"
    queries[q] = v

# wnv_erase_poly_sub_selection is EMPTY at sf10 — at 10x the opt-out
# density every in-risk point falls inside some parcel footprint (sf1
# kept 3,283 rows; the disk-buffer selection was already down to 39
# there). check.py flags empty engine results as suspicious by design;
# both engines agreeing exactly on the empty set is the r9
# graph_triangles adjudication class. The oracle agreement is CHECKED
# HERE, not asserted: re-run the oracle SQL as COUNT(*) in DuckDB and
# flip to ok_empty_regime only if it is exactly 0 — a regressed engine
# wrongly emitting 0 rows against a non-empty oracle stays `fail`.
sel = queries.get("wnv_erase_poly_sub_selection")
if sel and sel.get("status") == "fail" and sel.get("rows") == 0:
    # the re-run NEEDS the verify dump + the sf10 tables; if either is
    # absent the query must STAY fail with an explanatory note — a
    # traceback here would abort the whole assembly (r14 ADVICE #5)
    try:
        import duckdb
        oracle = json.load(open("/tmp/verify_sf10/oracle_sql.json"))
        sql = oracle["wnv_erase_poly_sub_selection"]
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('testdata-gen/sf10/{t}.parquet')")
        n_oracle = con.sql(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
    except Exception as e:
        n_oracle = None
        sel["note"] = ("engine returned 0 rows; oracle COUNT(*) re-run "
                       f"unavailable ({e}) — kept as fail")
    if n_oracle == 0:
        sel["status"] = "ok_empty_regime"
        sel["err"] = None
        sel["note"] = ("engine and oracle both return 0 rows at sf10 "
                       "(oracle COUNT(*) re-run by this script; "
                       "footprint density covers every in-risk point; "
                       "sf1 row: 3,283, oracle-exact)")
    elif n_oracle is not None:
        sel["note"] = (f"engine returned 0 rows but the oracle has "
                       f"{n_oracle} — kept as fail")

# dedicated tools
for f, method in (("/tmp/r13_slice_sf10.json", "slice-oracle-K20000"),
                  ("/tmp/r13_ivf_sf10.json", "numpy-replica"),
                  ("/tmp/r13_staged_sf10.json", "duckdb-staged-cte"),
                  ("/tmp/r13_polysub_sf10.json", "kernel-replay")):
    for q, v in json.load(open(f)).items():
        if "status" not in v:
            v["status"] = ("ok" if v.get("rows_match") and
                           v.get("values_match") else "fail")
        v.setdefault("method", method)
        queries[q] = v

# the declared no-oracle arc-ring query: rows-only
n = len(pd.read_parquet("/tmp/verify_sf10/wnv_erase_rings"))
queries["wnv_erase_rings"] = {
    "status": "ok_rows_only", "rows": int(n), "method": "no-oracle-by-design",
    "note": "transcendental ring geometry; GeoSpec pins closure/orientation/"
            "area-conservation/determinism"}

surface = sorted(open("/tmp/tails_qlist.txt").read().split())
missing = sorted(set(surface) - set(queries))
out = {
    "sf": "testdata-gen/sf10",
    "surface": len(surface),
    "ok": sum(1 for v in queries.values() if str(v["status"]).startswith("ok")),
    "fail": sum(1 for v in queries.values() if v["status"] == "fail"),
    "missing": missing,
    "note": ("sf10 correctness for the BENCH_TAILS_sf10 tail set plus the "
             "round-12/13 polygon-subtrahend family, engine outputs produced "
             "by graft.Verify at the ROUND-13 HEAD plans (every query "
             "re-verified this round — no reuse of older-round verdicts; the "
             "r12 artifact's r11-HEAD provenance gap is closed). The "
             "one-process check.py sweep stays infeasible at this scale "
             "(DuckDB inlines multiply-referenced CTEs); each query carries "
             "the method that verified it. All methods were cross-validated "
             "at sf1 against the plain DuckDB oracle before first use "
             "(rounds 11-12); the kernel-replay method for the "
             "polygon-subtrahend pair is the same parity check GeoSpec pins "
             "at sf0.001, run at sf10."),
    "queries": {q: queries[q] for q in sorted(queries)},
}
json.dump(out, open(sys.argv[1], "w"), indent=1)
ok = out["ok"]; fail = out["fail"]
print(f"{ok} ok, {fail} fail, missing: {missing}")
