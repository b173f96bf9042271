#!/usr/bin/env python3
"""Slice-restricted oracle compare for the pair-output dedup queries at
scales where the full DuckDB oracle is infeasible.

The full oracles for `dedup_ngram_jaccard` / `dedup_containment` /
`dedup_minhash_lsh` all route through a shingle self-join whose volume
is Σ_s df(s)² — at sf10's uniform df ≈ 950 that is ~2.4·10¹⁰ joined
rows, beyond DuckDB on this host (the engine under test avoids it by
prefix/band candidate generation; the ORACLE is the scale-limited side,
the same adjudication class as the r9 recursive-CTE CC timeout).

Validity of the slice: every one of these queries' pair semantics is
CORPUS-INDEPENDENT — membership of (i, j) in the answer depends only on
docs i and j (exact Jaccard / containment thresholds; minhash band
signatures are per-doc functions of the shingle set). So the full-corpus
engine output restricted to {i < K ∧ j < K} must equal the oracle run on
the K-doc slice corpus. (Document-frequency RANKS differ between corpus
and slice, but ranks only steer candidate generation, never the answer.)

Usage: slice_check.py <verify_out_dir> <sf_dir> [K]
Reads <verify_out_dir>/<q>/ parquet + oracle_sql.json (as dumped by
graft.Verify), emits a CORRECTNESS-style JSON verdict per query on
stdout.
"""
import json
import os
import sys

import duckdb
import pandas as pd

OUT = sys.argv[1]
SF = sys.argv[2]
K = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# query -> the two doc-id-valued output columns to slice on
QUERIES = {
    "dedup_ngram_jaccard": ("i", "j"),
    "dedup_containment": ("contained", "container"),
    "dedup_minhash_lsh": ("i", "j"),
}

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in TABLES:
    src = f"{SF}/{t}.parquet"
    if not os.path.exists(src):
        # documents-only scale dirs (the Heaps-regime corpora) ship no
        # relational tables; the three pair queries here read only
        # `documents`, so missing views are fine to skip
        continue
    if t == "documents":
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}' "
                    f"WHERE doc_id < {K}")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

verdict = {}
for q, (ci, cj) in QUERIES.items():
    try:
        odf = con.execute(oracle[q]).df()
        sdf = pd.read_parquet(f"{OUT}/{q}")
        sdf = sdf[(sdf[ci] < K) & (sdf[cj] < K)]
        cols = sorted(odf.columns)
        assert sorted(sdf.columns) == cols, \
            f"schema {sorted(sdf.columns)} != {cols}"
        o = odf[cols].sort_values(cols).reset_index(drop=True)
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        rows = len(o) == len(s)
        vals = rows
        if rows:
            for c in cols:
                ov, sv = o[c].to_numpy(), s[c].to_numpy()
                if o[c].dtype.kind == "f":
                    ok = (abs(ov - sv) <= 1e-9 * (abs(ov) + 1)).all()
                else:
                    ok = (ov == sv).all()
                vals = vals and bool(ok)
        verdict[q] = {"rows_match": bool(rows), "values_match": bool(vals),
                      "slice_rows": int(len(s)), "oracle_rows": int(len(o)),
                      "K": K, "err": None}
    except Exception as e:  # noqa: BLE001 - verdict captures the failure
        verdict[q] = {"rows_match": False, "values_match": False,
                      "K": K, "err": str(e)[:300]}

print(json.dumps(verdict, indent=1))
ok = all(v.get("values_match") for v in verdict.values())
sys.exit(0 if ok else 1)
