#!/usr/bin/env python3
"""Scale-up oracle for the simhash connected-components trio
(dedup_apply / dedup_clusters / dedup_cluster_stats).

The committed DuckDB oracle computes components with a recursive
min-label-propagation CTE — fine at the sf0.01 driver gate, but
O(edges x diameter) with cumulative label rows, which does not finish
at sf1 (the 30-word-vocabulary corpus makes hamming<=6 components
near-clique-dense). This tool verifies the SAME semantics at scale by
an INDEPENDENT route: the candidate-pair graph comes from the oracle's
own SQL prefix (everything up to `shp`, i.e. shingles -> simhash ->
banded pairs -> hamming filter, unchanged), and the component minimum
is computed by a Python union-find instead of the recursive CTE. A
union-find min and a min-label-propagation fixpoint are the same
function of the pair graph, so this checks the Spark output against
the identical contract — only the fixpoint ALGORITHM differs.

Usage: python3 tools/cc_check.py <sfDir> <outDir> [--json FILE]
"""
import json, sys, time
import duckdb
import pandas as pd

SF, OUT = sys.argv[1], sys.argv[2]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]

con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{SF}/documents.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# the pair graph, from the oracle's own SQL (prefix up to shp)
sql = oracle["dedup_clusters"]
cut = sql.find("sym AS (SELECT i AS src")
assert cut > 0, "oracle shape changed: no sym CTE"
prefix = sql[:cut].rstrip().rstrip(",")
t0 = time.time()
pairs = con.sql(prefix + " SELECT i, j FROM shp").df()
print(f"[cc] {len(pairs)} candidate pairs in {time.time()-t0:.1f}s")

# union-find with path compression; component id = min member
parent = {}


def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != r:
        parent[x], x = r, parent[x]
    return r


for i, j in zip(pairs["i"].to_numpy(), pairs["j"].to_numpy()):
    ri, rj = find(int(i)), find(int(j))
    if ri != rj:
        # union by min: smaller id becomes the root, so root == min
        if ri < rj:
            parent[rj] = ri
        else:
            parent[ri] = rj

nodes = sorted(set(pairs["i"]) | set(pairs["j"]))
cl = pd.DataFrame({"doc_id": nodes,
                   "cluster_id": [find(int(n)) for n in nodes]})

results = {}


def report(name, mine, want):
    mine = mine[sorted(mine.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    okv = list(mine.columns) == list(want.columns) and len(mine) == len(want) \
        and all((mine[c].astype(str).to_numpy() ==
                 want[c].astype(str).to_numpy()).all() for c in mine.columns)
    results[name] = {"status": "ok" if okv else "fail",
                     "method": "python-unionfind-cc", "rows": len(mine)}
    print(("ok   " if okv else "FAIL ") + f"{name} ({len(mine)} rows)")
    return okv


def spark(name):
    return con.sql(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()


ok = True
# dedup_clusters: (doc_id, cluster_id) for every node in the pair graph
ok &= report("dedup_clusters", spark("dedup_clusters"),
             cl.sort_values("doc_id"))

# dedup_cluster_stats: size histogram of the components
szs = cl.groupby("cluster_id").size().rename("sz").reset_index()
stats = szs.groupby("sz").agg(n_clusters=("cluster_id", "count")) \
    .reset_index().rename(columns={"sz": "cluster_size"})
stats["n_docs"] = stats["cluster_size"] * stats["n_clusters"]
stats["n_removed"] = (stats["cluster_size"] - 1) * stats["n_clusters"]
ok &= report("dedup_cluster_stats", spark("dedup_cluster_stats"),
             stats.sort_values("cluster_size"))

# dedup_apply: documents surviving (drop every node whose id is not its
# component min)
removed = set(cl.loc[cl.doc_id != cl.cluster_id, "doc_id"])
docs = con.sql("SELECT doc_id, lang, source FROM documents "
               "ORDER BY doc_id").df()
keep = docs[~docs.doc_id.isin(removed)].reset_index(drop=True)
ok &= report("dedup_apply", spark("dedup_apply"), keep)

if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1)
sys.exit(0 if ok else 1)
