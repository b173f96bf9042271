#!/usr/bin/env python3
"""Numpy replica of the two IVF-replay oracles (`sim_ivf_topk`,
`dedup_embedding_cosine`) for scales where the DuckDB replay is
infeasible — its CROSS JOIN materializes the V x C list_zip/list_sum
intermediates (109 GB RSS at sf10 before the kernel killed it), while
the same math is a chunked (V,64)@(64,C) matmul here.

Exactness: the oracle quantizes q = floor(x * 2^20) per dimension and
scores cos = dot(q_a, q_b) / (sqrt(n2_a) * sqrt(n2_b)). With |x| <= ~8
the per-dim products are < 2^46 and the 64-term sums < 2^52 — all
exactly representable in float64, so a float64 matmul reproduces the
integer dot products EXACTLY; only the final divide/sqrt is float, the
same expression DuckDB and the engine evaluate. Compare tolerance for
float columns matches tools/check.py (1e-9 relative).

Centroids are deterministic (every 100th vec_id), so the replay needs
no training state — cell assignment is argmax cosine with ties broken
by ascending centroid id, exactly the oracle's ORDER BY cos DESC, cvid.

Usage: ivf_check.py <verify_out_dir> <sf_dir> [--json OUTFILE]
Emits a CORRECTNESS-style JSON verdict per query on stdout.
"""
import json
import sys

import numpy as np
import pandas as pd

OUT = sys.argv[1]
SF = sys.argv[2]
JSON_OUT = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None

emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
emb = emb.sort_values("vec_id").reset_index(drop=True)
vec_ids = emb["vec_id"].to_numpy()
Q = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1048576.0)
n2 = (Q * Q).sum(axis=1)
norm = np.sqrt(n2)

cent_mask = vec_ids % 100 == 0
CQ, cn = Q[cent_mask], norm[cent_mask]
cvids = vec_ids[cent_mask]

# top-2 centroid assignment per vector, ties -> ascending centroid id
def top2_cells(chunk=20000):
    """(V,2) int arrays: centroid-array INDICES of rank-1 and rank-2."""
    out = np.empty((Q.shape[0], 2), dtype=np.int64)
    for s in range(0, Q.shape[0], chunk):
        e = min(s + chunk, Q.shape[0])
        cos = (Q[s:e] @ CQ.T) / (norm[s:e, None] * cn[None, :])
        # argpartition the top 4, then exact lexsort (cos desc, cvid asc)
        part = np.argpartition(-cos, 3, axis=1)[:, :4]
        rows = np.arange(e - s)[:, None]
        sub = cos[rows, part]
        order = np.lexsort((cvids[part], -sub), axis=1)
        top = part[rows, order[:, :2]]
        out[s:e] = top
    return out

top2 = top2_cells()
home = top2[:, 0]


def compare(name, got, want, float_cols):
    v = {"rows_spark": int(len(got)), "rows_oracle": int(len(want))}
    if sorted(got.columns) != sorted(want.columns):
        v["status"] = "fail"
        v["err"] = f"columns {sorted(got.columns)} != {sorted(want.columns)}"
        return v
    if len(got) != len(want):
        v["status"] = "fail"
        v["err"] = "row count mismatch"
        return v
    cols = sorted(want.columns)
    got = got[cols].reset_index(drop=True)
    want = want[cols].reset_index(drop=True)
    for c in cols:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if c in float_cols:
            a, b = a.astype(np.float64), b.astype(np.float64)
            bad = ~np.isclose(a, b, rtol=1e-9, atol=1e-12)
        else:
            bad = a.astype(np.int64) != b.astype(np.int64)
        if bad.any():
            i = int(np.argmax(bad))
            v["status"] = "fail"
            v["err"] = f"col {c} row {i}: got {a[i]} want {b[i]} ({int(bad.sum())} diffs)"
            return v
    v["status"] = "ok"
    return v


verdict = {}

# --- sim_ivf_topk: probes = vec_id % 50 == 0 and < 2000; candidates =
# same HOME cell; top 5 by cos desc, cid asc ---------------------------
id2idx = {int(v): i for i, v in enumerate(vec_ids)}
probe_idx = np.where((vec_ids % 50 == 0) & (vec_ids < 2000))[0]
rows = []
for pi in probe_idx:
    cand = np.where(home == home[pi])[0]
    cand = cand[cand != pi]
    if cand.size == 0:
        continue
    cos = (Q[cand] @ Q[pi]) / (norm[cand] * norm[pi])
    order = np.lexsort((vec_ids[cand], -cos))[:5]
    for r, oi in enumerate(order, start=1):
        rows.append((int(vec_ids[pi]), int(vec_ids[cand[oi]]),
                     float(cos[oi]), r))
want = pd.DataFrame(rows, columns=["qid", "cid", "cos", "rnk"])
want = want.sort_values(["qid", "rnk"]).reset_index(drop=True)
got = pd.read_parquet(f"{OUT}/sim_ivf_topk").sort_values(
    ["qid", "rnk"]).reset_index(drop=True)
verdict["sim_ivf_topk"] = compare("sim_ivf_topk", got, want, {"cos"})

# --- dedup_embedding_cosine: a ranges over top-2 cell membership, b
# over home membership of the same cell; distinct (min,max) pairs with
# cos >= 0.45 ----------------------------------------------------------
pairs = {}
members_any = {}
for rank in (0, 1):
    for i, c in enumerate(top2[:, rank]):
        members_any.setdefault(int(c), []).append(i)
members_home = {}
for i, c in enumerate(home):
    members_home.setdefault(int(c), []).append(i)
for c, aa in members_any.items():
    bb = members_home.get(c)
    if not bb:
        continue
    A, B = np.asarray(aa), np.asarray(bb)
    cos = (Q[A] @ Q[B].T) / (norm[A][:, None] * norm[B][None, :])
    ai, bi = np.where(cos >= 0.45)
    for x, y, cv in zip(A[ai], B[bi], cos[ai, bi]):
        if x == y:
            continue
        vi, vj = int(vec_ids[x]), int(vec_ids[y])
        if vi > vj:
            vi, vj = vj, vi
        pairs[(vi, vj)] = float(cv)
want = pd.DataFrame(
    [(i, j, c) for (i, j), c in sorted(pairs.items())],
    columns=["i", "j", "cos"])
got = pd.read_parquet(f"{OUT}/dedup_embedding_cosine").sort_values(
    ["i", "j"]).reset_index(drop=True)
verdict["dedup_embedding_cosine"] = compare(
    "dedup_embedding_cosine", got, want, {"cos"})

out = json.dumps(verdict, indent=1)
print(out)
if JSON_OUT:
    open(JSON_OUT, "w").write(out + "\n")
sys.exit(0 if all(v["status"] == "ok" for v in verdict.values()) else 1)
