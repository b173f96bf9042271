#!/usr/bin/env python3
"""Rebuild BENCH_TAILS_sf10.json from the ROUND-15 drives.

Round 15 ran the first complete 251-query sweeps at sf10 (r14 verdict
#6 — BENCH_FULL_sf10.json retires the tails-only sampling bias): drive
A (pre-fix HEAD), drive B (HEAD), and a full-warm filtered drive C
(HEAD, the tail set + drive B's guard-flagged lines). The tail record
takes the per-query MIN across all three (the r13 bimodal-host
convention) — legitimate because every query in the TAIL SET has a
bit-identical plan across the three drives: the five queries whose
plans round 15 changed (sql_exists_subquery, dedup_semantic,
win_rank, wnv_erase_poly, wnv_erase_concave) are not tail members, and
the tail queries' source files are untouched between the drive
commits (git-verified: Dedup/Wnv/Multimodal/Similarity pair paths).
The set grows 14 -> 17: + the concave-sub pair (r14 plans, previously
BASELINE.md prose only — verdict #3) and the round-15 mixed line+arc
rings query.

Usage: assemble_bench_tails_r15.py <out.json>
Reads /tmp/bench_sf10_full_{a,b}.json (full-sweep records) and
/tmp/bench_sf10_c.json (filtered headline) plus the committed
BENCH_TAILS_sf10.json for prior minima.
"""
import json
import sys

TAILS = [
    "agg_approx_quantile_calib", "agg_ddsketch_calibration",
    "agg_percentiles", "dedup_containment", "dedup_incremental",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "emb_covariance",
    "mm_decode_image", "wnv_erase_poly_sub", "wnv_erase_poly_sub_rings",
    "wnv_erase_poly_sub_selection", "wnv_erase_rings",
    "wnv_point_pairs_auto", "wnv_erase_concave_sub",
    "wnv_erase_concave_sub_rings", "wnv_erase_poly_disk_rings",
]


def parse(path):
    """Parse a Bench record (full-sweep file or headline line) as JSON
    and fail loudly (r13 ADVICE); reject tables-only-warm probes."""
    txt = open(path).read().strip().splitlines()[-1]
    rec = json.loads(txt)
    if "queries" not in rec:
        raise SystemExit(f"{path}: no 'queries' block")
    if rec.get("warm") == "tables":
        raise SystemExit(f"{path}: tables-only-warm probe record — a "
                         "tail rebuild must come from full-warm drives")
    return {k: float(v) for k, v in rec["queries"].items()}


drives = {
    "a": parse("/tmp/bench_sf10_full_a.json"),
    "b": parse("/tmp/bench_sf10_full_b.json"),
    "c": parse("/tmp/bench_sf10_c.json"),
}
prior = json.load(open("BENCH_TAILS_sf10.json"))["queries"]

queries = {}
for q in sorted(TAILS):
    runs = {f"r15{d}": drives[d][q] for d in drives if q in drives[d]}
    if not runs:
        raise SystemExit(f"tail query {q} missing from every drive")
    entry = {"sec": min(runs.values()), "runs": runs}
    if q in prior:
        entry["prior_rounds_min"] = prior[q]["sec"]
    queries[q] = entry

out = {
    "metric": "tails_best_of_drives",
    "unit": "sec",
    "sf": "testdata-gen/sf10",
    "nq": len(queries),
    "value": round(sum(v["sec"] for v in queries.values()), 3),
    "note": ("per-query MIN across the round-15 drives (two FULL 251-query "
             "sweeps + one full-warm filtered drive, all on this round's "
             "regenerated sf10 corpus; BENCH_FULL_sf10.json is the committed "
             "full-surface record — this artifact is its tail projection). "
             "Every tail query's plan is bit-identical across the drives "
             "(the five queries round 15 changed are not tail members), so "
             "the cross-drive minimum has uniform plan provenance. Set "
             "grows 14 -> 17: + wnv_erase_concave_sub(_rings) (r14 plans, "
             "previously BASELINE.md prose only) and the round-15 "
             "wnv_erase_poly_disk_rings. `prior_rounds_min` carries the r13 "
             "artifact's figure for trend only — measured on the r13-era "
             "generated corpus, so level shifts can be data regeneration, "
             "not plans (the r14 sf1 re-basing class)."),
    "queries": queries,
}
json.dump(out, open(sys.argv[1], "w"), indent=1)
print(json.dumps({q: v["sec"] for q, v in queries.items()}, indent=0))
