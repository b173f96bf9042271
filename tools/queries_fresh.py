#!/usr/bin/env python3
"""Fast freshness check for the generated QUERIES.md (no JVM needed).

The full regeneration (`sbt "runMain graft.tools.QueryIndex"`) needs a
compiled SparkEntry; this replica checks the one property that actually
drifts between regenerations — the `file:line` definition cites — so a
pre-commit hook can block the round-10 failure mode (ops code edited
after the last regeneration, every line cite stale, QueryIndexSpec red
at HEAD) in ~50 ms.

For every `| `query` | file:line[; file:line...] |` row, assert the
cited line still contains the literal `"<query>" ->`. Missing files,
shifted lines, or renamed queries all fail. New queries added without a
row are caught by QueryIndexSpec itself (this check is the cheap
necessary condition, not the full generator).

Exit 0 = fresh (as far as cites go); exit 1 = stale, prints the fix.
"""
import re
import sys

ROOT = "src/main/scala/"
stale = []
try:
    rows = open("QUERIES.md", encoding="utf-8").read().splitlines()
except FileNotFoundError:
    print("QUERIES.md missing — run: sbt 'runMain graft.tools.QueryIndex'")
    sys.exit(1)

cache = {}


def line_at(path, n):
    if path not in cache:
        try:
            cache[path] = open(path, encoding="utf-8").read().splitlines()
        except FileNotFoundError:
            cache[path] = []
    lines = cache[path]
    return lines[n - 1] if 0 < n <= len(lines) else ""


for row in rows:
    m = re.match(r"\| `([A-Za-z0-9_]+)` \| ([^|]+) \|", row)
    if not m:
        continue
    name, cites = m.group(1), m.group(2).strip()
    for cite in cites.split("; "):
        cm = re.match(r"(.+\.scala):(\d+)$", cite.strip())
        if not cm:
            stale.append(f"{name}: unparseable cite {cite!r}")
            continue
        path, ln = ROOT + cm.group(1), int(cm.group(2))
        if f'"{name}" ->' not in line_at(path, ln):
            stale.append(f"{name}: {cite} no longer holds its declaration")

if stale:
    print(f"QUERIES.md is STALE ({len(stale)} drifted cites), e.g.:")
    for s in stale[:5]:
        print(f"  {s}")
    print("fix: sbt 'runMain graft.tools.QueryIndex' && git add QUERIES.md")
    sys.exit(1)
print(f"QUERIES.md cites fresh ({sum(1 for r in rows if r.startswith('| `'))} rows)")
