#!/usr/bin/env python
"""Regenerate FEATURES.md — one line per driver-contract query."""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sidecar_spark.queries as q  # noqa: E402

rows = []
for name, fn in sorted(q.QUERIES.items()):
    mod = fn.__module__.split(".")[-1]
    doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".")
    oracle = "yes" if name in q.ORACLES else "rows-only"
    rows.append((mod, name, oracle, doc[:100]))
rows.sort()
out = ["# FEATURES — query battery index (generated; regenerate with tools/gen_features.py)",
       "",
       f"{len(rows)} driver-contract queries, every one with a DuckDB oracle.",
       "",
       "| module | query | oracle | what it proves |",
       "|---|---|---|---|"]
for mod, name, oracle, doc in rows:
    out.append(f"| {mod} | `{name}` | {oracle} | {doc} |")
open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "FEATURES.md"), "w").write(
    "\n".join(out) + "\n")
print(f"FEATURES.md: {len(rows)} queries")
