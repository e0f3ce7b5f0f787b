#!/usr/bin/env python
"""Merge N bench.py run records into one min-of-N BENCH_local.json.

Round-4 verdict ("What's wrong #2"): cross-methodology bench ratios
are meaningless — a min-of-4 record must only be compared with another
min-of-N record, and the per-run totals must travel with it so the
next round can do a same-methodology read. This tool makes the merge
reproducible instead of ad hoc:

    python bench.py > /tmp/bench_run1.json   # repeat N times
    python tools/merge_bench.py /tmp/bench_run*.json > BENCH_local.json

The output keeps the LAST run's cache_demo (any run's is fine — it is
a capability proof, not a timing) and records per-run totals, the
min-of-N headline, and the per-query min provenance in "note".
"""

from __future__ import annotations

import json
import sys
import time


def main(paths: list[str], allow_union: bool = False) -> None:
    runs = []
    for p in paths:
        with open(p) as f:
            # bench.py prints ONE JSON line (possibly after log noise)
            for line in f.read().splitlines():
                line = line.strip()
                if line.startswith("{"):
                    runs.append(json.loads(line))
                    break
    if not runs:
        raise SystemExit("no bench records found")
    names = set(runs[0]["queries"])
    union = False
    for r in runs[1:]:
        if set(r["queries"]) != names:
            if not allow_union:
                raise SystemExit(
                    "runs cover different query sets — same-methodology "
                    "merge impossible (pass --union when the battery "
                    "GREW mid-round: per-query min over the runs that "
                    "contain each query, sample counts recorded)")
            union = True
            names |= set(r["queries"])
    per_query = {}
    samples = {}
    for q in sorted(names):
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        per_query[q] = round(min(vals), 3)
        samples[q] = len(vals)
    per_run_totals = [r["value"] for r in runs]
    merged = dict(runs[-1])
    merged["queries"] = per_query
    merged["value"] = round(sum(per_query.values()), 3)
    note = (
        f"per-query min over {len(runs)} full runs "
        f"({time.strftime('%Y-%m-%d')}, all at HEAD); per-run totals "
        + "/".join(f"{t:.1f}" for t in per_run_totals) + " s; compare "
        "ONLY against another min-of-N record (same methodology)")
    if union:
        few = sorted(q for q, n in samples.items() if n < len(runs))
        note += (f"; UNION merge — {len(few)} queries joined the "
                 f"battery mid-round and carry fewer samples: "
                 + ",".join(few[:8]))
        merged["samples"] = {q: n for q, n in samples.items()
                             if n < len(runs)}
    merged["note"] = note
    merged["per_run_totals"] = per_run_totals
    print(json.dumps(merged))


if __name__ == "__main__":
    argv = sys.argv[1:]
    main([a for a in argv if a != "--union"],
         allow_union="--union" in argv)
