#!/usr/bin/env python
"""Physical-plan audit over the whole query battery.

For every (batch) queries() entry, formats the physical plan and
checks the properties that matter at 100 TB:

* parquet scans carry PushedFilters when the query filters base
  columns, and ReadSchema prunes to the referenced columns;
* every join chose the intended strategy (broadcast for dim tables,
  no CartesianProduct anywhere except the documented band join);
* orderBy+limit compiles to TakeOrderedAndProject (no global sort);
* WholeStageCodegen covers the expression pipeline.

Prints one line per query plus a summary; exits non-zero on hard
violations (cartesian product outside the allowlist, missing pushdown
in the pushdown probe query).

Usage: python tools/explain_audit.py [--sf-dir DIR] [-v]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries where a nested-loop/cartesian shape is the intended plan
NESTED_LOOP_OK = {
    "range_band_join",      # interval-predicate join against a 4-row dim
    "q22_sales_opportunity",  # 1-row scalar-average broadcast cross join
    "q15_top_supplier",     # 1-row scalar-max broadcast join (non-equi)
    "asof_join",            # inequality join against broadcast orders
}

# streaming entries execute via their own harness; plans audited in batch half
SKIP = re.compile(r"^stream_")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--md", default="",
                    help="also rewrite this EXPLAIN_AUDIT.md in place "
                         "(keeps the prose header, splices the fresh run)")
    args = ap.parse_args()
    audit_lines: list[str] = []

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("explain-audit")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from sidecar_spark.queries import QUERIES

    hard_failures: list[str] = []
    for name, fn in QUERIES.items():
        if SKIP.match(name):
            continue
        df = fn(spark, args.sf_dir)
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        notes = []

        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        n_bhj = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_shj = len(re.findall(r"ShuffledHashJoin", plan))
        cartesian = "CartesianProduct" in plan
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_any = any(p.strip() for p in pushed)
        topk = "TakeOrderedAndProject" in plan

        if cartesian and name not in NESTED_LOOP_OK:
            notes.append("UNEXPECTED CartesianProduct")
            hard_failures.append(name)
        if name == "scan_filter_project":
            if not pushed_any:
                notes.append("missing PushedFilters")
                hard_failures.append(name)
            # 4 projected + 1 filter-only column; the table has 11
            schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
            ncols = len(schema.group(1).split(",")) if schema else 99
            if ncols > 5:
                notes.append(f"ReadSchema not pruned ({ncols} cols)")
                hard_failures.append(name)
        if name == "global_topk" and not topk:
            notes.append("orderBy+limit did not fold to TakeOrderedAndProject")
            hard_failures.append(name)
        if name == "partition_pruned_scan":
            m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
            if not (m and m.group(1).strip()):
                notes.append("missing PartitionFilters (no pruning)")
                hard_failures.append(name)
        if name == "bucketed_colocated_join":
            n_exchange = len(re.findall(r"\bExchange\b", plan))
            if n_exchange or "SortMergeJoin" not in plan:
                notes.append(
                    f"bucketed join not exchange-free (exchanges={n_exchange})")
                hard_failures.append(name)

        line = (f"{name}: codegen={n_codegen} bhj={n_bhj} smj={n_smj} "
                f"shj={n_shj} pushed={'y' if pushed_any else '-'}"
                f"{' topk' if topk else ''}")
        if notes:
            line += "  << " + "; ".join(notes)
        print(line)
        audit_lines.append(line)
        if args.verbose and notes:
            print(plan)

    summary = ("FAIL: " + ", ".join(hard_failures)
               if hard_failures else "all plan checks pass")
    print(f"\n{summary}")
    if args.md:
        hdr = []
        for ln in open(args.md).read().splitlines():
            hdr.append(ln)
            if ln.strip() == "```":
                break
        with open(args.md, "w") as fh:
            fh.write("\n".join(hdr + audit_lines + [summary, "```", ""]))
    return 1 if hard_failures else 0


if __name__ == "__main__":
    sys.exit(main())
