"""Central registry for the driver-contract query battery."""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

QUERIES: Dict[str, Callable] = {}
ORACLES: Dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query callable and (optionally) its DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (genuinely non-SQL-expressible ops only)."""

    def deco(fn: Callable) -> Callable:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark, sf_dir: str, name: str):
    """Load one testdata table (TESTDATA.md layout).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read it as long nanos and floor to microseconds —
    exactly DuckDB's nanos→micros truncation, so oracle parity holds."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
