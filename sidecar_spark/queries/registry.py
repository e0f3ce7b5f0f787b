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

    ``events.ts`` has shipped as either TIMESTAMP(NANOS) (surfaced by
    Spark only as long nanos via ``legacy.parquet.nanosAsLong``) or as
    plain timestamp[us] (surfaced as TIMESTAMP_NTZ).  Normalize both to
    session-zone TIMESTAMP — with the UTC session zone this is the same
    naive instant DuckDB serves, so oracle parity holds."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
