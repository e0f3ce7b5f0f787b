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


#: resolved-table memo: (appId, sf_dir, name, mtime_ns) -> DataFrame.
#: Re-running spark.read.parquet per query costs ~110 ms of driver-side
#: footer/schema work — a catalog-style resolve-once is what a long-
#: lived engine does (Engine.register_all), and DataFrames are immutable
#: so reuse is safe.  The mtime key self-invalidates on regenerated
#: testdata (the page-key idea at table granularity); the appId key
#: drops entries from stopped sessions.
_TABLE_MEMO: Dict[tuple, object] = {}


def t(spark, sf_dir: str, name: str):
    """Load one testdata table (TESTDATA.md layout), memoized per
    (session, path, mtime).

    ``events.ts`` has shipped as either TIMESTAMP(NANOS) (surfaced by
    Spark only as long nanos via ``legacy.parquet.nanosAsLong``) or as
    plain timestamp[us] (surfaced as TIMESTAMP_NTZ).  Normalize both to
    session-zone TIMESTAMP — with the UTC session zone this is the same
    naive instant DuckDB serves, so oracle parity holds."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mt = os.stat(path).st_mtime_ns
    except OSError:
        mt = 0
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — stopped/mocked context
        app = id(spark)
    key = (app, os.path.realpath(path), mt)
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit
    if len(_TABLE_MEMO) > 256:  # pathological many-session runs
        _TABLE_MEMO.clear()
    df = _load_table(spark, sf_dir, name)
    _TABLE_MEMO[key] = df
    return df


def _load_table(spark, sf_dir: str, name: str):
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
