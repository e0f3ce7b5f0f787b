"""Catalog-managed tables (round-7 probe sweep — verdict item 7):
DSv2 ``df.writeTo`` and bucketed ``saveAsTable`` tables, read through
the cache by LOCATION.

Probed ground truths (re-derived live below):

* ``writeTo(...).create()`` against the default session catalog lands
  as a v1 parquet table in the warehouse dir; ``append()`` /
  ``createOrReplace()`` raise ("Cannot write into v1 table" /
  UNSUPPORTED_FEATURE) — a Spark catalog limitation that exists with
  or without this engine;
* bucketed tables keep their bucket metadata in the CATALOG, not the
  files — a path read of the same location yields identical data and
  schema (probed), it just cannot carry the bucket-join optimization,
  which only ``spark.table()`` over catalog metadata can.

So the cache story for catalog tables: read them BY LOCATION through
the Engine (cached, values identical); keep ``spark.table()`` for
bucket-optimized joins (the catalog points at the original location —
uncached by design, redirecting catalog metadata at mirror paths
would corrupt other readers).
"""

import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode):
    return SidecarConfig.create(
        cache_dir=tempfile.mkdtemp(prefix=f"cat-{mode}-", dir=cache_dir),
        data_cache_type="file", cache_persistent=False,
        resolve_mode=mode)


def _location(spark, table):
    loc = (spark.sql(f"DESCRIBE EXTENDED {table}")
           .where("col_name='Location'").collect()[0].data_type)
    return loc[len("file:"):] if loc.startswith("file:") else loc


def _engine_parity(spark, cache_dir, table):
    from sidecar_spark import Engine

    loc = _location(spark, table)
    want = sorted(map(str, spark.table(table).collect()))
    want_schema = spark.table(table).schema
    for mode in ("driver", "executor"):
        eng = Engine(spark, conf=_conf(cache_dir, mode))
        try:
            got = eng.read_parquet(loc)
            assert got.schema == want_schema, mode
            assert sorted(map(str, got.collect())) == want, mode
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestWriteToTables:
    def test_writeto_create_location_reads_cached(self, spark,
                                                  cache_dir):
        spark.sql("DROP TABLE IF EXISTS t_v2_probe")
        df = spark.range(100).selectExpr("id", "id % 7 AS k")
        df.writeTo("t_v2_probe").using("parquet").create()
        try:
            _engine_parity(spark, cache_dir, "t_v2_probe")
        finally:
            spark.sql("DROP TABLE IF EXISTS t_v2_probe")

    def test_writeto_append_raises_like_jvm(self, spark):
        """v1 session-catalog tables refuse DSv2 append — the JVM's
        own limitation, re-derived so an upgrade that lifts it fails
        this probe loudly and we revisit the cache story."""
        spark.sql("DROP TABLE IF EXISTS t_v2_app")
        df = spark.range(10).selectExpr("id", "id % 3 AS k")
        df.writeTo("t_v2_app").using("parquet").create()
        try:
            with pytest.raises(Exception, match="v1 table"):
                df.writeTo("t_v2_app").append()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_v2_app")


class TestBucketedTables:
    def test_bucketed_location_reads_cached(self, spark, cache_dir):
        """Bucket metadata lives in the catalog, not the files
        (probed): a cached path read of the table location yields
        identical data and schema in both resolve modes."""
        spark.sql("DROP TABLE IF EXISTS t_bkt_probe")
        df = spark.range(200).selectExpr("id", "id % 7 AS k")
        (df.write.bucketBy(4, "k").sortBy("id")
         .mode("overwrite").format("parquet").saveAsTable("t_bkt_probe"))
        try:
            _engine_parity(spark, cache_dir, "t_bkt_probe")
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bkt_probe")
