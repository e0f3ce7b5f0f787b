"""Result-cache semantics (cache/results.py + Engine.sql_cached):
content-addressed keys over (query text, input mtimes) — the page-key
self-invalidation idea at result granularity — plus LRC capacity
eviction. Mirrors the reference's tier-provenance test style
(TestCachingFileSystemBase.java:179-334): after each step, assert
WHERE the result came from via the hit/miss counters."""

from __future__ import annotations

import os
import time

import pytest

from sidecar_spark import Engine, SidecarConfig
from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.cache.results import ResultCache


@pytest.fixture()
def eng(spark, tmp_path):
    base = tmp_path / "base"
    base.mkdir()
    (spark.range(100)
     .selectExpr("id", "id % 5 AS k", "CAST(id * 1.5 AS DOUBLE) AS v")
     .coalesce(1).write.parquet(str(base / "t1.parquet")))
    conf = SidecarConfig.create(
        cache_dir=str(tmp_path / "cache"),
        data_cache_type="file", cache_persistent=False)
    e = Engine(spark, base_dir=str(base), conf=conf)
    yield e
    CacheManager.clear_instances()


SQL = "SELECT k, count(*) AS n, round(sum(v), 2) AS s FROM t1 GROUP BY k"


def test_cold_miss_warm_hit_same_rows(eng):
    eng.register("t1")
    cold = sorted(map(tuple, eng.sql_cached(SQL).collect()))
    st = eng.result_cache_stats()
    assert st["misses"] == 1 and st["hits"] == 0 and st["entries"] == 1
    warm = sorted(map(tuple, eng.sql_cached(SQL).collect()))
    st = eng.result_cache_stats()
    assert st["hits"] == 1
    assert warm == cold


def test_query_text_changes_key(eng):
    eng.register("t1")
    eng.sql_cached(SQL).collect()
    eng.sql_cached(SQL + " HAVING count(*) > 0").collect()
    st = eng.result_cache_stats()
    assert st["misses"] == 2 and st["entries"] == 2


def test_input_mtime_change_invalidates(eng, spark):
    eng.register("t1")
    first = {r["k"]: r["s"] for r in eng.sql_cached(SQL).collect()}
    time.sleep(1.1)  # ensure a distinct mtime on rewrite
    path = os.path.join(eng.base_dir, "t1.parquet")
    (spark.range(100)
     .selectExpr("id", "id % 5 AS k", "CAST(id * 3.0 AS DOUBLE) AS v")
     .coalesce(1).write.mode("overwrite").parquet(path))
    eng.register("t1")  # refresh the view's file listing
    second = {r["k"]: r["s"] for r in eng.sql_cached(SQL).collect()}
    st = eng.result_cache_stats()
    # both runs were misses (different input mtimes → different keys);
    # the doubled values prove no stale entry was served
    assert st["misses"] == 2 and st["hits"] == 0
    assert second == {k: round(v * 2, 2) for k, v in first.items()}


def test_capacity_eviction_oldest_first(tmp_path):
    rc = ResultCache(str(tmp_path / "rc"), capacity_bytes=1)

    def writer(payload):
        def write(d):
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "part-0"), "wb") as fh:
                fh.write(payload)
        return write

    rc.store("k1", writer(b"x" * 100), "q1")
    time.sleep(0.01)
    rc.store("k2", writer(b"y" * 100), "q2")
    # capacity 1 byte → the eviction loop keeps only the newest entry
    assert rc.lookup("k1") is None          # evicted (oldest)
    assert rc.lookup("k2") is not None      # survives
    assert rc.evictions >= 1
