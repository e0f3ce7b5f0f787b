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


def test_nondeterministic_query_bypasses_cache(eng):
    """rand() must never be frozen into an entry: the call runs
    uncached (no counters move, no entry is written)."""
    eng.register("t1")
    eng.sql_cached("SELECT k, rand() AS r FROM t1").collect()
    st = eng.result_cache_stats()
    assert st["misses"] == 0 and st["hits"] == 0 and st["entries"] == 0


def test_inmemory_view_bypasses_cache(eng, spark):
    """A plan with empty inputFiles() (LocalRelation view) has no
    content identity — bypass, don't key on SQL text alone."""
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string") \
        .createOrReplaceTempView("mem_v")
    out = eng.sql_cached("SELECT count(*) AS n FROM mem_v").collect()
    assert out[0]["n"] == 2
    st = eng.result_cache_stats()
    assert st["misses"] == 0 and st["entries"] == 0


def test_ordered_query_hit_preserves_order(eng):
    """A warm hit of an ORDER BY query returns the exact cold order
    (persisted order column, not parquet read-order luck)."""
    eng.register("t1")
    q = "SELECT id, v FROM t1 ORDER BY v DESC, id"
    cold = [tuple(r) for r in eng.sql_cached(q).collect()]
    warm = [tuple(r) for r in eng.sql_cached(q).collect()]
    st = eng.result_cache_stats()
    assert st["hits"] == 1
    assert warm == cold                       # exact order, not bag
    assert cold == sorted(cold, key=lambda r: (-r[1], r[0]))
    assert "__sc_ord__" not in eng.sql_cached(q).columns


def test_validate_fn_skips_marker(tmp_path):
    """An input changing between keying and materialization must not
    register the entry: data is returned once, next lookup misses."""
    rc = ResultCache(str(tmp_path / "rc"))

    def write(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0"), "wb") as fh:
            fh.write(b"z")

    data = rc.store("k1", write, "q", validate_fn=lambda: False)
    assert os.path.exists(data)               # served to this caller
    assert rc.lookup("k1") is None            # but never registered


def test_orphan_sweep_collects_markerless_dirs(tmp_path):
    root = tmp_path / "rc"
    orphan = root / "deadbeef" / "data"
    orphan.mkdir(parents=True)
    (orphan / "part-0").write_bytes(b"x" * 10)
    old = time.time() - 7200
    os.utime(str(root / "deadbeef"), (old, old))
    ResultCache(str(root))                    # __init__ sweeps
    assert not (root / "deadbeef").exists()


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


def test_ordered_single_file_hit_skips_sort(eng):
    """Small ordered results are written coalesce(1); the warm hit
    serves the single file in file order — the hit plan contains NO
    Sort node (round-3 polish) yet returns the exact cold order."""
    eng.register("t1")
    q = "SELECT id, v FROM t1 ORDER BY v DESC, id"
    cold = [tuple(r) for r in eng.sql_cached(q).collect()]
    warm_df = eng.sql_cached(q)
    warm = [tuple(r) for r in warm_df.collect()]
    assert eng.result_cache_stats()["hits"] == 1
    assert warm == cold
    plan = warm_df._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan


def test_mid_store_input_mutation_discards_entry(eng, spark, tmp_path):
    """An input file mutated WHILE the entry is being materialized
    (between keying and the post-write re-stat) must not register:
    the caller gets correct data once, the next call re-misses and
    caches the now-current result (validate_fn discard path)."""
    from sidecar_spark.cache.results import ResultCache

    eng.register("t1")
    # force-create the cache, then wrap store so write_fn also mutates
    # the input's mtime — simulating a concurrent writer mid-store
    base_q = "SELECT k, count(*) AS n FROM t1 GROUP BY k"
    _ = eng.sql_cached(base_q)
    # the registered view reads through the cache mirror — the file the
    # result key describes is the plan's actual input, not the base copy
    uri = spark.sql(base_q).inputFiles()[0]
    part = uri[len("file:"):] if uri.startswith("file:") else uri
    real_store = ResultCache.store

    def mutating_store(self, key, write_fn, sql_text, validate_fn=None,
                       extra_meta=None):
        def wrapped(d):
            write_fn(d)
            st = os.stat(part)
            os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        return real_store(self, key, wrapped, sql_text,
                          validate_fn=validate_fn, extra_meta=extra_meta)

    q = "SELECT k, round(sum(v), 2) AS s FROM t1 GROUP BY k"
    ResultCache.store = mutating_store
    try:
        first = sorted(map(tuple, eng.sql_cached(q).collect()))
    finally:
        ResultCache.store = real_store
    misses_after_first = eng.result_cache_stats()["misses"]
    # entry was NOT registered: same query misses again...
    second = sorted(map(tuple, eng.sql_cached(q).collect()))
    assert second == first
    assert eng.result_cache_stats()["misses"] == misses_after_first + 1
    # ...and the clean store registers, so the third call hits
    hits_before = eng.result_cache_stats()["hits"]
    third = sorted(map(tuple, eng.sql_cached(q).collect()))
    assert third == first
    assert eng.result_cache_stats()["hits"] == hits_before + 1


def test_eviction_defers_recently_served(tmp_path):
    """Capacity eviction prefers entries NOT served within the grace
    window — a just-served entry's parquet path may still be inside a
    running plan. Capacity still wins when only recent entries exist."""
    rc = ResultCache(str(tmp_path / "rc"), capacity_bytes=3000)

    def write(key, n):
        def fn(d):
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "part-0"), "wb") as f:
                f.write(b"x" * n)
        rc.store(key, fn, f"SELECT {key}")

    write("k1", 1500)
    write("k2", 1500)
    # stores pin their entries; age k2 past the grace window, then
    # serve k1 (oldest) so only k2 is a stale candidate
    rc._served["k2"] -= rc.SERVED_GRACE_S + 1
    assert rc.lookup(rc.key_for("x", [])) is None  # unrelated miss
    assert rc.lookup("k1") is not None
    write("k3", 1500)  # over capacity: k2 (stale) must go, not k1
    entries = {k for _, k, _ in rc._entries()}
    assert "k1" in entries and "k3" in entries
    assert "k2" not in entries
    # all remaining are recent: capacity contract still wins
    rc.lookup("k3")
    write("k4", 1500)
    assert rc.total_bytes() <= 3000


def test_just_stored_entry_is_grace_protected(tmp_path):
    """Review finding: store() must pin the entry it publishes — the
    caller's lazy plan holds its parquet path, and the store-triggered
    eviction pass must not pick it as a stale victim."""
    rc = ResultCache(str(tmp_path / "rc"), capacity_bytes=3000)

    def write(key, n):
        def fn(d):
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "part-0"), "wb") as f:
                f.write(b"x" * n)
        return rc.store(key, fn, f"SELECT {key}")

    d1 = write("k1", 1500)
    d2 = write("k2", 1500)
    d3 = write("k3", 1500)  # triggers eviction over capacity
    # k3 (just stored+pinned) and the most recently pinned survivor
    # must still be readable; something older was evicted instead
    assert os.path.exists(os.path.join(d3, "part-0"))
    entries = {k for _, k, _ in rc._entries()}
    assert "k3" in entries
    assert len(entries) == 2  # capacity respected


def test_staging_dirs_invisible_to_eviction_and_entries(tmp_path):
    """A fully-staged concurrent publish (META present inside a
    .tmp- staging dir) is not an entry: eviction must not rmtree it
    and snapshot must not count it; aged staging dirs are swept even
    though they carry META."""
    import json as _json
    import time as _time
    root = tmp_path / "rc"
    rc = ResultCache(str(root), capacity_bytes=None)
    stage = root / ("deadbeef.tmp-999-888")
    (stage / "data").mkdir(parents=True)
    (stage / "data" / "part-0").write_bytes(b"x" * 100)
    (stage / "entry.json").write_text(
        _json.dumps({"sql": "SELECT 1", "bytes": 100,
                     "created": _time.time()}))
    assert rc._entries() == []  # invisible
    rc._check_eviction()
    assert stage.exists()  # young staging dir untouched
    # age it past the orphan window: swept despite carrying META
    old = _time.time() - rc.ORPHAN_AGE_S - 10
    os.utime(stage, (old, old))
    rc._sweep_orphans()
    assert not stage.exists()


def test_order_by_limit_hit_preserves_order(eng):
    """ORDER BY under LIMIT analyzes to GlobalLimit(LocalLimit(Sort));
    the hit must replay the exact materialized order, not a bag."""
    eng.register("t1")
    q = "SELECT id, v FROM t1 ORDER BY v DESC, id LIMIT 7"
    cold = [tuple(r) for r in eng.sql_cached(q).collect()]
    warm = [tuple(r) for r in eng.sql_cached(q).collect()]
    st = eng.result_cache_stats()
    assert st["hits"] == 1
    assert warm == cold
    assert cold == sorted(cold, key=lambda r: (-r[1], r[0]))
