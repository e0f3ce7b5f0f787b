"""Distributed file listing (round 10, VERDICT r9 #1).

``CacheManager.maybe_list_files_job`` is the
``spark.sql.sources.parallelPartitionDiscovery`` analog: above a
subdirectory-count threshold the recursive LIST fans out as a Spark
job; the Engine ships the result to the plan worker as a driver-local
JSONL manifest (``files_manifest`` option → ``load_manifest``).

Also covers the S3 stub's round-10 ListObjectsV2 pagination (LISTs
truncate at max-keys with NextContinuationToken, like real S3) —
without it a 100k-object prefix listed in one response and the
serial-vs-distributed comparison measured nothing.
"""

import json
import os
import tempfile

import pytest


def _conf(cache_dir):
    from sidecar_spark.config import SidecarConfig

    return SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor")


def _key(s):
    return (s.path, s.length, s.mtime)


@pytest.fixture()
def deep_tree(tmp_path):
    """41 subdirs (> default threshold 32) + root files + hidden
    entries + nesting."""
    root = tmp_path / "t"
    for d in range(41):
        sub = root / f"k={d}"
        sub.mkdir(parents=True)
        for i in range(3):
            (sub / f"f{i}.bin").write_bytes(b"x" * (d + i + 1))
        (sub / "_hidden.bin").write_bytes(b"x")  # filtered (basename)
        (sub / ".dot.bin").write_bytes(b"x")     # filtered (basename)
    (root / "nest").mkdir()  # a non-hive 42nd dir, nested two deep
    (root / "nest" / "deep").mkdir()
    (root / "nest" / "deep" / "leaf.bin").write_bytes(b"xyz")
    (root / "root_file.bin").write_bytes(b"r")
    (root / "_SUCCESS").write_bytes(b"")
    return str(root)


class TestManagerJob:
    def test_job_equals_serial(self, spark, cache_dir, deep_tree):
        from sidecar_spark.cache.manager import CacheManager

        mgr = CacheManager.get_or_create(_conf(cache_dir))
        try:
            serial = sorted(map(_key, mgr.list_files(deep_tree)))
            job = mgr.maybe_list_files_job(spark, deep_tree,
                                           threshold=32)
            assert job is not None
            assert sorted(map(_key, job)) == serial
            # suffix filter applies identically
            s2 = sorted(map(_key, mgr.list_files(deep_tree,
                                                 suffix=".bin")))
            j2 = mgr.maybe_list_files_job(spark, deep_tree,
                                          suffix=".bin", threshold=32)
            assert sorted(map(_key, j2)) == s2
        finally:
            mgr.release()
            CacheManager.clear_instances()

    def test_below_threshold_and_disabled_return_none(
            self, spark, cache_dir, deep_tree):
        from sidecar_spark.cache.manager import CacheManager

        mgr = CacheManager.get_or_create(_conf(cache_dir))
        try:
            assert mgr.maybe_list_files_job(
                spark, deep_tree, threshold=100) is None
            assert mgr.maybe_list_files_job(
                spark, deep_tree, threshold=-1) is None
            # a FILE path is the serial path's fast case
            one = os.path.join(deep_tree, "root_file.bin")
            assert mgr.maybe_list_files_job(
                spark, one, threshold=0) is None
        finally:
            mgr.release()
            CacheManager.clear_instances()

    def test_s3_paginated_equality(self, spark, cache_dir):
        """>1000 objects through the stub: the serial LIST now pages
        (ListObjectsV2 truncation) and the job result still matches
        element-for-element."""
        from sidecar_spark.cache.manager import CacheManager
        from sidecar_spark.testing.s3server import S3StubServer, _Obj

        with S3StubServer() as srv:
            os.environ["SIDECAR_S3_ENDPOINT"] = srv.endpoint
            try:
                st = srv.store
                st.buckets["pl"] = {}
                for d in range(40):
                    for i in range(30):
                        st.buckets["pl"][
                            f"t/k={d}/f{i:03d}.bin"] = _Obj(b"y")
                mgr = CacheManager.get_or_create(_conf(cache_dir))
                try:
                    serial = sorted(map(_key,
                                        mgr.list_files("s3://pl/t")))
                    assert len(serial) == 1200
                    job = mgr.maybe_list_files_job(
                        spark, "s3://pl/t", threshold=32)
                    assert job is not None
                    assert sorted(map(_key, job)) == serial
                    # pagination actually engaged: >1 page of keys
                    lists = [p for m, p in st.requests
                             if m == "GET" and "prefix=" in p]
                    assert len(lists) >= 2
                finally:
                    mgr.release()
                    CacheManager.clear_instances()
            finally:
                os.environ.pop("SIDECAR_S3_ENDPOINT", None)


class TestManifestChannel:
    def test_load_manifest_roundtrip_and_fallbacks(self, tmp_path):
        from sidecar_spark.sources.cached_parquet import load_manifest

        p = tmp_path / "m.jsonl"
        rows = [{"p": "/a/b.parquet", "l": 10, "m": 123},
                {"p": "/a/c.parquet", "l": 20, "m": 456}]
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        got = load_manifest(str(p))
        assert [(s.path, s.length, s.mtime) for s in got] == [
            ("/a/b.parquet", 10, 123), ("/a/c.parquet", 20, 456)]
        assert all(not s.is_dir for s in got)
        assert load_manifest(None) is None
        assert load_manifest("") is None
        assert load_manifest(str(tmp_path / "gone.jsonl")) is None

    def test_engine_ships_manifest_and_scan_matches_jvm(
            self, spark, cache_dir, tmp_path):
        """41-partition tree: the Engine writes a manifest, the scan
        is served by the cached source, and rows match the JVM's own
        read of the same tree."""
        from sidecar_spark import Engine

        root = str(tmp_path / "t")
        (spark.range(0, 4100)
         .selectExpr("id", "id % 41 AS k")
         .repartition(4)
         .write.partitionBy("k").mode("overwrite").parquet(root))
        eng = Engine(spark, conf=_conf(cache_dir))
        got = eng.read_format(root, "parquet")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "sidecar_cached_parquet" in plan
        jvm = spark.read.parquet(root)
        assert (sorted(map(str, got.collect()))
                == sorted(map(str, jvm.collect())))
        mans = [f for f in os.listdir(
            os.path.join(cache_dir, ".listing_manifests"))
            if f.startswith("listing-")]
        assert mans, "expected a listing manifest above threshold"

    def test_deleted_manifest_falls_back_to_own_listing(
            self, spark, cache_dir, tmp_path):
        """Manifest pruned/unreadable → the source lists itself; the
        read stays correct (the safety property pruning relies on)."""
        import shutil

        from sidecar_spark import Engine

        root = str(tmp_path / "t")
        (spark.range(0, 820)
         .selectExpr("id", "id % 41 AS k")
         .coalesce(1)
         .write.partitionBy("k").mode("overwrite").parquet(root))
        eng = Engine(spark, conf=_conf(cache_dir))
        got = eng.read_format(root, "parquet")
        n1 = got.count()
        shutil.rmtree(os.path.join(cache_dir, ".listing_manifests"),
                      ignore_errors=True)
        # re-execution re-plans; with the manifest gone the source
        # must re-list and still produce every row
        assert got.count() == n1 == 820

    def test_threshold_conf_disables(self, spark, cache_dir,
                                     tmp_path):
        from sidecar_spark import Engine

        root = str(tmp_path / "t")
        (spark.range(0, 410)
         .selectExpr("id", "id % 41 AS k")
         .coalesce(1)
         .write.partitionBy("k").mode("overwrite").parquet(root))
        spark.conf.set("spark.sidecar.parallelListing.threshold",
                       "-1")
        try:
            eng = Engine(spark, conf=_conf(cache_dir))
            got = eng.read_format(root, "parquet")
            assert got.count() == 410
            mdir = os.path.join(cache_dir, ".listing_manifests")
            assert (not os.path.isdir(mdir)
                    or not os.listdir(mdir))
        finally:
            spark.conf.unset("spark.sidecar.parallelListing.threshold")
