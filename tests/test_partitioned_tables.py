"""Hive-partitioned tables through the cached read paths.

Round-5 probe found partition COLUMNS silently dropped by both
resolve modes (they live in key=value directory names, which concrete
file paths strip). Driver mode now rebuilds the structure as a
content-addressed symlink view over mirror copies; executor mode
appends the columns to each task's Arrow batches
(cache/partitions.py). These tests pin schema, values, filters, null
partitions, encoded values, view reuse and the mixed-local/remote
fallback.
"""

import os
import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode, **kw):
    return SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode=mode,
        auto_warm_bytes=1, **kw)


@pytest.fixture()
def ptable(spark):
    remote = tempfile.mkdtemp(prefix="ptab-")
    loc = os.path.join(remote, "t.parquet")
    df = spark.range(90).selectExpr(
        "id", "id % 3 AS part", "concat('g', id % 2) AS grp")
    df.write.mode("overwrite").partitionBy("part", "grp").parquet(loc)
    return loc


@pytest.mark.parametrize("mode", ["driver", "executor"])
class TestPartitionedParity:
    def test_schema_values_filters_match_jvm(self, spark, cache_dir,
                                             ptable, mode):
        from sidecar_spark import Engine

        plain = spark.read.parquet(ptable)
        eng = Engine(spark, conf=_conf(cache_dir, mode))
        try:
            got = eng.read_parquet(ptable)
            assert got.schema == plain.schema  # incl. int/string types
            assert (sorted(map(tuple, got.collect()))
                    == sorted(map(tuple, plain.collect())))
            assert (got.where("part = 1 AND grp = 'g0'").count()
                    == plain.where("part = 1 AND grp = 'g0'").count())
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_null_and_encoded_partition_values(self, spark, cache_dir,
                                               mode):
        from sidecar_spark import Engine

        remote = tempfile.mkdtemp(prefix="ptab-nul-")
        loc = os.path.join(remote, "t.parquet")
        df = spark.createDataFrame(
            [(1, None, "a b"), (2, "x", "c/d"), (3, None, "a b")],
            "id int, k string, v string")
        df.write.mode("overwrite").partitionBy("k", "v").parquet(loc)
        plain = spark.read.parquet(loc)
        eng = Engine(spark, conf=_conf(cache_dir, mode))
        try:
            got = eng.read_parquet(loc)
            assert (sorted(map(tuple, got.collect()))
                    == sorted(map(tuple, plain.collect())))
            assert got.where("k IS NULL").count() == 2
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestDriverModeView:
    def test_view_reused_and_warm_served(self, spark, cache_dir, ptable):
        from sidecar_spark import Engine

        eng = Engine(spark, conf=_conf(cache_dir, "driver"))
        try:
            assert eng.read_parquet(ptable).count() == 90
            views = os.path.join(cache_dir, "views")
            first = sorted(os.listdir(views))
            s0 = eng.cache.stats.snapshot()
            assert eng.read_parquet(ptable).count() == 90
            # identical snapshot → the content-addressed view is
            # REUSED, and the repeat resolve is all mirror hits
            assert sorted(os.listdir(views)) == first
            s1 = eng.cache.stats.snapshot()
            assert (s1["total_read_requests_from_remote"]
                    == s0["total_read_requests_from_remote"])
            assert (s1["total_read_requests_from_data_cache"]
                    > s0["total_read_requests_from_data_cache"])
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_partition_pruning_on_view(self, spark, cache_dir, ptable):
        """The symlink view must keep Spark's partition PRUNING — the
        plan's PartitionFilters carry the predicate, so a 100 TB
        table's untouched partitions are never scanned."""
        from sidecar_spark import Engine

        eng = Engine(spark, conf=_conf(cache_dir, "driver"))
        try:
            df = eng.read_parquet(ptable).where("part = 1")
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PartitionFilters: [" in plan
            assert "part" in plan.split("PartitionFilters:")[1][:120]
            assert df.count() == 30
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_mixed_local_remote_falls_back_to_table_root(
            self, spark, cache_dir, ptable):
        """Veto-sized partitioned table: some/all files stay remote —
        the read must come from the ORIGINAL tree (correct columns),
        never a partial symlink view."""
        from sidecar_spark import Engine

        conf = _conf(cache_dir, "driver", mirror_size=16)  # veto all
        eng = Engine(spark, conf=conf)
        try:
            got = eng.read_parquet(ptable)
            assert "part" in got.columns and got.count() == 90
            views = os.path.join(cache_dir, "views")
            assert not os.path.exists(views) or os.listdir(views) == []
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestPartitionHelpers:
    def test_partition_spec_and_type_inference(self):
        from sidecar_spark.cache.partitions import (
            infer_partition_types,
            partition_spec,
        )

        spec = partition_spec("/r/t", "/r/t/a=1/b=x%20y/f.parquet")
        assert spec == [("a", "1"), ("b", "x%20y")]
        assert partition_spec("/r/t", "/r/t/f.parquet") == []
        assert partition_spec("/r/t", "/r/other/f.parquet") == []
        types = infer_partition_types([
            [("a", "1"), ("b", "x")],
            [("a", "99999999999"), ("b", "__HIVE_DEFAULT_PARTITION__")]])
        assert types == [("a", "bigint"), ("b", "string")]
        assert infer_partition_types([[("c", "1.5")]]) == [("c", "double")]


class TestExecutorPartitionPruning:
    def test_filters_prune_partitions_at_planning(self, spark,
                                                  cache_dir, ptable):
        """A partition-column predicate in executor mode must skip the
        non-matching FILES at planning time (fewer InputPartitions),
        with values identical to the JVM scan."""
        from sidecar_spark import Engine

        plain = spark.read.parquet(ptable)
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        # partition count stopped being a pruning proxy under
        # bin-packing (round 9; the round-10 exact-overflow fix moved
        # the bin boundaries again) — pin openCostInBytes above the
        # pack target so one task = one file for this assertion
        spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
        try:
            full = eng.read_parquet(ptable)
            n_all = full.rdd.getNumPartitions()
            filtered = eng.read_parquet(ptable).where(
                "part = 1 AND grp = 'g0'")
            n_pruned = filtered.rdd.getNumPartitions()
            assert n_pruned < n_all  # files were skipped at planning
            assert (sorted(map(tuple, filtered.collect()))
                    == sorted(map(tuple,
                                  plain.where("part = 1 AND grp = 'g0'")
                                  .collect())))
            # range + IN + null-handling predicates stay correct
            for pred in ("part >= 2", "part IN (0, 2)",
                         "part IS NOT NULL", "grp = 'g1' OR part = 0"):
                assert (eng.read_parquet(ptable).where(pred).count()
                        == plain.where(pred).count()), pred
        finally:
            spark.conf.unset("spark.sql.files.openCostInBytes")
            eng.close()
            CacheManager.clear_instances()

    def test_filter_matcher_is_conservative(self):
        from sidecar_spark.sources.cached_parquet import _filter_matches

        assert _filter_matches("1", "eq", 1)
        assert not _filter_matches("2", "eq", 1)
        assert _filter_matches("x%20y", "eq", "x y")  # url-decoded
        assert _filter_matches("5", "ge", 5)
        assert not _filter_matches("4", "gt", 5)
        assert _filter_matches("2", "in", (1, 2))
        assert _filter_matches("__HIVE_DEFAULT_PARTITION__", "isnull",
                               None)
        assert not _filter_matches("__HIVE_DEFAULT_PARTITION__", "eq", 1)
        # incomparable value: keep the file (never wrong-prune)
        assert _filter_matches("abc", "eq", 1)
        assert _filter_matches("zzz", "unknown-op", 1)


class TestReviewFindingsRound5b:
    """Pins for the second review pass (nested INT96, IN pruning,
    shadowed columns, strict numeric inference, raw-key round-trip,
    conf respect)."""

    def test_nested_int96_schema_parity(self, spark, cache_dir):
        """INT96 timestamps nested in struct/array/map must derive
        TimestampType (LTZ) exactly like the JVM scan — the top-level
        shortcut typed them NTZ."""
        from sidecar_spark import Engine

        remote = tempfile.mkdtemp(prefix="ni96-")
        loc = os.path.join(remote, "t.parquet")
        spark.sql("""
          SELECT named_struct('ts', make_timestamp(2024,1,1,0,0,id%60),
                              'x', id) AS st,
                 array(make_timestamp(2024,1,1,0,0,id%60)) AS arr,
                 map('k', make_timestamp(2024,1,1,0,0,id%60)) AS mp
          FROM range(50)""").write.mode("overwrite").parquet(loc)
        plain = spark.read.parquet(loc)
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        try:
            got = eng.read_parquet(loc)
            assert got.schema == plain.schema
            assert (sorted(map(str, got.collect()))
                    == sorted(map(str, plain.collect())))
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_in_filter_actually_prunes(self, spark, cache_dir, ptable):
        """IN pruning was dead (the filter's field is `value`, not
        `values`) — prove files are skipped at PLANNING, not just that
        values are right."""
        from sidecar_spark import Engine

        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        # partition count stopped being a pruning proxy once whole
        # small files bin-pack (round 9): a pruned listing shrinks
        # bytesPerCore, which shrinks the pack target — the JVM's own
        # formula behaves identically. Pin openCostInBytes above the
        # pack target so one task = one file for this assertion.
        spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
        try:
            n_all = eng.read_parquet(ptable).rdd.getNumPartitions()
            pruned = eng.read_parquet(ptable).where("part IN (1)")
            assert pruned.rdd.getNumPartitions() < n_all
            assert pruned.count() == 30
        finally:
            spark.conf.unset("spark.sql.files.openCostInBytes")
            eng.close()
            CacheManager.clear_instances()

    def test_shadowed_partition_column_matches_jvm(self, spark,
                                                   cache_dir):
        """A data file CONTAINING a column with the partition key's
        name: the JVM serves the DIRECTORY value at the file position
        with the partition-inferred type."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        root = tempfile.mkdtemp(prefix="shad-")
        loc = os.path.join(root, "t.parquet")
        d = os.path.join(loc, "part=9")
        os.makedirs(d)
        pq.write_table(pa.table({"id": [1, 2], "part": [100, 200]}),
                       os.path.join(d, "f.parquet"))
        plain = spark.read.parquet(loc)
        for mode in ("driver", "executor"):
            tmp = tempfile.mkdtemp(prefix=f"shad-{mode}-")
            eng = Engine(spark, conf=_conf(tmp, mode))
            try:
                got = eng.read_parquet(loc)
                assert got.schema == plain.schema, mode
                assert (sorted(map(tuple, got.collect()))
                        == sorted(map(tuple, plain.collect()))), mode
                assert got.where("part = 9").count() == 2, mode
            finally:
                eng.close()
                CacheManager.clear_instances()

    def test_strict_numeric_inference(self):
        """Python int()/float() accept shapes Java rejects — those
        partition values must infer string, like the JVM. (Round 6
        tightened the ladder to the full JVM one: >int64 integers are
        decimal(p,0), 1e3 is decimal(4,0) — JBigDecimal with scale≤0 —
        and exact NaN/Infinity spellings are double; probed in
        tests/test_partition_inference.py.)"""
        from sidecar_spark.cache.partitions import infer_partition_types

        assert infer_partition_types([[("v", "1_0")]]) == [("v", "string")]
        assert infer_partition_types(
            [[("v", "99999999999999999999999")]]) == [("v", "decimal(23,0)")]
        assert infer_partition_types([[("v", "inf")]]) == [("v", "string")]
        assert infer_partition_types([[("v", "nan")]]) == [("v", "string")]
        assert infer_partition_types([[("v", "1e3")]]) == [("v", "decimal(4,0)")]
        # Double.parseDouble TRIMS (String.trim) — " 1" is double 1.0
        # in the JVM (round-6 probe; the round-5 assertion here was
        # written without probing and had it backwards)
        assert infer_partition_types([[("v", " 1")]]) == [("v", "double")]

    def test_exotic_inferred_values_match_jvm(self, spark, cache_dir):
        """End-to-end: underscore/huge/inf partition values must read
        back exactly as the JVM does (strings, not re-parsed numbers)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        root = tempfile.mkdtemp(prefix="exot-")
        loc = os.path.join(root, "t.parquet")
        for v in ("1_0", "99999999999999999999999", "inf"):
            d = os.path.join(loc, f"v={v}")
            os.makedirs(d)
            pq.write_table(pa.table({"id": [1]}),
                           os.path.join(d, "f.parquet"))
        plain = spark.read.parquet(loc)
        for mode in ("driver", "executor"):
            tmp = tempfile.mkdtemp(prefix=f"exot-{mode}-")
            eng = Engine(spark, conf=_conf(tmp, mode))
            try:
                got = eng.read_parquet(loc)
                assert got.schema == plain.schema, mode
                assert (sorted(map(tuple, got.collect()))
                        == sorted(map(tuple, plain.collect()))), mode
            finally:
                eng.close()
                CacheManager.clear_instances()

    def test_explicit_pushdown_false_respected(self, spark, cache_dir,
                                               ptable):
        """A user's explicit filterPushdown=false must survive Engine
        registration (it may be guarding another source's broken
        pushFilters) — the scan still works, just unpruned."""
        from sidecar_spark import Engine

        key = "spark.sql.python.filterPushdown.enabled"
        spark.conf.set(key, "false")
        try:
            eng = Engine(spark, conf=_conf(cache_dir, "executor"))
            try:
                eng._cached_source_registered = False  # force re-register
                df = eng.read_parquet(ptable)
                assert spark.conf.get(key) == "false"  # not overridden
                assert df.where("part = 1").count() == 30  # still right
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset(key)
