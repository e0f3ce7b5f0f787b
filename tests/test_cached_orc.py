"""Executor-mode cached ORC source (sources/cached_orc.py) — live
JVM-oracle parity: ``spark.read.orc`` on the same directory IS the
oracle, so a Spark behavior change fails loudly.

The probed ground truths this suite re-derives live: ORC timestamps
are instants whose pyarrow-naive wall time is the UTC rendering
(cross-zone probe); Spark's ``timestamp_ntz`` rides as int64 micros
with ``spark.sql.catalyst.type`` field metadata; hive partition and
mergeSchema semantics are the shared ones from the parquet source.
"""

import datetime
import decimal
import os
import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode="executor", **kw):
    return SidecarConfig.create(
        cache_dir=tempfile.mkdtemp(prefix=f"orc-{mode}-", dir=cache_dir),
        data_cache_type="file", cache_persistent=False,
        resolve_mode=mode, **kw)


def _parity(spark, cache_dir, root, modes=("executor", "driver"),
            columns=None, **read_opts):
    from sidecar_spark import Engine

    jvm = spark.read.options(**read_opts).orc(root)
    if columns:
        jvm = jvm.select(*columns)
    want_schema = jvm.schema
    want = sorted(map(str, jvm.collect()))
    for mode in modes:
        eng = Engine(spark, conf=_conf(cache_dir, mode))
        try:
            got = eng.read_format(root, "orc", columns=columns,
                                  **read_opts)
            assert got.schema == want_schema, (mode, got.schema,
                                               want_schema)
            assert sorted(map(str, got.collect())) == want, mode
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestCachedOrcParity:
    def test_all_types_roundtrip(self, spark, cache_dir):
        root = tempfile.mkdtemp(prefix="orct-")
        df = spark.createDataFrame(
            [(1, 2**40, 1.5, "s", True, datetime.date(2024, 1, 2),
              datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
              decimal.Decimal("12.34"), [1, 2], {"k": 1}, (7, "in")),
             (2, None, None, None, None, None, None, None, None, None,
              None)],
            "i int, l bigint, dbl double, s string, b boolean, d date,"
            " ts timestamp, dec decimal(5,2), arr array<int>,"
            " mp map<string,int>, st struct<a:int,b:string>")
        df.coalesce(1).write.mode("overwrite").orc(root)
        _parity(spark, cache_dir, root)

    def test_timestamp_ntz_catalyst_metadata(self, spark, cache_dir):
        root = tempfile.mkdtemp(prefix="orcn-")
        spark.createDataFrame(
            [(datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
              datetime.datetime(2024, 1, 2, 3, 4, 5))],
            "tn timestamp_ntz, ts timestamp") \
            .coalesce(1).write.mode("overwrite").orc(root)
        _parity(spark, cache_dir, root)

    def test_cross_zone_instant(self, spark, cache_dir):
        """Written under one session zone, read under another: the
        INSTANT must survive (ORC timestamps are instants; the naive
        pyarrow value is the UTC wall — probed)."""
        root = tempfile.mkdtemp(prefix="orcz-")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        try:
            spark.createDataFrame(
                [(1, datetime.datetime(2024, 1, 2, 3, 4, 5))],
                "i int, ts timestamp") \
                .coalesce(1).write.mode("overwrite").orc(root)
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        _parity(spark, cache_dir, root)

    def test_ancient_dates_rebase_always(self, spark, cache_dir):
        """ORC day counts are HYBRID-calendar labels for every writer
        (probed): Spark-written julian 1500-01-01 must read
        1500-01-01, and a pyarrow-written proleptic 1500-01-01 must
        read 1499-12-23 — both whatever the JVM serves, re-derived
        live."""
        root = tempfile.mkdtemp(prefix="orcad-")
        spark.createDataFrame(
            [(1, datetime.date(1500, 1, 1)),
             (2, datetime.date(1582, 10, 4)),
             (3, datetime.date(2024, 1, 1)), (4, None)],
            "i int, d date").coalesce(1).write.mode("overwrite").orc(root)
        _parity(spark, cache_dir, root)
        import pyarrow as pa
        import pyarrow.orc as po

        root2 = tempfile.mkdtemp(prefix="orcad2-")
        po.write_table(pa.table({"d": pa.array(
            [datetime.date(1500, 1, 1), datetime.date(2024, 1, 1)])}),
            os.path.join(root2, "a.orc"))
        _parity(spark, cache_dir, root2)

    def test_ancient_dates_nested(self, spark, cache_dir):
        root = tempfile.mkdtemp(prefix="orcan-")
        spark.sql(
            "SELECT named_struct('when', DATE'1500-01-01') AS st, "
            "array(DATE'1500-01-01', DATE'2024-01-01') AS ds, "
            "map('k', DATE'1500-01-01') AS mp"
        ).coalesce(1).write.mode("overwrite").orc(root)
        _parity(spark, cache_dir, root)

    def test_hive_partitioned(self, spark, cache_dir):
        root = tempfile.mkdtemp(prefix="orcp-") + "/t.orc"
        df = spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(30)],
            "id int, v string, k int")
        df.write.mode("overwrite").partitionBy("k").orc(root)
        _parity(spark, cache_dir, root)

    def test_projection(self, spark, cache_dir):
        root = tempfile.mkdtemp(prefix="orcj-")
        spark.createDataFrame(
            [(i, f"v{i}", i * 0.5) for i in range(100)],
            "id int, v string, x double") \
            .coalesce(1).write.mode("overwrite").orc(root)
        _parity(spark, cache_dir, root, columns=["x", "id"])

    def test_mergeschema_additive(self, spark, cache_dir):
        """ORC mergeSchema column ORDER follows a JVM-internal hash
        order over file BASENAMES (probed: stable across directories,
        changed by renaming) — executor mode delegates to the raw
        scan (refuse-to-guess policy), driver mode stays cached (the
        symlink view preserves basenames, so the JVM applies the same
        order). Both must match the JVM verbatim."""
        import pyarrow as pa
        import pyarrow.orc as po

        root = tempfile.mkdtemp(prefix="orcm-")
        po.write_table(pa.table({"x": pa.array([1], pa.int64()),
                                 "y": pa.array(["a"])}),
                       os.path.join(root, "a.orc"))
        po.write_table(pa.table({"x": pa.array([2], pa.int64()),
                                 "z": pa.array([0.5])}),
                       os.path.join(root, "b.orc"))
        _parity(spark, cache_dir, root, mergeSchema="true")

    def test_mergeschema_executor_delegates_raw(self, spark, cache_dir):
        from sidecar_spark import Engine

        root = tempfile.mkdtemp(prefix="orcmr-")
        spark.range(5).coalesce(1).write.mode("overwrite").orc(root)
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            df = eng.read_format(root, "orc", mergeSchema="true")
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PythonScan" not in plan  # raw JVM scan
            assert df.count() == 5
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_executor_plan_uses_python_source(self, spark, cache_dir):
        from sidecar_spark import Engine

        root = tempfile.mkdtemp(prefix="orcx-")
        spark.range(10).coalesce(1).write.mode("overwrite").orc(root)
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            df = eng.read_format(root, "orc")
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PythonScan" in plan or "sidecar" in plan.lower()
            assert df.count() == 10
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_serves_from_cache(self, cache_dir):
        """In-process drive (scan workers' stats are invisible from
        the driver): cold fills the mirror, warm does zero remote."""
        import pyarrow as pa
        import pyarrow.orc as po

        from sidecar_spark.sources.cached_orc import CachedOrcSource

        root = tempfile.mkdtemp(prefix="orcc-")
        po.write_table(
            pa.table({"x": pa.array(list(range(5000)), pa.int64())}),
            os.path.join(root, "a.orc"))
        conf = _conf(cache_dir)
        opts = {"path": root, "conf": conf.to_json()}
        mgr = CacheManager.get_or_create(conf)
        try:
            def one_scan():
                src = CachedOrcSource(opts)
                schema = src.schema()
                reader = src.reader(schema)
                return sum(b.num_rows for part in reader.partitions()
                           for b in reader.read(part))

            assert one_scan() == 5000
            before = mgr.stats.snapshot()
            assert one_scan() == 5000
            after = mgr.stats.snapshot()
            assert (after["total_bytes_read_remote"]
                    == before["total_bytes_read_remote"])
            assert (after["total_read_requests_from_data_cache"]
                    > before["total_read_requests_from_data_cache"])
        finally:
            mgr.release()
            CacheManager.clear_instances()

    def test_stripe_splits_disjoint_and_complete(self, cache_dir):
        """A file larger than split_bytes becomes stripe-INDEX-range
        tasks (footer-counted at plan time): disjoint, complete, one
        first-flag, and only the byte-0 split cold-fills."""
        import pyarrow as pa
        import pyarrow.orc as po

        from sidecar_spark.sources.cached_orc import CachedOrcReader

        root = tempfile.mkdtemp(prefix="orcsp-")
        po.write_table(
            pa.table({"x": pa.array(list(range(200_000)), pa.int64()),
                      "s": [f"{i * 2654435761 % 2**32:08x}"
                            for i in range(200_000)]}),
            os.path.join(root, "a.orc"),
            stripe_size=64 * 1024)  # many small stripes
        conf = _conf(cache_dir)
        mgr = CacheManager.get_or_create(conf)
        try:
            reader = CachedOrcReader(
                {"path": root, "conf": conf.to_json(),
                 "split_bytes": "65536"})
            parts = reader.partitions()
            assert len(parts) > 2, len(parts)
            assert sum(1 for p in parts if p.first) == 1
            assert sum(1 for p in parts if p.start == 0) == 1
            seen = []
            for p in parts:
                for b in reader.read(p):
                    seen.extend(b.column(0).to_pylist())
            assert sorted(seen) == list(range(200_000))
        finally:
            mgr.release()
            CacheManager.clear_instances()

    def test_partition_file_pruning(self, spark, cache_dir):
        """pushFilters partition-FILE pruning is format-agnostic: a
        filter on the hive key plans only the matching files."""
        from pyspark.sql.datasource import EqualTo

        from sidecar_spark.sources.cached_orc import (
            PruningCachedOrcReader,
        )

        root = tempfile.mkdtemp(prefix="orcf-") + "/t.orc"
        spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "id int, k int") \
            .write.mode("overwrite").partitionBy("k").orc(root)
        conf = _conf(cache_dir)
        mgr = CacheManager.get_or_create(conf)
        try:
            reader = PruningCachedOrcReader(
                {"path": root, "conf": conf.to_json()})
            flt = EqualTo(("k",), 1)
            assert list(reader.pushFilters([flt])) == [flt]
            parts = reader.partitions()
            assert parts and all(
                ("k", "1") in p.parts for p in parts)
        finally:
            mgr.release()
            CacheManager.clear_instances()


class TestStripeStatsPruning:
    """Round-8: ORC stripe-statistics pruning via the manual
    metadata-protobuf parse (sources/orc_stats.py)."""

    def _sorted_orc(self, spark, tmp_path, codec=None, rows=200_000):
        import pyspark.sql.functions as F

        root = os.path.join(str(tmp_path), f"sorted_{codec or 'dft'}")
        w = (spark.range(rows)
             .select(F.col("id").alias("k"),
                     (F.col("id") % 7).alias("v"),
                     F.concat(F.lit("s"),
                              F.lpad(F.col("id").cast("string"),
                                     9, "0")).alias("s"))
             .orderBy("k").coalesce(1).write
             .option("orc.stripe.size", 65536))
        if codec:
            w = w.option("compression", codec)
        w.orc(root)
        import glob

        return root, glob.glob(root + "/*.orc")[0]

    @pytest.mark.parametrize("codec", [None, "zlib", "snappy",
                                       "none"])
    def test_parse_and_prune_all_codecs(self, spark, tmp_path,
                                        codec):
        """The metadata section parses under every codec Spark can
        write that we decode (default=zstd, zlib, snappy, none) and
        pruning keeps exactly the stripes that can match."""
        import pyarrow.orc as po

        from sidecar_spark.sources.orc_stats import (
            prune_stripes,
            stripe_column_stats,
        )

        _, f = self._sorted_orc(spark, tmp_path, codec)
        of = po.ORCFile(f)
        assert of.nstripes > 3
        with open(f, "rb") as fo:
            stats = stripe_column_stats(fo, of)
            assert stats is not None and len(stats) == of.nstripes
            # k is sorted: a max-range filter keeps only a short
            # contiguous TAIL (stripes are byte-sized, so the row
            # boundary may fall a stripe early)
            kept = prune_stripes(fo, of, range(of.nstripes),
                                 [("k", "ge", 199_000)])
            assert kept and len(kept) <= 3
            assert kept == list(range(of.nstripes - len(kept),
                                      of.nstripes))
            # string min/max prune too
            kept2 = prune_stripes(fo, of, range(of.nstripes),
                                  [("s", "eq", "s000000005")])
            assert kept2 == [0]
            # date/double refs are incomparable → keep everything
            import datetime

            kept3 = prune_stripes(
                fo, of, range(of.nstripes),
                [("k", "ge", datetime.date(2020, 1, 1))])
            assert list(kept3) == list(range(of.nstripes))

    def test_engine_values_identical_with_pruning(self, spark,
                                                  cache_dir,
                                                  tmp_path):
        """End-to-end: the pruned executor scan returns exactly the
        JVM's rows for selective AND non-selective filters."""
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        root, _ = self._sorted_orc(spark, tmp_path)
        eng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, resolve_mode="executor"))
        try:
            for pred in ("k >= 199000", "k < 100", "v = 3 and k > 5",
                         "s = 's000000005'", "k >= 200000"):
                jvm = sorted(map(str, spark.read.orc(root)
                                 .where(pred).collect()))
                got = sorted(map(str, eng.read_format(root, "orc")
                                 .where(pred).collect()))
                assert got == jvm, pred
        finally:
            eng.close()

    def test_all_null_stripe_prunes_comparisons(self, tmp_path):
        import pyarrow as pa
        import pyarrow.orc as po

        from sidecar_spark.sources.orc_stats import prune_stripes

        p = os.path.join(str(tmp_path), "nulls.orc")
        po.write_table(
            pa.table({"k": pa.array([None] * 50000, pa.int64())}),
            p, stripe_size=65536, compression="uncompressed")
        of = po.ORCFile(p)
        with open(p, "rb") as fo:
            kept = prune_stripes(fo, of, range(of.nstripes),
                                 [("k", "eq", 5)])
            assert kept == []  # all-null: no comparison can match
            kept2 = prune_stripes(fo, of, range(of.nstripes),
                                  [("k", "isnull", None)])
            assert list(kept2) == list(range(of.nstripes))
