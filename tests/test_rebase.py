"""Julian→proleptic rebase for LEGACY-written parquet (round-7 probe
sweep find): Spark stamps ``org.apache.spark.legacyDateTime`` /
``legacyINT96`` on files written with the LEGACY rebase mode and
rebases ancient dates/timestamps on read; pyarrow decodes the raw
hybrid-calendar counts — without the rebase the executor source
served 1500-01-10 where the JVM serves 1500-01-01 (silent wrong
results). The live tests re-derive the JVM's behavior as the oracle.
"""

import datetime
import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode):
    return SidecarConfig.create(
        cache_dir=tempfile.mkdtemp(prefix=f"rb-{mode}-", dir=cache_dir),
        data_cache_type="file", cache_persistent=False,
        resolve_mode=mode)


class TestRebaseUnits:
    def test_probed_pairs(self):
        from sidecar_spark.sources.rebase import (
            GREG_SWITCH_DAY,
            rebase_julian_day,
        )

        epoch = datetime.date(1970, 1, 1).toordinal()

        def n(d):
            return d.toordinal() - epoch

        # probed against the live JVM scan: stored (raw proleptic
        # reading) → served label
        pairs = [
            (datetime.date(1500, 1, 10), datetime.date(1500, 1, 1)),
            (datetime.date(1582, 10, 14), datetime.date(1582, 10, 4)),
            (datetime.date(1582, 10, 15), datetime.date(1582, 10, 15)),
            (datetime.date(200, 3, 1), datetime.date(200, 3, 1)),
            (datetime.date(2024, 1, 1), datetime.date(2024, 1, 1)),
        ]
        for stored, served in pairs:
            got = rebase_julian_day(n(stored))
            assert got == n(served), (stored, served)
        assert rebase_julian_day(GREG_SWITCH_DAY) == GREG_SWITCH_DAY

    def test_julian_leap_day_rolls_to_march(self):
        """julian 1500-02-29 has no proleptic twin (gregorian skips
        the century leap) — Spark rolls it to March 1."""
        from sidecar_spark.sources.rebase import rebase_julian_day

        epoch = datetime.date(1970, 1, 1).toordinal()
        # julian 1500-02-29 == proleptic 1500-03-10 (9-day offset
        # pre-leap in 1500)
        stored = datetime.date(1500, 3, 10).toordinal() - epoch
        assert (rebase_julian_day(stored)
                == datetime.date(1500, 3, 1).toordinal() - epoch)

    def test_micros_keep_time_of_day(self):
        from sidecar_spark.sources.rebase import rebase_micros

        epoch = datetime.date(1970, 1, 1).toordinal()
        stored_day = datetime.date(1500, 1, 10).toordinal() - epoch
        served_day = datetime.date(1500, 1, 1).toordinal() - epoch
        tod = (12 * 3600 + 34 * 60 + 56) * 1_000_000 + 789
        assert (rebase_micros(stored_day * 86_400_000_000 + tod)
                == served_day * 86_400_000_000 + tod)


class TestLegacyFileParity:
    ROWS = [
        (1, datetime.date(1500, 1, 1),
         datetime.datetime(1500, 1, 1, 12, 0, 0)),
        (2, datetime.date(1582, 10, 4),
         datetime.datetime(1582, 10, 4, 23, 59, 59)),
        (3, datetime.date(1582, 10, 15),
         datetime.datetime(1582, 10, 15, 0, 0, 0)),
        (4, datetime.date(200, 3, 1),
         datetime.datetime(200, 3, 1, 6, 0, 0)),
        (5, datetime.date(2024, 1, 1),
         datetime.datetime(2024, 1, 1, 12, 0, 0)),
        (6, None, None),
    ]

    def _write(self, spark, mode):
        d = tempfile.mkdtemp(prefix=f"rbw-{mode}-")
        spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite",
                       mode)
        spark.conf.set("spark.sql.parquet.int96RebaseModeInWrite",
                       mode)
        try:
            spark.createDataFrame(self.ROWS, "i int, d date, ts timestamp") \
                .coalesce(1).write.mode("overwrite").parquet(d)
        finally:
            spark.conf.unset(
                "spark.sql.parquet.datetimeRebaseModeInWrite")
            spark.conf.unset("spark.sql.parquet.int96RebaseModeInWrite")
        return d

    def _parity(self, spark, cache_dir, root, **opts):
        from sidecar_spark import Engine

        jvm = spark.read.parquet(root)
        want = sorted(map(str, jvm.collect()))
        for mode in ("executor", "driver"):
            eng = Engine(spark, conf=_conf(cache_dir, mode))
            try:
                got = eng.read_parquet(root, **opts)
                assert got.schema == jvm.schema, mode
                assert sorted(map(str, got.collect())) == want, mode
            finally:
                eng.close()
                CacheManager.clear_instances()

    @pytest.mark.parametrize("mode", ["LEGACY", "CORRECTED"])
    def test_ancient_values_parity(self, spark, cache_dir, mode):
        self._parity(spark, cache_dir, self._write(spark, mode))

    def test_legacy_with_date_filter_no_wrong_prune(self, spark,
                                                    cache_dir):
        """A pushed date filter over a legacy file: date statistics
        hold hybrid counts while the reference is proleptic — pruning
        is disabled for dates in legacy files, so results stay exact."""
        from sidecar_spark import Engine

        root = self._write(spark, "LEGACY")
        jvm = (spark.read.parquet(root)
               .where("d < DATE'1582-10-15'").orderBy("i"))
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        try:
            got = (eng.read_parquet(root)
                   .where("d < DATE'1582-10-15'").orderBy("i"))
            assert (sorted(map(str, got.collect()))
                    == sorted(map(str, jvm.collect())))
            assert got.count() == 3  # 200-03-01, 1500-01-01, 1582-10-04
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_nested_legacy_values(self, spark, cache_dir):
        """Ancient temporals inside struct and array columns rebase
        too (the JVM rebases nested fields)."""
        d = tempfile.mkdtemp(prefix="rbn-")
        spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite",
                       "LEGACY")
        try:
            spark.sql(
                "SELECT named_struct('when', DATE'1500-01-01') AS st, "
                "array(DATE'1500-01-01', DATE'2024-01-01') AS ds"
            ).coalesce(1).write.mode("overwrite").parquet(d)
        finally:
            spark.conf.unset(
                "spark.sql.parquet.datetimeRebaseModeInWrite")
        self._parity(spark, cache_dir, d)
