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


class TestRebaseConfModes:
    """Session-conf rebase modes for NON-Spark-written files (round-7
    probe sweep, second wave): the JVM consults
    ``spark.sql.parquet.datetimeRebaseModeInRead`` /
    ``int96RebaseModeInRead`` only when a footer has neither a legacy
    marker nor ``org.apache.spark.version`` — LEGACY rebases,
    EXCEPTION fails the read on ancient values, and NTZ columns are
    exempt from every mode (all probed live)."""

    DT_KEY = "spark.sql.parquet.datetimeRebaseModeInRead"
    I96_KEY = "spark.sql.parquet.int96RebaseModeInRead"

    def _pyarrow_file(self, int96=False, modern=False):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="rbconf-")
        if modern:
            dts = [datetime.datetime(2020, 1, 1, 12, 0),
                   datetime.datetime(2024, 6, 1, 0, 30)]
            dates = [datetime.date(2020, 1, 1),
                     datetime.date(2024, 6, 1)]
        elif int96:
            # MIDNIGHT-exact ancient values: pyarrow writes a
            # NEGATIVE nanos-of-day int96 field for pre-1970
            # non-midnight timestamps and its own reader treats it
            # unsigned (+2^64 ns, probed grid) — the JVM's signed
            # arithmetic tolerates the nonstandard field, a
            # documented executor-mode divergence (PARITY.md).
            # Midnight pre-1970 and everything >= 1970 decode exactly,
            # so the conf-mode parity stays on decode-sound values
            # while still exercising rebase (1500 < 1582) and the
            # EXCEPTION window (< 1900)
            dts = [datetime.datetime(1500, 1, 1, 0, 0),
                   datetime.datetime(2020, 1, 1, 12, 0)]
            dates = [datetime.date(2020, 1, 1),
                     datetime.date(2024, 6, 1)]
        else:
            dts = [datetime.datetime(1500, 1, 1, 12, 0),
                   datetime.datetime(2020, 1, 1, 12, 0)]
            dates = [datetime.date(1500, 1, 1),
                     datetime.date(2020, 1, 1)]
        tbl = pa.table({
            "d": pa.array(dates),
            "ts": pa.array(dts, type=pa.timestamp("us", tz="UTC")),
            "tsn": pa.array(dts, type=pa.timestamp("us")),
        })
        pq.write_table(tbl, f"{d}/part-0.parquet",
                       use_deprecated_int96_timestamps=int96)
        return d

    def _parity(self, spark, cache_dir, root):
        from sidecar_spark import Engine

        jvm = spark.read.parquet(root)
        want = sorted(map(str, jvm.collect()))
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        try:
            got = eng.read_parquet(root)
            assert got.schema == jvm.schema
            assert sorted(map(str, got.collect())) == want
        finally:
            eng.close()
            CacheManager.clear_instances()

    @pytest.mark.parametrize("mode", ["CORRECTED", "LEGACY"])
    def test_conf_modes_nonspark_file(self, spark, cache_dir, mode):
        """pyarrow-written ancient values under each conf mode: the
        executor source must serve exactly what the JVM serves —
        LEGACY rebases the date and LTZ columns while the NTZ column
        stays raw (probed: eligibility follows the catalyst type)."""
        root = self._pyarrow_file()
        spark.conf.set(self.DT_KEY, mode)
        try:
            self._parity(spark, cache_dir, root)
        finally:
            spark.conf.unset(self.DT_KEY)

    def test_conf_exception_fails_read(self, spark, cache_dir):
        """EXCEPTION mode: the JVM raises SparkUpgradeException on
        ancient values in a non-Spark file — the executor source must
        fail the read too, never serve silently-ambiguous values."""
        from sidecar_spark import Engine

        root = self._pyarrow_file()
        spark.conf.set(self.DT_KEY, "EXCEPTION")
        try:
            with pytest.raises(Exception):
                spark.read.parquet(root).collect()  # JVM oracle
            eng = Engine(spark, conf=_conf(cache_dir, "executor"))
            try:
                with pytest.raises(Exception) as ei:
                    eng.read_parquet(root).collect()
                assert "ancient" in str(ei.value).lower()
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset(self.DT_KEY)

    def test_conf_exception_modern_file_reads(self, spark, cache_dir):
        """EXCEPTION is a per-VALUE check (probed): a modern-only
        non-Spark file reads fine under it."""
        root = self._pyarrow_file(modern=True)
        spark.conf.set(self.DT_KEY, "EXCEPTION")
        spark.conf.set(self.I96_KEY, "EXCEPTION")
        try:
            self._parity(spark, cache_dir, root)
        finally:
            spark.conf.unset(self.DT_KEY)
            spark.conf.unset(self.I96_KEY)

    def test_conf_ignored_for_spark_written(self, spark, cache_dir):
        """A Spark-written unmarked (CORRECTED) file ignores the
        session conf entirely — org.apache.spark.version pins the
        mode (probed: conf LEGACY/EXCEPTION leave it untouched)."""
        d = tempfile.mkdtemp(prefix="rbconf-sw-")
        spark.sql(
            "SELECT DATE'1500-01-01' AS d, "
            "TIMESTAMP'1500-01-01 12:00:00' AS ts"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        spark.conf.set(self.DT_KEY, "LEGACY")
        try:
            self._parity(spark, cache_dir, d)
        finally:
            spark.conf.unset(self.DT_KEY)
        spark.conf.set(self.DT_KEY, "EXCEPTION")
        try:
            self._parity(spark, cache_dir, d)
        finally:
            spark.conf.unset(self.DT_KEY)

    def test_int96_conf_modes(self, spark, cache_dir):
        """INT96 in a non-Spark file follows int96RebaseModeInRead:
        LEGACY rebases, EXCEPTION fails (probed)."""
        from sidecar_spark import Engine

        root = self._pyarrow_file(int96=True)
        spark.conf.set(self.I96_KEY, "LEGACY")
        try:
            self._parity(spark, cache_dir, root)
        finally:
            spark.conf.unset(self.I96_KEY)
        spark.conf.set(self.I96_KEY, "EXCEPTION")
        try:
            with pytest.raises(Exception):
                spark.read.parquet(root).collect()  # JVM oracle
            eng = Engine(spark, conf=_conf(cache_dir, "executor"))
            try:
                with pytest.raises(Exception) as ei:
                    eng.read_parquet(root).collect()
                assert "ancient" in str(ei.value).lower()
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset(self.I96_KEY)

    def test_ntz_in_legacy_marked_file_not_rebased(self, spark,
                                                   cache_dir):
        """THE round-7 second-wave find: a LEGACY-written Spark file
        stores NTZ columns proleptic-raw (no rebase on write — probed
        with pyarrow on the stored bytes) while rebasing its date and
        LTZ columns. Rebasing the NTZ column on read, as a naive
        every-timestamp rule would, silently corrupts it."""
        d = tempfile.mkdtemp(prefix="rbconf-ntz-")
        spark.conf.set(
            "spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
        try:
            spark.sql(
                "SELECT DATE'1500-01-01' AS d, "
                "TIMESTAMP'1500-01-01 12:00:00' AS ts, "
                "TIMESTAMP_NTZ'1500-01-01 12:00:00' AS tsn"
            ).coalesce(1).write.mode("overwrite").parquet(d)
        finally:
            spark.conf.unset(
                "spark.sql.parquet.datetimeRebaseModeInWrite")
        self._parity(spark, cache_dir, d)

    def test_inference_off_naive_is_ltz_and_rebases(self, spark,
                                                    cache_dir):
        """With NTZ inference disabled the same tz-naive column reads
        as LTZ and becomes rebase-eligible again (probed) — the
        exemption follows the catalyst type, not the annotation."""
        root = self._pyarrow_file()
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set(self.DT_KEY, "LEGACY")
        try:
            self._parity(spark, cache_dir, root)
        finally:
            spark.conf.unset(self.DT_KEY)
            spark.conf.unset(
                "spark.sql.parquet.inferTimestampNTZ.enabled")

    def test_conf_legacy_date_filter_no_wrong_prune(self, spark,
                                                    cache_dir):
        """Under conf-LEGACY a non-Spark file's date statistics are
        julian-interpreted — date filters must stop pruning for it,
        exactly like marker-LEGACY files."""
        from sidecar_spark import Engine

        root = self._pyarrow_file()
        spark.conf.set(self.DT_KEY, "LEGACY")
        try:
            jvm = (spark.read.parquet(root)
                   .where("d < DATE'1582-10-15'"))
            eng = Engine(spark, conf=_conf(cache_dir, "executor"))
            try:
                got = (eng.read_parquet(root)
                       .where("d < DATE'1582-10-15'"))
                assert (sorted(map(str, got.collect()))
                        == sorted(map(str, jvm.collect())))
                assert got.count() == 1
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset(self.DT_KEY)
