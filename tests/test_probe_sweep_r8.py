"""Round-8 probe sweep (verdict #8): spark.sql.caseSensitive through
the ORC executor path and spark.sql.ansi.enabled over the executor
sources — each cell pinned against the live JVM's own scan first.
Also records the column-index availability finding (PARITY.md):
pyarrow 16 exposes only has_column_index flags, no reader for the
page-level index content, so parquet page-level pruning is not
implementable from Python — row-group statistics pruning is the
granularity ceiling.
"""

import os

import pyarrow as pa
import pyarrow.orc as po
import pyarrow.parquet as pq
import pytest


def _engine(spark, cache_dir):
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    return Engine(spark, conf=SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor"))


def _parity(jvm_df, got_df):
    assert (got_df.schema.simpleString()
            == jvm_df.schema.simpleString())
    assert (sorted(map(str, got_df.collect()))
            == sorted(map(str, jvm_df.collect())))


class TestOrcCaseSensitivity:
    def test_case_duplicate_columns(self, spark, cache_dir,
                                    tmp_path):
        """cs=false refuses a case-duplicate ORC schema
        (COLUMN_ALREADY_EXISTS, probed); cs=true serves both
        columns."""
        root = os.path.join(str(tmp_path), "dup")
        os.makedirs(root)
        po.write_table(pa.table({"a": [1], "A": [2]}),
                       os.path.join(root, "f.orc"))
        eng = _engine(spark, cache_dir)
        try:
            with pytest.raises(Exception,
                               match="(?i)already.?exists|duplicate"):
                eng.read_format(root, "orc").collect()
            spark.conf.set("spark.sql.caseSensitive", "true")
            try:
                _parity(spark.read.orc(root),
                        eng.read_format(root, "orc"))
            finally:
                spark.conf.set("spark.sql.caseSensitive", "false")
        finally:
            eng.close()

    def test_case_sensitive_projection(self, spark, cache_dir,
                                       tmp_path):
        """Explicit projection resolves by exact case under cs=true
        and case-insensitively under the default — both matching the
        JVM's own select."""
        import pyspark.sql.functions as F

        root = os.path.join(str(tmp_path), "case")
        os.makedirs(root)
        po.write_table(pa.table({"Xx": [1, 2, 3], "y": [4, 5, 6]}),
                       os.path.join(root, "f.orc"))
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.orc(root).select("XX"),
                    eng.read_format(root, "orc").select("XX"))
            spark.conf.set("spark.sql.caseSensitive", "true")
            try:
                _parity(spark.read.orc(root).select("Xx", "y")
                        .agg(F.sum("Xx").alias("s")),
                        eng.read_format(root, "orc").select("Xx", "y")
                        .agg(F.sum("Xx").alias("s")))
            finally:
                spark.conf.set("spark.sql.caseSensitive", "false")
        finally:
            eng.close()


class TestAnsiModeOverExecutorSources:
    @pytest.fixture()
    def ansi(self, spark):
        spark.conf.set("spark.sql.ansi.enabled", "true")
        yield
        spark.conf.set("spark.sql.ansi.enabled", "false")

    def test_parquet_partitioned_read(self, spark, cache_dir,
                                      tmp_path, ansi):
        d = os.path.join(str(tmp_path), "t", "k=00123")
        os.makedirs(d)
        pq.write_table(pa.table({"v": [1.5, 2.5]}),
                       os.path.join(d, "f.parquet"))
        root = os.path.join(str(tmp_path), "t")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.parquet(root),
                    eng.read_parquet(root))
        finally:
            eng.close()

    def test_partition_type_ladder_unchanged(self, spark, cache_dir,
                                             tmp_path, ansi):
        """A 20-digit partition value infers decimal(20,0) with ANSI
        on, same as off (probed) — the inference ladder is
        ANSI-independent."""
        d = os.path.join(str(tmp_path), "t",
                         "k=99999999999999999999")
        os.makedirs(d)
        pq.write_table(pa.table({"v": [1]}),
                       os.path.join(d, "f.parquet"))
        root = os.path.join(str(tmp_path), "t")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.parquet(root),
                    eng.read_parquet(root))
        finally:
            eng.close()

    def test_orc_and_csv_compose_under_ansi(self, spark, cache_dir,
                                            tmp_path, ansi):
        root = os.path.join(str(tmp_path), "o")
        os.makedirs(root)
        po.write_table(pa.table({"k": [1, 2], "s": ["a", "b"]}),
                       os.path.join(root, "f.orc"))
        croot = os.path.join(str(tmp_path), "c")
        os.makedirs(croot)
        with open(os.path.join(croot, "a.csv"), "wb") as f:
            f.write(b"1,x\nnotanint,y\n")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.orc(root),
                    eng.read_format(root, "orc"))
            ddl = "i int, s string"
            # malformed cell under ANSI: PERMISSIVE still null-fills
            # (the csv parser is mode-driven, not ANSI-driven) — the
            # compose must match whatever the JVM does
            _parity(spark.read.schema(ddl).csv(croot),
                    eng.read_format(croot, "csv", schema=ddl))
        finally:
            eng.close()


class TestColumnIndexAvailability:
    def test_pyarrow_exposes_no_reader(self, tmp_path):
        """The probe finding behind the PARITY line: column-index
        FLAGS exist, the index CONTENT has no reader — if a future
        pyarrow adds one, this test fails and page-level pruning
        becomes implementable."""
        p = os.path.join(str(tmp_path), "t.parquet")
        pq.write_table(pa.table({"a": list(range(1000))}), p)
        md = pq.ParquetFile(p).metadata.row_group(0).column(0)
        assert hasattr(md, "has_column_index")
        readers = [a for a in dir(pq.ParquetFile)
                   if "column_index" in a.lower()
                   or "page_index" in a.lower()]
        assert readers == [], (
            f"pyarrow now exposes {readers} — revisit page-level "
            "pruning (PARITY.md round-8 probe sweep)")


class TestListingOptionsNative:
    """Round-8 second wave: pathGlobFilter and modifiedBefore/After
    served NATIVELY by the executor sources (they were raw-fallbacks;
    the executor listing knows original basenames and mtimes). Every
    cell asserts against the live JVM on the same fixtures."""

    def _table(self, tmp_path, fmt="parquet"):
        root = os.path.join(str(tmp_path), "t")
        for i, sub in enumerate(("k=1", "k=2")):
            d2 = os.path.join(root, sub)
            os.makedirs(d2, exist_ok=True)
            t = pa.table({"v": [i * 10, i * 10 + 1]})
            if fmt == "parquet":
                pq.write_table(t, os.path.join(d2, f"f{i}.parquet"))
            else:
                po.write_table(t, os.path.join(d2, f"f{i}.orc"))
        return root

    def _set_mtimes(self, root, base=1_700_000_000):
        """Pin file mtimes to known whole seconds: f0 at base,
        f1 at base+100."""
        import glob as g

        for f in sorted(gg for gg in g.glob(root + "/**/*",
                                            recursive=True)
                        if os.path.isfile(gg)
                        and not gg.endswith("_SUCCESS")):
            os.utime(f, (base, base))
            base += 100

    @pytest.mark.parametrize("fmt", ["parquet", "orc"])
    def test_glob_parity(self, spark, cache_dir, tmp_path, fmt):
        root = self._table(tmp_path, fmt)
        eng = _engine(spark, cache_dir)
        try:
            jvm = (spark.read.format(fmt)
                   .option("pathGlobFilter", "f1.*").load(root))
            got = eng.read_format(root, fmt, pathGlobFilter="f1.*")
            plan = got._jdf.queryExecution().toString()
            assert f"sidecar_cached_{fmt}" in plan
            _parity(jvm, got)
        finally:
            eng.close()

    @pytest.mark.parametrize("opt", ["modifiedBefore",
                                     "modifiedAfter"])
    def test_modified_windows_parity(self, spark, cache_dir,
                                     tmp_path, opt):
        """Strict-comparison semantics pinned against the JVM: the
        boundary value sits EXACTLY on one file's mtime, so an
        off-by-inclusive implementation diverges immediately."""
        import datetime

        root = self._table(tmp_path)
        base = 1_700_000_000
        self._set_mtimes(root, base)
        eng = _engine(spark, cache_dir)
        try:
            for edge in (base, base + 50, base + 100, base + 101):
                stamp = (datetime.datetime.fromtimestamp(
                    edge, datetime.timezone.utc)
                    .strftime("%Y-%m-%dT%H:%M:%S"))
                try:
                    jvm = (spark.read.format("parquet")
                           .option(opt, stamp).load(root))
                    jvm_rows = sorted(map(str, jvm.collect()))
                except Exception:
                    # an empty-after-filter listing errors in the
                    # JVM (UNABLE_TO_INFER_SCHEMA) — ours must fail
                    # loudly too
                    with pytest.raises(Exception):
                        eng.read_parquet(root,
                                         **{opt: stamp}).collect()
                    continue
                got = eng.read_parquet(root, **{opt: stamp})
                plan = got._jdf.queryExecution().toString()
                assert "sidecar_cached_parquet" in plan, (opt, edge)
                assert (sorted(map(str, got.collect()))
                        == jvm_rows), (opt, edge)
        finally:
            eng.close()

    def test_non_utc_session_goes_raw(self, spark, cache_dir,
                                      tmp_path):
        """The JVM applies a DOUBLE zone shift to modified windows
        under a non-UTC session (probed: under Asia/Tokyo a stamp 12h
        past the mtime still matched modifiedAfter) — reproduced only
        empirically, so the engine refuses to guess and reads raw;
        the raw read gives parity by construction (the JVM applies
        its own quirk)."""
        import datetime

        root = self._table(tmp_path)
        base = 1_700_000_000
        self._set_mtimes(root, base)
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        try:
            stamp = (datetime.datetime.fromtimestamp(
                base + 50, datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%S"))
            eng = _engine(spark, cache_dir)
            try:
                got = eng.read_parquet(root, modifiedAfter=stamp)
                plan = got._jdf.queryExecution().toString()
                assert "sidecar_cached_parquet" not in plan
                _parity((spark.read.format("parquet")
                         .option("modifiedAfter", stamp).load(root)),
                        got)
            finally:
                eng.close()
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    def test_glob_for_rawfile_and_compose(self, spark, cache_dir,
                                          tmp_path):
        d = str(tmp_path)
        for name, data in (("a.txt", b"1,x\n"), ("b.csv", b"2,y\n"),
                           ("c.csv", b"3,z\n")):
            with open(os.path.join(d, name), "wb") as f:
                pass
            with open(os.path.join(d, name), "wb") as f:
                f.write(data)
        eng = _engine(spark, cache_dir)
        try:
            _parity((spark.read.option("pathGlobFilter", "*.csv")
                     .text(d)),
                    eng.read_format(d, "text",
                                    pathGlobFilter="*.csv"))
            ddl = "i int, s string"
            got = eng.read_format(d, "csv", schema=ddl,
                                  pathGlobFilter="*.csv")
            assert ("sidecar_cached_text"
                    in got._jdf.queryExecution().toString())
            _parity((spark.read.schema(ddl)
                     .option("pathGlobFilter", "*.csv").csv(d)),
                    got)
        finally:
            eng.close()

    def test_unparseable_timestamp_goes_raw(self, spark, cache_dir,
                                            tmp_path):
        """An unparseable stamp routes raw, where the JVM raises its
        OWN parse error at load — never a silent guess."""
        root = self._table(tmp_path)
        eng = _engine(spark, cache_dir)
        try:
            with pytest.raises(Exception):
                eng.read_parquet(root,
                                 modifiedBefore="not-a-time")
        finally:
            eng.close()


class TestDriverModeListingOptions:
    """Round-8: pathGlobFilter + modified windows served natively in
    DRIVER mode too — the engine filters the ORIGINAL listing (so the
    mirror-name hazard never arises) and serves survivors through the
    symlink view, cached."""

    def _engine(self, spark, cache_dir):
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        return Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False))

    def _table(self, tmp_path):
        root = os.path.join(str(tmp_path), "t")
        for i in (0, 1):
            d2 = os.path.join(root, f"k={i}")
            os.makedirs(d2, exist_ok=True)
            pq.write_table(pa.table({"v": [i * 10, i * 10 + 1]}),
                           os.path.join(d2, f"f{i}.parquet"))
        return root

    def test_glob_served_from_view(self, spark, cache_dir, tmp_path):
        root = self._table(tmp_path)
        eng = self._engine(spark, cache_dir)
        try:
            jvm = (spark.read.format("parquet")
                   .option("pathGlobFilter", "f1.*").load(root))
            got = eng.read_parquet(root, pathGlobFilter="f1.*")
            _parity(jvm, got)
            # served through the cache view, not the original tree
            assert all(cache_dir in f for f in got.inputFiles())
        finally:
            eng.close()

    def test_modified_window_served_from_view(self, spark, cache_dir,
                                              tmp_path):
        import datetime

        root = self._table(tmp_path)
        base = 1_700_000_000
        for i, f in enumerate(sorted(
                os.path.join(dp, fn)
                for dp, _, fns in os.walk(root) for fn in fns
                if fn.endswith(".parquet"))):
            os.utime(f, (base + i * 100, base + i * 100))
        stamp = (datetime.datetime.fromtimestamp(
            base + 50, datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%S"))
        eng = self._engine(spark, cache_dir)
        try:
            jvm = (spark.read.format("parquet")
                   .option("modifiedAfter", stamp).load(root))
            got = eng.read_parquet(root, modifiedAfter=stamp)
            _parity(jvm, got)
            assert all(cache_dir in f for f in got.inputFiles())
        finally:
            eng.close()

    def test_csv_glob_driver_mode(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        for name, data in (("a.txt", b"IGNORED\n"),
                           ("b.csv", b"2,y\n"), ("c.csv", b"3,z\n")):
            with open(os.path.join(d, name), "wb") as f:
                f.write(data)
        ddl = "i int, s string"
        eng = self._engine(spark, cache_dir)
        try:
            _parity((spark.read.schema(ddl)
                     .option("pathGlobFilter", "*.csv").csv(d)),
                    eng.read_format(d, "csv", schema=ddl,
                                    pathGlobFilter="*.csv"))
        finally:
            eng.close()

    def test_base_path_still_raw(self, spark, cache_dir, tmp_path):
        root = self._table(tmp_path)
        eng = self._engine(spark, cache_dir)
        try:
            got = eng.read_parquet(os.path.join(root, "k=1"),
                                   basePath=root)
            assert all(cache_dir not in f for f in got.inputFiles())
            _parity((spark.read.option("basePath", root)
                     .parquet(os.path.join(root, "k=1"))), got)
        finally:
            eng.close()
