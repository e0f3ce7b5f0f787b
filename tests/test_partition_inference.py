"""Partition-value type inference and layout parity with the JVM scan
(round-6 verdict item 3: the four unprobed edges).

Every rule here was pinned against a real Spark 4.1 JVM scan first
(the round-6 probe sweep); the end-to-end tests below re-derive the
ground truth live — ``spark.read.parquet`` on the same directory IS
the oracle, so a Spark behavior change fails loudly instead of
silently diverging.
"""

import os
import shutil
import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode):
    return SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode=mode)


def _engine(spark, cache_dir, mode):
    from sidecar_spark import Engine

    return Engine(spark, conf=_conf(
        tempfile.mkdtemp(prefix=f"pi-{mode}-", dir=cache_dir), mode))


def _write_part(spark, root, rel, rows, schema="id int, v string"):
    stage = os.path.join(root, "_stage")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    dst = os.path.join(root, rel) if rel else root
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stage, f), os.path.join(dst, f))
    shutil.rmtree(stage)


def _assert_parity(spark, cache_dir, root, modes=("driver", "executor")):
    jvm = spark.read.parquet(root)
    want_schema = jvm.schema
    # string-compare rows: NaN != NaN would fail Row equality even
    # between two identical JVM reads
    want = sorted(map(str, jvm.collect()))
    for mode in modes:
        eng = _engine(spark, cache_dir, mode)
        try:
            got = eng.read_parquet(root)
            assert got.schema == want_schema, (mode, got.schema)
            assert sorted(map(str, got.collect())) == want, mode
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestInferenceLadderUnits:
    """The pure-python ladder vs the probed JVM truth table."""

    def test_value_ladder(self):
        from sidecar_spark.cache.partitions import infer_value_type

        cases = [
            ("5", ("int", None)), ("007", ("int", None)),
            ("+5", ("int", None)),
            ("9223372036854775806", ("bigint", None)),
            # Integer/Long.parseInt accept leading zeros of ANY length
            # — the gate counts significant digits (round-6 advice #3)
            ("0" * 24 + "1", ("int", None)),
            ("-" + "0" * 30, ("int", None)),
            ("+" + "0" * 25 + "9223372036854775806", ("bigint", None)),
            ("0" * 4300, ("int", None)),  # all-zero: int 0, no giant int
            ("123456789012345678901", ("decimal", 21)),
            ("1e5", ("decimal", 6)),      # JBigDecimal scale -5 → 100000
            ("1.", ("decimal", 1)),       # scale 0
            ("1.5", ("double", None)), ("1e-2", ("double", None)),
            ("1e40", ("double", None)),   # 41 digits > 38 → double
            ("9" * 45, ("double", None)),
            ("NaN", ("double", None)), ("-Infinity", ("double", None)),
            ("1_0", ("string", None)),    # Java rejects underscores
            ("true", ("string", None)),
            ("2024-01-01", ("date", None)),
            ("2024-01-32", ("string", None)),   # cast-null → fall through
            ("2024-1-1", ("string", None)),     # strict padded pattern
            ("2024-01-01 12:34:56", ("timestamp", None)),
            ("2024-01-01T12:34:56", ("string", None)),   # no 'T' form
            ("2024-01-01 12:34:56.789", ("string", None)),  # no fraction
        ]
        for v, want in cases:
            assert infer_value_type(v) == want, v

    def test_widening(self):
        from sidecar_spark.cache.partitions import infer_partition_types

        def infer(vals):
            return infer_partition_types([[("x", v)] for v in vals])[0][1]

        assert infer(["1", "2.5"]) == "double"
        assert infer(["1", "123456789012345678901"]) == "decimal(21,0)"
        assert infer(["5", "1e5"]) == "decimal(10,0)"  # int = decimal(10,0)
        assert infer(["9223372036854775806",
                      "123456789012345678901"]) == "decimal(21,0)"
        # Spark's explicit special case: decimal + double → string
        assert infer(["123456789012345678901", "2.5"]) == "string"
        assert infer(["2024-01-01", "2024-01-02 03:04:05"]) == "timestamp"
        assert infer(["5", "2024-01-01"]) == "string"
        assert infer(["__HIVE_DEFAULT_PARTITION__"]) == "void"
        assert infer(["__HIVE_DEFAULT_PARTITION__", "7"]) == "int"

    def test_case_insensitive_merge_first_sorted_case(self):
        from sidecar_spark.cache.partitions import infer_partition_types

        assert infer_partition_types(
            [[("B", "2")], [("b", "1")]]) == [("B", "int")]


class TestTypedPartitionParityEndToEnd:
    """One multi-key table exercising every inferred type at once,
    against the live JVM scan, in both resolve modes."""

    def test_all_types_one_table(self, spark, cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-t-"), "t.parquet")
        _write_part(spark, root,
                    "d=2024-01-01/x=1e5/t=2024-01-01 12%3A34%3A56/n=7",
                    [(1, "a")])
        _write_part(spark, root,
                    "d=2023-12-31/x=5/t=2024-01-02/"
                    "n=__HIVE_DEFAULT_PARTITION__",
                    [(2, "b")])
        _assert_parity(spark, cache_dir, root)

    def test_double_specials_and_huge_ints(self, spark, cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-n-"), "t.parquet")
        _write_part(spark, root, "x=NaN/y=" + "9" * 45, [(1, "a")])
        _write_part(spark, root, "x=1.5/y=123", [(2, "b")])
        _assert_parity(spark, cache_dir, root)

    def test_all_null_void_column(self, spark, cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-v-"), "t.parquet")
        _write_part(spark, root, "x=__HIVE_DEFAULT_PARTITION__", [(1, "a")])
        _assert_parity(spark, cache_dir, root)

    def test_decimal_plus_double_is_string(self, spark, cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-s-"), "t.parquet")
        _write_part(spark, root, "x=123456789012345678901", [(1, "a")])
        _write_part(spark, root, "x=2.5", [(2, "b")])
        _assert_parity(spark, cache_dir, root)

    def test_zero_padded_int_value(self, spark, cache_dir):
        """A 25-char zero-padded value is int to parseInt (round-6
        advice #3) — live JVM oracle decides the truth."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-z-"), "t.parquet")
        _write_part(spark, root, "x=" + "0" * 24 + "1", [(1, "a")])
        _write_part(spark, root, "x=7", [(2, "b")])
        _assert_parity(spark, cache_dir, root)


class TestPartitionKeyCase:
    def test_shadow_takes_directory_case(self, spark, cache_dir):
        """Data column ``id`` shadowed by dir ``ID=9``: the JVM renames
        the column to the DIRECTORY's case and serves the directory
        value at the file position — both modes must match."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-c-"), "t.parquet")
        _write_part(spark, root, "ID=9", [(1, "a"), (2, "b")])
        jvm = spark.read.parquet(root)
        assert jvm.columns[0] == "ID"  # probe assumption, re-derived
        _assert_parity(spark, cache_dir, root)

    def test_conflicting_key_case_driver_delegates(self, spark, cache_dir):
        """``b=1`` next to ``B=2``: the JVM's merged-column case is
        hash-iteration-order arbitrary (unreproducible), so driver
        mode delegates to the raw JVM scan (verbatim parity,
        uncached) and executor mode refuses loudly instead of
        guessing a maybe-wrong schema."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-k-"), "t.parquet")
        _write_part(spark, root, "b=1", [(1, "a")])
        _write_part(spark, root, "B=2", [(2, "b")])
        _assert_parity(spark, cache_dir, root, modes=("driver",))
        eng = _engine(spark, cache_dir, "executor")
        try:
            with pytest.raises(Exception, match="hive-partitioned|layout"):
                eng.read_parquet(root).collect()
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestLayoutParity:
    def test_nested_plain_dirs_error_like_jvm(self, spark, cache_dir):
        """Non key=value subdirectories: the JVM refuses
        (UNABLE_TO_INFER_SCHEMA) — driver mode delegates to that exact
        error; executor mode raises its own clear one."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-l-"), "t.parquet")
        _write_part(spark, root, "a/b", [(1, "x")])
        _write_part(spark, root, "a/c", [(2, "y")])
        with pytest.raises(Exception):
            spark.read.parquet(root)  # ground truth: JVM refuses
        for mode in ("driver", "executor"):
            eng = _engine(spark, cache_dir, mode)
            try:
                with pytest.raises(Exception):
                    eng.read_parquet(root).collect()
            finally:
                eng.close()
                CacheManager.clear_instances()

    def test_recursive_lookup_reads_nested_cached(self, spark, cache_dir):
        """recursiveFileLookup=true flattens nested dirs and disables
        partition discovery in the JVM; driver mode serves the same
        result from the CACHE (flat resolved paths)."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-r-"), "t.parquet")
        _write_part(spark, root, "a/b", [(1, "x")])
        _write_part(spark, root, "a/c", [(2, "y")])
        jvm = spark.read.option("recursiveFileLookup", "true").parquet(root)
        eng = _engine(spark, cache_dir, "driver")
        try:
            got = eng.read_parquet(root, recursiveFileLookup="true")
            assert got.schema == jvm.schema
            assert (sorted(map(tuple, got.collect()))
                    == sorted(map(tuple, jvm.collect())))
            # and it really is the cached read: resolved local paths
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert eng.conf.cache_dir in plan
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_recursive_lookup_drops_partition_columns(self, spark,
                                                      cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-h-"), "t.parquet")
        _write_part(spark, root, "k=1", [(1, "x")])
        _write_part(spark, root, "k=2", [(2, "y")])
        jvm = spark.read.option("recursiveFileLookup", "true").parquet(root)
        assert "k" not in jvm.columns  # ground truth re-derived
        eng = _engine(spark, cache_dir, "driver")
        try:
            got = eng.read_parquet(root, recursiveFileLookup="true")
            assert got.schema == jvm.schema
            assert got.count() == 2
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_recursive_lookup_key_case_insensitive(self, spark,
                                                   cache_dir):
        """Spark reader option KEYS are case-insensitive — a read
        passing recursivefilelookup="true" must take the same flat
        path as the canonical spelling (round-6 advice #1)."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-rc-"), "t.parquet")
        _write_part(spark, root, "k=1", [(1, "x")])
        _write_part(spark, root, "k=2", [(2, "y")])
        jvm = (spark.read.option("recursivefilelookup", "true")
               .parquet(root))
        assert "k" not in jvm.columns  # ground truth re-derived
        eng = _engine(spark, cache_dir, "driver")
        try:
            got = eng.read_parquet(root, recursivefilelookup="true")
            assert got.schema == jvm.schema
            assert got.count() == 2
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_recursive_lookup_mixed_resolution_stays_flat(
            self, spark, cache_dir):
        """Mixed local/remote resolve + recursiveFileLookup: directory
        structure is NON-semantic under rfl (the JVM flattens), so the
        read keeps the mixed flat-path route — cached where local —
        instead of re-streaming everything from the original root
        (round-7 review finding #3)."""
        from sidecar_spark import Engine

        root = os.path.join(tempfile.mkdtemp(prefix="pi-mx-"),
                            "t.parquet")
        _write_part(spark, root, "k=1", [(1, "x")])
        _write_part(spark, root, "k=2", [(2, "y")])
        excl = next(f for f in os.listdir(os.path.join(root, "k=2"))
                    if f.endswith(".parquet"))
        conf = SidecarConfig.create(
            cache_dir=tempfile.mkdtemp(prefix="pi-mx-c-", dir=cache_dir),
            data_cache_type="file", cache_persistent=False,
            resolve_mode="driver",
            read_exclude_paths=(f".*{excl}",))
        eng = Engine(spark, conf=conf)
        try:
            got = eng.read_parquet(root, recursiveFileLookup="true")
            inputs = [f.replace("file://", "") for f in got.inputFiles()]
            assert any(f.startswith(eng.conf.cache_dir)
                       for f in inputs)         # cached where local
            assert any(f.startswith(root)
                       for f in inputs)         # excluded file: remote
            jvm = (spark.read.option("recursiveFileLookup", "true")
                   .parquet(root))
            assert got.schema == jvm.schema
            assert (sorted(map(str, got.collect()))
                    == sorted(map(str, jvm.collect())))
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_mixed_depth_delegates_to_jvm(self, spark, cache_dir):
        """A file at the root NEXT TO k=... dirs: the JVM silently
        keeps only the partitioned files (probed). Driver mode
        delegates to the raw scan so whatever the JVM does IS the
        result."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-m-"), "t.parquet")
        _write_part(spark, root, "", [(1, "r")])
        _write_part(spark, root, "k=1", [(2, "x")])
        _assert_parity(spark, cache_dir, root, modes=("driver",))


class TestExecutorOptionsRawFallback:
    def test_options_read_scans_remote_root(self, spark, cache_dir):
        """Executor mode + reader options the Python source does not
        implement (mergeSchema now IS implemented — round-7): the scan
        must target the ORIGINAL location, never driver-resolved
        mirror paths (which don't exist on other nodes of a real
        cluster) — round-5 advice item 1."""
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        loc = os.path.join(sf, "nation.parquet")
        eng = _engine(spark, cache_dir, "executor")
        try:
            df = eng.read_parquet(loc, datetimeRebaseMode="CORRECTED")
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert eng.conf.cache_dir not in plan
            assert df.count() == spark.read.parquet(loc).count()
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_mergeschema_read_stays_cached(self, spark, cache_dir):
        """mergeSchema is the one option the executor source DOES
        implement (round-6 verdict #1) — it must stay on the cached
        Python-source path, not fall back to the raw JVM scan."""
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        loc = os.path.join(sf, "nation.parquet")
        eng = _engine(spark, cache_dir, "executor")
        try:
            df = eng.read_parquet(loc, mergeSchema="true")
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PythonScan" in plan or "sidecar" in plan.lower(), plan
            assert df.count() == spark.read.parquet(loc).count()
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestJavaDoubleForms:
    """Round-6 review fixes: Double.parseDouble's full grammar
    (trimmed whitespace, f/F/d/D suffixes, hex floats — JVM-probed),
    plus the giant-numeric guards."""

    def test_java_parse_double_grammar(self):
        from sidecar_spark.cache.partitions import java_parse_double

        assert java_parse_double(" 1") == 1.0       # String.trim
        assert java_parse_double("1 ") == 1.0
        assert java_parse_double("1f") == 1.0       # type suffix
        assert java_parse_double("1.5d") == 1.5
        assert java_parse_double("0x1p3") == 8.0    # hex float
        assert java_parse_double("-0x1p3") == -8.0
        assert java_parse_double("Infinity") == float("inf")
        assert java_parse_double("-Infinity") == float("-inf")
        assert java_parse_double("NaN") != java_parse_double("NaN")  # nan
        assert java_parse_double("nan") is None     # case-sensitive
        assert java_parse_double("NaNf") is None    # no suffix on NaN
        assert java_parse_double("Infinityd") is None
        assert java_parse_double("1_0") is None
        assert java_parse_double("true") is None

    def test_inference_of_java_double_forms(self):
        from sidecar_spark.cache.partitions import infer_value_type

        for v in (" 1", "1 ", "1f", "1.5d", "0x1p3"):
            assert infer_value_type(v) == ("double", None), v
        for v in ("nan", "NaNf", "Infinityd"):
            assert infer_value_type(v) == ("string", None), v

    def test_giant_numerics_do_not_materialize(self):
        import time

        from sidecar_spark.cache.partitions import infer_value_type

        t0 = time.perf_counter()
        assert infer_value_type("9" * 5000) == ("double", None)
        assert infer_value_type("1e999999999") == ("double", None)
        assert time.perf_counter() - t0 < 0.05

    def test_java_forms_parity_end_to_end(self, spark, cache_dir):
        root = os.path.join(tempfile.mkdtemp(prefix="pi-j-"), "t.parquet")
        _write_part(spark, root, "x=1f", [(1, "a")])
        _write_part(spark, root, "x=0x1p3", [(2, "b")])
        _assert_parity(spark, cache_dir, root)


class TestSplitGuards:
    def test_negative_split_bytes_disables_splitting(self, cache_dir):
        """A negative splitBytes must mean 'no splitting' — an empty
        range list would silently drop the file's rows."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark.sources.cached_parquet import (
            CachedParquetReader,
        )

        remote = tempfile.mkdtemp(prefix="neg-remote-")
        pq.write_table(pa.table({"a": list(range(1000))}),
                       os.path.join(remote, "p.parquet"))
        conf = _conf(tempfile.mkdtemp(dir=cache_dir), "executor")
        mgr = CacheManager.get_or_create(conf)
        try:
            reader = CachedParquetReader(
                {"path": remote, "conf": conf.to_json(),
                 "split_bytes": "-65536"})
            parts = reader.partitions()
            assert len(parts) == 1
            assert sum(b.num_rows for b in reader.read(parts[0])) == 1000
        finally:
            mgr.release()
            CacheManager.clear_instances()

    def test_cold_split_scan_fills_mirror_once(self, cache_dir):
        """Only the split owning byte 0 materializes — N cold split
        tasks must not each copy the whole file."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark.sources.cached_parquet import (
            CachedParquetReader,
        )

        remote = tempfile.mkdtemp(prefix="once-remote-")
        pq.write_table(pa.table({"a": list(range(100_000))}),
                       os.path.join(remote, "p.parquet"),
                       row_group_size=10_000)
        conf = _conf(tempfile.mkdtemp(dir=cache_dir), "executor")
        mgr = CacheManager.get_or_create(conf)
        try:
            reader = CachedParquetReader(
                {"path": remote, "conf": conf.to_json(),
                 "split_bytes": "65536"})
            parts = reader.partitions()
            assert len(parts) > 2
            seen = []
            for p in parts:
                for b in reader.read(p):
                    seen.extend(b.column(0).to_pylist())
            assert sorted(seen) == list(range(100_000))
            file_len = os.path.getsize(os.path.join(remote, "p.parquet"))
            mroot = os.path.join(conf.cache_dir, "mirror")
            copies = [n for n in os.listdir(mroot) if ".tmp-" not in n]
            # exactly ONE full-file fill (the byte-0 split), never N
            assert len(copies) == 1
            assert os.path.getsize(
                os.path.join(mroot, copies[0])) == file_len
            # and the next scan is all-local
            r1 = mgr.stats.get("total_read_requests_from_remote")
            for p in reader.partitions():
                for _ in reader.read(p):
                    pass
            assert mgr.stats.get("total_read_requests_from_remote") == r1
        finally:
            mgr.release()
            CacheManager.clear_instances()


class TestSessionZoneForms:
    def test_offset_zone_forms(self):
        import datetime

        from sidecar_spark.sources.cached_parquet import _session_zone

        probe = datetime.datetime(2024, 1, 1)
        for name, hours in (("GMT+8", 8), ("UTC+08:00", 8),
                            ("+08:00", 8), ("-0730", -7.5),
                            ("UT+2", 2)):
            z = _session_zone(name)
            assert z.utcoffset(probe) == datetime.timedelta(hours=hours), name
        assert _session_zone("America/Los_Angeles") is not None
        assert _session_zone("not/a/zone").utcoffset(probe) == \
            datetime.timedelta(0)

    def test_timestamp_partition_respects_session_zone(self, spark,
                                                       cache_dir):
        """Timestamp partition values are wall times in the session
        zone: flip the session to GMT+8 and both modes must still
        match the JVM scan."""
        root = os.path.join(tempfile.mkdtemp(prefix="pi-z-"), "t.parquet")
        _write_part(spark, root, "t=2024-01-01 12%3A34%3A56", [(1, "a")])
        old = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "GMT+8")
        try:
            _assert_parity(spark, cache_dir, root)
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)


class TestEmptyPartitionValue:
    def test_empty_value_refused_like_jvm(self, spark, cache_dir):
        """A ``k=`` directory (empty value): the JVM scan refuses —
        driver mode delegates to that exact error, executor mode
        raises its own clear one (round-6 probe)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = os.path.join(tempfile.mkdtemp(prefix="pi-e-"), "t.parquet")
        for rel, ids in (("k=", [1]), ("k=z", [2])):
            d = os.path.join(root, rel)
            os.makedirs(d)
            pq.write_table(pa.table({"id": ids}),
                           os.path.join(d, "f.parquet"))
        with pytest.raises(Exception):
            spark.read.parquet(root).collect()  # ground truth
        for mode in ("driver", "executor"):
            eng = _engine(spark, cache_dir, mode)
            try:
                with pytest.raises(Exception):
                    eng.read_parquet(root).collect()
            finally:
                eng.close()
                CacheManager.clear_instances()

    def test_spark_written_special_values_roundtrip(self, spark,
                                                    cache_dir):
        """Values Spark itself writes (space, unicode, '=', '/', '%',
        empty string → hive-null, real null) must read back
        identically in both modes."""
        loc = os.path.join(tempfile.mkdtemp(prefix="pi-w-"), "t.parquet")
        df = spark.createDataFrame(
            [(1, "a b"), (2, "café"), (3, "x=y"), (4, "p/q"),
             (5, ""), (6, None), (7, "100%")],
            "id int, k string")
        df.write.partitionBy("k").parquet(loc)
        _assert_parity(spark, cache_dir, loc)
