"""Exotic parquet type and compatibility-conf parity (round-7 probe
sweep, third wave). The JVM parquet scan widens unsigned ints
(uint8→smallint, uint16→int, uint32→bigint, uint64→decimal(20,0)),
REFUSES TIMESTAMP(NANOS)/TIME outright (PARQUET_TYPE_ILLEGAL), and a
set of rare compatibility confs (binaryAsString, int96AsTimestamp,
nanosAsLong, ignoreCorrupt/MissingFiles, partition type inference)
changes its behavior — the executor source must match on every one,
either natively or via the engine's raw fallback. All cases oracled
against the live JVM in the same test.
"""

import datetime
import os
import tempfile

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig


def _conf(cache_dir, mode="executor"):
    return SidecarConfig.create(
        cache_dir=tempfile.mkdtemp(prefix=f"tp-{mode}-", dir=cache_dir),
        data_cache_type="file", cache_persistent=False,
        resolve_mode=mode)


def _engine_read(spark, cache_dir, root, mode="executor",
                 expect_cached=None):
    from sidecar_spark import Engine

    eng = Engine(spark, conf=_conf(cache_dir, mode))
    try:
        df = eng.read_parquet(root)
        if expect_cached is not None:
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert ("sidecar_cached" in plan) == expect_cached
        return df.schema, sorted(map(str, df.collect()))
    finally:
        eng.close()
        CacheManager.clear_instances()


class TestUnsignedWidening:
    def test_uint_matrix_parity(self, spark, cache_dir):
        """pyarrow-written unsigned columns, extreme values included:
        both resolve modes must serve the JVM's widened schema and
        exact values (uint64 above int64 max becomes decimal(20,0))."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-uint-")
        tbl = pa.table({
            "u8": pa.array([0, 200, 255], type=pa.uint8()),
            "u16": pa.array([0, 60000, 65535], type=pa.uint16()),
            "u32": pa.array([0, 4000000000, 4294967295],
                            type=pa.uint32()),
            "u64": pa.array([0, 2**63 + 5, 2**64 - 1],
                            type=pa.uint64()),
        })
        pq.write_table(tbl, f"{d}/p.parquet")
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        assert jvm.schema.simpleString() == (
            "struct<u8:smallint,u16:int,u32:bigint,u64:decimal(20,0)>")
        for mode in ("executor", "driver"):
            schema, rows = _engine_read(spark, cache_dir, d, mode)
            assert schema == jvm.schema, mode
            assert rows == want, mode

    def test_nested_uint_parity(self, spark, cache_dir):
        """Unsigned leaves inside struct/array widen too."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-uintn-")
        tbl = pa.table({
            "st": pa.array([{"a": 4000000000}],
                           type=pa.struct([("a", pa.uint32())])),
            "arr": pa.array([[1, 2**63 + 7]],
                            type=pa.list_(pa.uint64())),
        })
        pq.write_table(tbl, f"{d}/p.parquet")
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        schema, rows = _engine_read(spark, cache_dir, d)
        assert schema == jvm.schema
        assert rows == want


class TestIllegalTypeRefusal:
    def _write_ns(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-ns-")
        pq.write_table(pa.table({
            "ts": pa.array([datetime.datetime(2020, 1, 1, 12)],
                           type=pa.timestamp("ns"))}), f"{d}/p.parquet")
        return d

    def test_nanos_refused_like_jvm(self, spark, cache_dir):
        """TIMESTAMP(NANOS) files: the JVM refuses them
        (PARQUET_TYPE_ILLEGAL) — serving silently-coerced µs values
        would diverge, so the executor source refuses too."""
        from sidecar_spark import Engine

        d = self._write_ns()
        # pin the default: the query battery intentionally leaves
        # nanosAsLong=true session-wide for the NANOS events table
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        try:
            with pytest.raises(Exception):
                spark.read.parquet(d).collect()  # JVM oracle
            eng = Engine(spark, conf=_conf(cache_dir))
            try:
                with pytest.raises(Exception) as ei:
                    eng.read_parquet(d).collect()
                assert "Illegal Parquet type" in str(ei.value)
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    def test_time_refused_like_jvm(self, spark, cache_dir):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-time-")
        pq.write_table(pa.table({
            "t": pa.array([datetime.time(12, 30, 15)],
                          type=pa.time64("us"))}), f"{d}/p.parquet")
        with pytest.raises(Exception):
            spark.read.parquet(d).collect()  # JVM oracle
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            with pytest.raises(Exception) as ei:
                eng.read_parquet(d).collect()
            assert "Illegal Parquet type" in str(ei.value)
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_v1_micros_annotation_still_served(self, spark, cache_dir):
        """pyarrow version=1.0 coerces ns data to a MICROS annotation
        (probed) — the JVM serves it, so the refusal must key on the
        parquet ANNOTATION, not the arrow value type."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-v1-")
        pq.write_table(pa.table({
            "ts": pa.array([datetime.datetime(2020, 1, 1, 12)],
                           type=pa.timestamp("ns"))}),
            f"{d}/p.parquet", version="1.0")
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        schema, rows = _engine_read(spark, cache_dir, d)
        assert schema == jvm.schema
        assert rows == want

    def test_nanos_as_long_native(self, spark, cache_dir):
        """nanosAsLong=true: the JVM reads NANOS-annotated columns as
        bigint; the executor source implements it natively (the raw
        ns counts, annotation-keyed) so the read STAYS CACHED — the
        query battery leaves this conf set for the events table, and
        a raw fallback here would silently un-cache everything
        after."""
        d = self._write_ns()
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            jvm = spark.read.parquet(d)
            assert jvm.schema.simpleString() == "struct<ts:bigint>"
            want = sorted(map(str, jvm.collect()))
            schema, rows = _engine_read(spark, cache_dir, d)
            assert schema == jvm.schema
            assert rows == want
        finally:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


class TestCompatConfFallback:
    def test_binary_as_string(self, spark, cache_dir):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-bas-")
        pq.write_table(pa.table({
            "b": pa.array([b"hello", b"\x00\x01"], type=pa.binary())}),
            f"{d}/p.parquet")
        spark.conf.set("spark.sql.parquet.binaryAsString", "true")
        try:
            jvm = spark.read.parquet(d)
            assert jvm.schema.simpleString() == "struct<b:string>"
            want = sorted(map(str, jvm.collect()))
            # round 10: served NATIVELY (schema-level remap + the
            # cast gate's unvalidated binary→string reinterpret)
            schema, rows = _engine_read(spark, cache_dir, d,
                                        expect_cached=True)
            assert schema == jvm.schema
            assert rows == want
        finally:
            spark.conf.unset("spark.sql.parquet.binaryAsString")

    def test_binary_as_string_nested(self, spark, cache_dir):
        """The flag remaps NESTED binaries too (probed B5:
        struct/list element binaries read string), recursively
        through the conformance layer."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-basn-")
        pq.write_table(pa.table({
            "st": pa.array([{"x": b"ab"}],
                           type=pa.struct([("x", pa.binary())])),
            "lst": pa.array([[b"cd", b"\x00z"]],
                            type=pa.list_(pa.binary()))}),
            f"{d}/p.parquet")
        spark.conf.set("spark.sql.parquet.binaryAsString", "true")
        try:
            jvm = spark.read.parquet(d)
            assert "string" in jvm.schema.simpleString()
            want = sorted(map(str, jvm.collect()))
            schema, rows = _engine_read(spark, cache_dir, d,
                                        expect_cached=True)
            assert schema == jvm.schema
            assert rows == want
        finally:
            spark.conf.unset("spark.sql.parquet.binaryAsString")

    def test_binary_as_string_orc_unaffected(self, spark, cache_dir,
                                             tmp_path):
        """PARQUET-only conf (probed B6): an ORC binary column stays
        binary under the flag, still served cached."""
        from sidecar_spark import Engine

        d = str(tmp_path / "orcb")
        (spark.createDataFrame([(bytearray(b"xy"),)], "b binary")
         .coalesce(1).write.mode("overwrite").orc(d))
        spark.conf.set("spark.sql.parquet.binaryAsString", "true")
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        try:
            df = eng.read_format(d, "orc")
            assert dict(df.dtypes)["b"] == "binary"
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "sidecar_cached" in plan
            assert (sorted(map(str, df.collect()))
                    == sorted(map(str, spark.read.orc(d).collect())))
        finally:
            spark.conf.unset("spark.sql.parquet.binaryAsString")
            eng.close()
            CacheManager.clear_instances()

    def test_partition_type_inference_off(self, spark, cache_dir):
        """Inference disabled: every partition column is STRING with
        the raw directory value (probed: '5' and '2020-01-01' both
        stay strings)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-pti-")
        os.makedirs(f"{d}/k=5")
        os.makedirs(f"{d}/k=2020-01-01")
        pq.write_table(pa.table({"v": pa.array([1])}),
                       f"{d}/k=5/a.parquet")
        pq.write_table(pa.table({"v": pa.array([2])}),
                       f"{d}/k=2020-01-01/b.parquet")
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        spark.conf.set(key, "false")
        try:
            jvm = spark.read.parquet(d)
            assert dict(jvm.dtypes)["k"] == "string"
            want = sorted(map(str, jvm.collect()))
            # round 10: served NATIVELY (the ladder short-circuits
            # to string; an all-null column stays void — probed N1)
            schema, rows = _engine_read(spark, cache_dir, d,
                                        expect_cached=True)
            assert schema == jvm.schema
            assert rows == want
            d2 = tempfile.mkdtemp(prefix="tp-pti2-")
            os.makedirs(f"{d2}/k=__HIVE_DEFAULT_PARTITION__")
            pq.write_table(
                pa.table({"v": pa.array([3])}),
                f"{d2}/k=__HIVE_DEFAULT_PARTITION__/c.parquet")
            jvm = spark.read.parquet(d2)
            assert dict(jvm.dtypes)["k"] == "void"
            schema, rows = _engine_read(spark, cache_dir, d2,
                                        expect_cached=True)
            assert schema == jvm.schema
            assert rows == sorted(map(str, jvm.collect()))
        finally:
            spark.conf.unset(key)

    def test_int96_as_timestamp_false_is_vestigial(self, spark,
                                                   cache_dir,
                                                   tmp_path):
        """Spark 4.1 IGNORES int96AsTimestamp=false (probed: an
        INT96 file still reads timestamp under the flag), so the
        executor path needn't route raw on it — both sides agree,
        cached."""
        d = str(tmp_path / "i96")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       "INT96")
        (spark.sql("SELECT timestamp'2024-01-02 03:04:05.123456' "
                   "AS t, 7 AS i").coalesce(1)
         .write.mode("overwrite").parquet(d))
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.int96AsTimestamp", "false")
        try:
            jvm = spark.read.parquet(d)
            assert dict(jvm.dtypes)["t"] == "timestamp"
            want = sorted(map(str, jvm.collect()))
            schema, rows = _engine_read(spark, cache_dir, d,
                                        expect_cached=True)
            assert schema == jvm.schema
            assert rows == want
        finally:
            spark.conf.unset("spark.sql.parquet.int96AsTimestamp")

    def test_ignore_corrupt_files(self, spark, cache_dir):
        """ignoreCorruptFiles=true with an explicit-schema read skips
        the corrupt file and serves the good rows (probed: schema
        inference still fails, so the parity read passes a schema)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-icf-")
        pq.write_table(pa.table({"v": pa.array([1, 2])}),
                       f"{d}/good.parquet")
        with open(f"{d}/zbad.parquet", "wb") as f:
            f.write(b"PAR1 this is not parquet PAR1")
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        try:
            jvm = (spark.read.schema("v bigint").parquet(d))
            want = sorted(map(str, jvm.collect()))
            assert want  # the good file's rows survive
            eng = Engine(spark, conf=_conf(cache_dir))
            try:
                got = eng.read_parquet(d, schema="v bigint")
                assert sorted(map(str, got.collect())) == want
            finally:
                eng.close()
                CacheManager.clear_instances()
        finally:
            spark.conf.unset("spark.sql.files.ignoreCorruptFiles")


class TestWriteLegacyFormat:
    """``spark.sql.parquet.writeLegacyFormat=true`` (Hive/Impala
    compat) files: parquet-mr's backward-compat name rule makes a
    ``repeated group array (List)`` under a LIST group the element
    ITSELF, so nested lists read as ``array<array<T>>`` — pyarrow
    wraps them in a single-field struct instead (probed, silent
    schema AND value divergence). ``_legacy_list_unwraps`` +
    ``_unwrap_legacy_array`` restore the JVM shape."""

    def _write_legacy(self, spark, sql):
        d = tempfile.mkdtemp(prefix="tp-wlf-")
        spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
        try:
            spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(d)
        finally:
            spark.conf.unset("spark.sql.parquet.writeLegacyFormat")
        return d

    def _parity(self, spark, cache_dir, d):
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        for mode in ("executor", "driver"):
            schema, rows = _engine_read(spark, cache_dir, d, mode)
            assert schema == jvm.schema, (
                mode, schema.simpleString(), jvm.schema.simpleString())
            assert rows == want, mode

    def test_nested_list_unwrap(self, spark, cache_dir):
        d = self._write_legacy(spark, """
            SELECT 1 AS id, array(array(1,2), array(3)) AS aa
            UNION ALL SELECT 2, NULL
            UNION ALL SELECT 3, array(array(9))""")
        self._parity(spark, cache_dir, d)

    def test_triple_nested_list(self, spark, cache_dir):
        """THREE-plus levels of legacy nesting: pyarrow refuses the
        footer outright ('LIST-annotated groups must not be
        repeated'), so the executor read fails LOUDLY — never a
        silent wrong answer — while driver mode (the JVM reads the
        symlink view) serves it correctly (PARITY.md)."""
        from sidecar_spark import Engine

        d = self._write_legacy(spark, """
            SELECT array(array(array(1,2), array(3)),
                         array(array(4))) AS aaa""")
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        schema, rows = _engine_read(spark, cache_dir, d, "driver")
        assert schema == jvm.schema
        assert rows == want
        eng = Engine(spark, conf=_conf(cache_dir, "executor"))
        try:
            with pytest.raises(Exception) as ei:
                eng.read_parquet(d).collect()
            assert "repeated" in str(ei.value).lower()
        finally:
            eng.close()
            CacheManager.clear_instances()


    def test_nested_list_nullable_elements(self, spark, cache_dir):
        """NULLABLE inner elements make the legacy writer emit the
        3-level 'bag' form INSIDE the name-rule subtree — pyarrow
        stops flattening single-child repeated groups there (probed:
        struct<array:int64> where the JVM serves int64), so the
        degraded-mode walk registers a second unwrap level."""
        d = self._write_legacy(spark, """
            SELECT k, array(array(k % 10), array(k, k)) AS aa
            FROM (SELECT CAST(id AS BIGINT) k FROM range(50))""")
        self._parity(spark, cache_dir, d)

    def test_nested_list_in_map_and_struct(self, spark, cache_dir):
        d = self._write_legacy(spark, """
            SELECT map('k', array(array(1.5D))) AS m,
                   named_struct('inner',
                                array(array('x','y'))) AS st""")
        self._parity(spark, cache_dir, d)

    def test_flat_legacy_shapes_unchanged(self, spark, cache_dir):
        """Flat lists ('bag' form), maps and decimals in legacy files
        already decoded at parity — guard they stay that way."""
        d = self._write_legacy(spark, """
            SELECT array(1,2,3) AS a, map('k', 1.5D) AS m,
                   CAST(123.45 AS DECIMAL(9,2)) AS d9,
                   named_struct('x', array('s')) AS st
            UNION ALL
            SELECT array(), map(), NULL,
                   named_struct('x', CAST(NULL AS array<string>))""")
        self._parity(spark, cache_dir, d)


class TestNullPartition:
    def test_hive_default_partition_parity(self, spark, cache_dir):
        """``__HIVE_DEFAULT_PARTITION__`` directories read back as
        NULL partition values, IS NULL filters included (probed at
        parity — this guards it)."""
        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-nullpart-")
        spark.sql("SELECT * FROM VALUES (1,'a'),(2,NULL),(3,'b') "
                  "t(v, k)") \
            .write.mode("overwrite").partitionBy("k").parquet(d)
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        schema, rows = _engine_read(spark, cache_dir, d)
        assert schema == jvm.schema
        assert rows == want
        jvm_null = sorted(map(str, spark.read.parquet(d)
                              .where("k IS NULL").collect()))
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            got = sorted(map(str, eng.read_parquet(d)
                             .where("k IS NULL").collect()))
            assert got == jvm_null and len(got) == 1
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestDottedColumnNames:
    """A flat column literally named ``a.b`` has parquet path
    ``a.b`` — indistinguishable by path from a nested leaf. The old
    stat-prune heuristic excluded it as 'nested' and the downstream
    miss read as 'absent from the file → null-filled', wrongly
    pruning EVERY row group for an eq filter (probed: silent empty
    result with pushdown on). The fix keys prunability on the arrow
    top-level field identity."""

    def test_dotted_name_filter_parity(self, spark, cache_dir):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-dot-")
        pq.write_table(pa.table({
            "a.b": pa.array([1, 2]),
            "c d": pa.array(["x", "y"]),
            "plain": pa.array([10, 20])}), f"{d}/p.parquet")
        jvm = sorted(map(str, spark.read.parquet(d)
                         .where("`a.b` = 2").collect()))
        assert len(jvm) == 1
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            got = sorted(map(str, eng.read_parquet(d)
                             .where("`a.b` = 2").collect()))
            assert got == jvm
            # dotted names still PRUNE nothing but stats on plain
            # names still prune correctly alongside them
            got2 = sorted(map(str, eng.read_parquet(d)
                              .where("`a.b` = 2 AND plain = 20")
                              .collect()))
            assert got2 == jvm
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_flat_dotted_vs_nested_ambiguity(self, spark, cache_dir):
        """A file holding BOTH a flat ``a.b`` and a struct ``a.b``
        leaf: the two column chunks share the path — both drop out of
        OUR pruning (kept), values stay exact. The JVM's own parquet
        pushdown mis-resolves the ambiguous path to the nested leaf
        and returns EMPTY (probed: correct row with
        spark.sql.parquet.filterPushdown=false) — a JVM wrong-result
        this engine intentionally does not replicate (PARITY.md), so
        the oracle here is the JVM with its pushdown off."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-amb-")
        pq.write_table(pa.table({
            "a.b": pa.array([1, 2]),
            "a": pa.array([{"b": 10}, {"b": 20}],
                          type=pa.struct([("b", pa.int64())]))}),
            f"{d}/p.parquet")
        spark.conf.set("spark.sql.parquet.filterPushdown", "false")
        try:
            jvm = sorted(map(str, spark.read.parquet(d)
                             .where("`a.b` = 2").collect()))
        finally:
            spark.conf.unset("spark.sql.parquet.filterPushdown")
        assert len(jvm) == 1
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            got = sorted(map(str, eng.read_parquet(d)
                             .where("`a.b` = 2").collect()))
            assert got == jvm
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_absent_column_prune_still_exact(self, spark, cache_dir):
        """Guard the schema-evolution semantic the fix refined: a
        filter on a column genuinely ABSENT from one file still
        null-fills (only IS NULL matches) under mergeSchema."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-abs-")
        pq.write_table(pa.table({"v": pa.array([1])}), f"{d}/a.parquet")
        pq.write_table(pa.table({"v": pa.array([2]),
                                 "extra": pa.array([99])}),
                       f"{d}/b.parquet")
        jvm = spark.read.option("mergeSchema", "true").parquet(d)
        want_eq = sorted(map(str, jvm.where("extra = 99").collect()))
        want_null = sorted(map(str, jvm.where("extra IS NULL")
                               .collect()))
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            got = eng.read_parquet(d, mergeSchema="true")
            assert sorted(map(str, got.where("extra = 99")
                              .collect())) == want_eq
            got2 = eng.read_parquet(d, mergeSchema="true")
            assert sorted(map(str, got2.where("extra IS NULL")
                              .collect())) == want_null
        finally:
            eng.close()
            CacheManager.clear_instances()


class TestSchemaDumpParser:
    def test_space_named_group_keeps_stack_balanced(self, spark,
                                                     cache_dir):
        """A struct whose NAME defeats the schema-dump pattern (space
        in the name) must not desynchronize the parser's stack — the
        sibling columns after it still read at parity."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-spname-")
        pq.write_table(pa.table({
            "c d": pa.array([{"x": 1}, {"x": 2}],
                            type=pa.struct([("x", pa.int64())])),
            "after": pa.array([[10], [20, 30]],
                              type=pa.list_(pa.int64()))}),
            f"{d}/p.parquet")
        jvm = spark.read.parquet(d)
        want = sorted(map(str, jvm.collect()))
        schema, rows = _engine_read(spark, cache_dir, d)
        assert schema == jvm.schema
        assert rows == want


class TestUserSchema:
    """Explicit user schemas through the executor source (round-7):
    the JVM reads the files through the user's schema with a fixed
    conversion matrix (``_cast_gate``) — subset/reorder/superset,
    truncating int downcasts, widening, decimal rescale, refusals —
    and partition columns RELOCATE to the end, user-typed when named.
    Every case is oracled against the live JVM."""

    @pytest.fixture()
    def data_dir(self):
        import decimal as _dec

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-us-")
        pq.write_table(pa.table({
            "i": pa.array([1, 70000, -70000], type=pa.int32()),
            "l": pa.array([10, 20, 30], type=pa.int64()),
            "s": pa.array(["x", "y", "z"]),
            "d9": pa.array([_dec.Decimal("123.45"),
                            _dec.Decimal("1.23"), None],
                           type=pa.decimal128(9, 2)),
            "st": pa.array([{"a": 1, "b": "p"}] * 3,
                           type=pa.struct([("a", pa.int64()),
                                           ("b", pa.string())])),
        }), f"{d}/p.parquet")
        return d

    @pytest.fixture()
    def part_dir(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="tp-usp-")
        os.makedirs(f"{d}/k=5")
        os.makedirs(f"{d}/k=7")
        pq.write_table(pa.table({"v": pa.array([1])}),
                       f"{d}/k=5/a.parquet")
        pq.write_table(pa.table({"v": pa.array([2])}),
                       f"{d}/k=7/b.parquet")
        return d

    def _parity(self, spark, cache_dir, root, sch):
        from sidecar_spark import Engine

        jdf = spark.read.schema(sch).parquet(root)
        want = (jdf.schema, sorted(map(str, jdf.collect())))
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            gdf = eng.read_parquet(root, schema=sch)
            assert gdf.schema == want[0], (
                gdf.schema.simpleString(), want[0].simpleString())
            assert sorted(map(str, gdf.collect())) == want[1]
        finally:
            eng.close()
            CacheManager.clear_instances()

    def _both_refuse(self, spark, cache_dir, root, sch):
        from sidecar_spark import Engine

        with pytest.raises(Exception):
            spark.read.schema(sch).parquet(root).collect()
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            with pytest.raises(Exception):
                eng.read_parquet(root, schema=sch).collect()
        finally:
            eng.close()
            CacheManager.clear_instances()

    @pytest.mark.parametrize("sch", [
        "i int, l bigint, s string, d9 decimal(9,2), "
        "st struct<a:bigint,b:string>",
        "s string, i int",                       # subset + reorder
        "i int, missing string, l bigint",       # superset null-fill
        "i bigint, s string",                    # widen
        "i tinyint",                             # truncating downcast
        "i smallint",
        "i double",
        "d9 decimal(18,4)",                      # rescale
        "d9 decimal(18,2)",
        "l decimal(20,0)",
        "st struct<a:bigint>",                   # struct subset
        "st struct<a:bigint,b:string,c:int>",    # struct extra
        "I int, S string",                       # case difference
        "s binary",                              # reinterpret
    ])
    def test_supported_conversions(self, spark, cache_dir, data_dir,
                                   sch):
        self._parity(spark, cache_dir, data_dir, sch)

    @pytest.mark.parametrize("sch", [
        "l int",                # int64 never narrows
        "i string",             # no int->string
        "d9 decimal(5,2)",      # integer digits shrink
        "st struct<a:int>",     # nested int64 narrow
    ])
    def test_refused_conversions(self, spark, cache_dir, data_dir,
                                 sch):
        self._both_refuse(spark, cache_dir, data_dir, sch)

    @pytest.mark.parametrize("sch", [
        "v bigint",              # partition col appended, inferred
        "v bigint, k string",    # user-typed partition value
        "v bigint, k double",
        "k int, v bigint",       # partition col relocates to the end
    ])
    def test_partition_interaction(self, spark, cache_dir, part_dir,
                                   sch):
        self._parity(spark, cache_dir, part_dir, sch)

    def test_partition_filter_with_user_type(self, spark, cache_dir,
                                             part_dir):
        """A filter on a user-STRING-typed partition column prunes
        and evaluates with string semantics on both paths."""
        from sidecar_spark import Engine

        sch = "v bigint, k string"
        jvm = sorted(map(str, spark.read.schema(sch).parquet(part_dir)
                         .where("k = '5'").collect()))
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            got = sorted(map(str, eng.read_parquet(part_dir, schema=sch)
                             .where("k = '5'").collect()))
            assert got == jvm and len(got) == 1
        finally:
            eng.close()
            CacheManager.clear_instances()

    def test_evolution_gate_matches_jvm(self, spark, cache_dir):
        """The SAME conversion matrix governs un-merged schema
        evolution: a table whose first footer declares int while a
        later file stores bigint must FAIL the read like the JVM
        (previously an in-range value would silently cast)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sidecar_spark import Engine

        d = tempfile.mkdtemp(prefix="tp-evog-")
        pq.write_table(pa.table({"v": pa.array([1], type=pa.int32())}),
                       f"{d}/a.parquet")
        pq.write_table(pa.table({"v": pa.array([2], type=pa.int64())}),
                       f"{d}/b.parquet")
        with pytest.raises(Exception):
            spark.read.parquet(d).collect()  # JVM oracle (int32 decl)
        eng = Engine(spark, conf=_conf(cache_dir))
        try:
            with pytest.raises(Exception):
                eng.read_parquet(d).collect()
        finally:
            eng.close()
            CacheManager.clear_instances()
