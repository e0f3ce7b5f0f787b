"""Regression tests for the round-7 ADVICE nits (fixed in round 8).

1. ``_parse_schema_tree`` fails LOUDLY on an unrecognized pyarrow
   ParquetSchema dump instead of silently disabling legacy-list
   unwrapping, and recognizes the RUNNING pyarrow's dump format.
2. user-schema data/partition split uses one case normalization.
3. ``_refuse_illegal_types`` skips columns outside the projection
   (the JVM clips the parquet schema to requested columns first).
4. rebase leaf naming is structural: a genuine struct field named
   ``list``/``key_value`` is not mangled into a container level.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _pf(tmp_path, table, name="t.parquet"):
    p = os.path.join(str(tmp_path), name)
    pq.write_table(table, p)
    return pq.ParquetFile(p)


class TestSchemaDumpParser:
    def test_running_pyarrow_dump_recognized(self, tmp_path):
        """The line grammar must match the RUNNING pyarrow's dump —
        the canary ADVICE r7 #1 asked for."""
        from sidecar_spark.sources.cached_parquet import (
            _parse_schema_tree,
        )

        t = pa.table({
            "aa": pa.array([[1, 2]], type=pa.list_(pa.int64())),
            "m": pa.array([{"k": 1}],
                          type=pa.map_(pa.string(), pa.int64())),
            "s": pa.array([{"x": 1}],
                          type=pa.struct([("x", pa.int64())])),
        })
        pf = _pf(tmp_path, t)
        txt = str(pf.schema)
        assert "repeated group" in txt
        root = _parse_schema_tree(txt)
        names = {c["name"] for c in root["children"]}
        assert names == {"aa", "m", "s"}
        # no "?" placeholder nodes: every line parsed
        def no_unknown(n):
            assert n["name"] != "?"
            for c in n["children"]:
                no_unknown(c)
        no_unknown(root)

    def test_alien_dump_fails_loudly(self):
        from sidecar_spark.sources.cached_parquet import (
            _parse_schema_tree,
        )

        alien = ("schema {\n"
                 "  repeated group aa (List) {\n"   # no field_id=
                 "    int64 element;\n"
                 "  }\n"
                 "}\n")
        with pytest.raises(ValueError, match="dump format"):
            _parse_schema_tree(alien)

    def test_flat_dump_without_repeated_groups_ok(self, tmp_path):
        """A struct-only file has no repeated groups: zero-match is
        legitimate only alongside zero 'repeated group' lines."""
        from sidecar_spark.sources.cached_parquet import (
            _legacy_list_unwraps,
        )

        pf = _pf(tmp_path, pa.table({"a": [1]}))
        assert _legacy_list_unwraps(pf) == frozenset()


class TestRefuseClippedToProjection:
    def _file_with_time(self, tmp_path):
        t = pa.table({
            "ok": pa.array([1, 2], type=pa.int64()),
            "tm": pa.array([1, 2], type=pa.time64("us")),
        })
        return _pf(tmp_path, t)

    def test_unrequested_time_column_passes(self, tmp_path):
        from sidecar_spark.sources.cached_parquet import (
            _refuse_illegal_types,
        )

        pf = self._file_with_time(tmp_path)
        # full read still refuses (JVM inference refuses the footer)
        with pytest.raises(ValueError, match="Illegal Parquet type"):
            _refuse_illegal_types(pf, "t.parquet")
        # projection that omits the TIME column reads fine
        _refuse_illegal_types(pf, "t.parquet", requested={"ok"})
        # projection that requests it still refuses
        with pytest.raises(ValueError, match="Illegal Parquet type"):
            _refuse_illegal_types(pf, "t.parquet", requested={"tm"})

    def test_nested_roots_match_by_prefix(self, tmp_path):
        from sidecar_spark.sources.cached_parquet import (
            _refuse_illegal_types,
        )

        t = pa.table({
            "s": pa.array([{"tm": 1}],
                          type=pa.struct([("tm", pa.time64("us"))])),
            "ok": [1],
        })
        pf = _pf(tmp_path, t)
        _refuse_illegal_types(pf, "t.parquet", requested={"ok"})
        with pytest.raises(ValueError, match="Illegal Parquet type"):
            _refuse_illegal_types(pf, "t.parquet", requested={"s"})


class TestStructuralLeafNames:
    def test_containers_normalize(self, tmp_path):
        from sidecar_spark.sources.cached_parquet import (
            _leaf_recursion_names,
        )

        t = pa.table({
            "aa": pa.array([[1]], type=pa.list_(pa.int64())),
            "m": pa.array([{"k": 1}],
                          type=pa.map_(pa.string(), pa.int64())),
            "s": pa.array([{"ts": 1}],
                          type=pa.struct([("ts", pa.int64())])),
        })
        m = _leaf_recursion_names(_pf(tmp_path, t))
        assert m is not None
        assert m["aa.list.element"] == "aa"
        assert m["m.key_value.key"] == "m.key"
        assert m["m.key_value.value"] == "m.value"
        assert m["s.ts"] == "s.ts"

    def test_genuine_field_named_list_not_mangled(self, tmp_path):
        """ADVICE r7 #4: struct a.list.element as GENUINE fields must
        keep its segments; the blind replace collapsed it to 'a'."""
        from sidecar_spark.sources.cached_parquet import (
            _leaf_recursion_names,
        )
        from sidecar_spark.sources.rebase import _recursion_names

        t = pa.table({
            "a": pa.array(
                [{"list": {"element": 1}}],
                type=pa.struct([
                    ("list", pa.struct([("element", pa.int64())])),
                ])),
            # a real list alongside, so 'repeated group' IS present
            "aa": pa.array([[1]], type=pa.list_(pa.int64())),
        })
        pf = _pf(tmp_path, t)
        m = _leaf_recursion_names(pf)
        assert m is not None
        assert m["a.list.element"] == "a.list.element"
        assert m["aa.list.element"] == "aa"
        got = _recursion_names(pf, {"a.list.element",
                                    "aa.list.element"})
        assert got == frozenset({"a.list.element", "aa"})

    def test_genuine_key_value_struct_not_mangled(self, tmp_path):
        from sidecar_spark.sources.rebase import _recursion_names

        t = pa.table({
            "m": pa.array(
                [{"key_value": {"key": 1}}],
                type=pa.struct([
                    ("key_value", pa.struct([("key", pa.int64())])),
                ])),
            "real": pa.array([{"k": 1}],
                             type=pa.map_(pa.string(), pa.int64())),
        })
        pf = _pf(tmp_path, t)
        got = _recursion_names(
            pf, {"m.key_value.key", "real.key_value.key"})
        assert got == frozenset({"m.key_value.key", "real.key"})

    def test_int96_nested_rebase_still_matches(self, tmp_path):
        """End-to-end guard: the structural naming serves the same
        int96 match the old surgery did for standard containers —
        an INT96 timestamp inside a struct inside a list rebases."""
        import datetime

        from sidecar_spark.sources.cached_parquet import (
            _int96_leaves,
        )
        from sidecar_spark.sources.rebase import _recursion_names

        ts = datetime.datetime(1500, 1, 1)
        t = pa.table({"aa": pa.array(
            [[{"ts": ts}]],
            type=pa.list_(pa.struct([("ts", pa.timestamp("us"))])))})
        p = os.path.join(str(tmp_path), "i96.parquet")
        pq.write_table(t, p, use_deprecated_int96_timestamps=True)
        pf = pq.ParquetFile(p, coerce_int96_timestamp_unit="us")
        leaves = _int96_leaves(pf)
        assert leaves == {"aa.list.element.ts"}
        assert _recursion_names(pf, leaves) == frozenset({"aa.ts"})


class TestUserSchemaCasePartitionSplit:
    def test_case_sensitive_data_column_survives(self, spark,
                                                 cache_dir, tmp_path):
        """ADVICE r7 #2: under caseSensitive=true a user data column
        'PART_K' next to directory key part_k= is a DISTINCT column —
        it must stay in the declared schema, not vanish. Parity
        asserted against the JVM's own scan of the same layout."""
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        root = os.path.join(str(tmp_path), "tbl")
        os.makedirs(os.path.join(root, "part_k=1"))
        pq.write_table(pa.table({"PART_K": [0, 1, 2]}),
                       os.path.join(root, "part_k=1", "f.parquet"))
        ddl = "PART_K bigint, v int"
        # the fixture writes no 'v' column: conformance null-fills it
        spark.conf.set("spark.sql.caseSensitive", "true")
        try:
            jvm = (spark.read.schema(ddl).parquet(root)
                   .select("PART_K", "v", "part_k"))
            jvm_rows = sorted([tuple(r) for r in jvm.collect()])
            jvm_schema = [(f.name, f.dataType.simpleString())
                          for f in jvm.schema.fields]
            eng = Engine(spark, conf=SidecarConfig.create(
                cache_dir=cache_dir, resolve_mode="executor",
                cache_persistent=False))
            try:
                df = (eng.read_parquet(root, schema=ddl)
                      .select("PART_K", "v", "part_k"))
                assert [(f.name, f.dataType.simpleString())
                        for f in df.schema.fields] == jvm_schema
                assert sorted([tuple(r)
                               for r in df.collect()]) == jvm_rows
            finally:
                eng.close()
        finally:
            spark.conf.set("spark.sql.caseSensitive", "false")


class TestPyarrowInt96WriterGuard:
    """Round-7 verdict wrong-#1 closed: parquet-cpp-written INT96
    with pre-1970 non-midnight times now decodes EXACTLY in executor
    mode (ns-coercion path; the former µs path landed +2^64 ns off).
    Ground truth is the live JVM scan of the same file."""

    def _write(self, tmp_path, values, unit):
        p = os.path.join(str(tmp_path), "i96.parquet")
        pq.write_table(
            pa.table({"ts": pa.array(values,
                                     type=pa.timestamp(unit))}),
            p, use_deprecated_int96_timestamps=True)
        return str(tmp_path)

    def _grid(self):
        import datetime as dt

        return [
            dt.datetime(1969, 12, 31, 23, 59, 59, 123456),
            dt.datetime(1950, 6, 15, 12, 34, 56, 789001),
            dt.datetime(1969, 12, 31, 0, 0, 0),   # midnight pre-1970
            dt.datetime(1970, 1, 1, 0, 0, 0),
            dt.datetime(1970, 1, 2, 3, 4, 5, 678901),
            dt.datetime(1900, 1, 1, 1, 2, 3, 4),
            dt.datetime(1700, 7, 4, 23, 1, 1, 1),
            dt.datetime(2100, 1, 1, 12, 0, 0, 5),
        ]

    def _wide_grid(self):
        """Values OUTSIDE the ns range — representable only at µs
        write precision."""
        import datetime as dt

        return self._grid() + [
            # pre-1677 midnights: exact via the µs side of the dual
            # decode (the ns side wraps upward)
            dt.datetime(1600, 1, 1, 0, 0, 0),
            dt.datetime(1500, 1, 1, 0, 0, 0),
            # far future with an unambiguous merge (ns side lands
            # >= 1970, so the µs reading is provably the truth)
            dt.datetime(2600, 6, 1, 7, 8, 9, 101112),
        ]

    @pytest.mark.parametrize("unit", ["us", "ns"])
    def test_pre1970_int96_exact(self, spark, cache_dir, tmp_path,
                                 unit):
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        root = self._write(
            tmp_path,
            self._grid() if unit == "ns" else self._wide_grid(),
            unit)
        # non-Spark writer + ancient values: CORRECTED reads them as
        # written (proleptic) — the default
        jvm = spark.read.parquet(root)
        want = sorted(r.ts for r in jvm.collect())
        eng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, resolve_mode="executor"))
        try:
            got_df = eng.read_parquet(root)
            assert (got_df.schema.simpleString()
                    == jvm.schema.simpleString())
            got = sorted(r.ts for r in got_df.collect())
            assert got == want
        finally:
            eng.close()

    def test_parquet_mr_far_range_unaffected(self, spark, cache_dir,
                                             tmp_path):
        """A Spark-written (parquet-mr) INT96 file keeps the µs path:
        values OUTSIDE the ns range stay exact."""
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        root = os.path.join(str(tmp_path), "mr")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "INT96")
        try:
            spark.sql(
                "SELECT timestamp'2500-06-15 12:34:56.789' AS ts "
                "UNION ALL SELECT timestamp'1600-03-02 01:02:03.5'"
            ).write.parquet(root)
        finally:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        jvm = spark.read.parquet(root)
        want = sorted(r.ts for r in jvm.collect())
        eng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, resolve_mode="executor"))
        try:
            got = sorted(r.ts for r in eng.read_parquet(root).collect())
            assert got == want
        finally:
            eng.close()

    def test_documented_residuals(self, spark, cache_dir, tmp_path):
        """The two PROVABLY unrecoverable parquet-cpp INT96 corners,
        asserted so any behavior drift surfaces: (a) pre-1677
        NON-midnight — both decodes agree on the same +2^64 ns image
        (undetectable); (b) truth in (2262, 2554) — its wrapped ns
        reading lands pre-1970 and is indistinguishable from a
        genuine pre-1970 value, the historical reading wins.
        Driver mode (JVM reads the mirror bytes) is exact for both."""
        import datetime as dt

        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        vals = [dt.datetime(1600, 1, 1, 12, 0, 0),      # corner (a)
                dt.datetime(2400, 1, 1, 12, 0, 0)]      # corner (b)
        root = self._write(tmp_path, vals, "us")
        jvm = sorted(r.ts for r in spark.read.parquet(root).collect())
        assert jvm == vals  # the JVM is exact
        eng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, resolve_mode="executor"))
        try:
            got = sorted(r.ts for r in eng.read_parquet(root).collect())
            wrap_us = (2**64) // 1000
            # (a) shifted up ~584y, (b) shifted down ~584y
            def us(d):
                return int(d.replace(
                    tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            # sorted: got[0] is the 2400 value wrapped DOWN ~584y,
            # got[1] the 1600 value wrapped UP ~584y (trunc-toward-
            # zero of the ±2^64 ns image in µs = ±wrap_us exactly)
            assert us(got[0]) - us(vals[1]) == -wrap_us
            assert us(got[1]) - us(vals[0]) == wrap_us
        finally:
            eng.close()
