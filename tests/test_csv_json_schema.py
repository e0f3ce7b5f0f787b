"""Executor-mode cached csv/json with EXPLICIT user schema (round-7
verdict #3): cached-text framing + the JVM's own from_csv/from_json
parsing — the same UnivocityParser/JacksonParser the file sources
use, so the value-parse matrix is parity-by-construction. The cells
below assert the remaining surface (record framing, malformed-row
policy, corrupt column, blank lines, BOM) against the live JVM scan
of the same fixtures.
"""

import os

import pytest


def _w(root, rel, data: bytes):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(data)
    return p


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


CSV_GAUNTLET = (
    b'\xef\xbb\xbf1,"a,b",2.5,2021-03-04,2021-03-04 05:06:07\n'
    b'2,"he said ""hi""",3.5,2021-01-01,2021-01-01 00:00:00\n'
    b'3,plain,notanumber,2021-01-01,2021-01-01 00:00:00\n'
    b'4,short\n'
    b'5,x,1.0,2021-01-01,2021-01-01 00:00:00,EXTRA,MORE\n'
    b'\n'
    b'   \n'
    b'\t\n'
    b'6,"multi\nline",7.5,2021-01-01,2021-01-01 00:00:00\n'
    b' 7 , spaced ,8.5,2021-01-01,2021-01-01 00:00:00\n')

CSV_DDL = "i int, s string, x double, dt date, ts timestamp"


class TestCachedCsvUserSchema:
    def test_gauntlet_parity(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "c/a.csv", CSV_GAUNTLET)
        root = os.path.join(d, "c")
        eng = _engine(spark, cache_dir)
        try:
            got = eng.read_format(root, "csv", schema=CSV_DDL)
            # the compose path really is cached (text source in plan)
            assert ("sidecar_cached_text"
                    in got._jdf.queryExecution().toString())
            _parity(spark.read.schema(CSV_DDL).csv(root), got)
        finally:
            eng.close()

    def test_corrupt_record_column(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "c/a.csv", CSV_GAUNTLET)
        root = os.path.join(d, "c")
        ddl = CSV_DDL + ", _corrupt_record string"
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.schema(ddl).csv(root),
                    eng.read_format(root, "csv", schema=ddl))
        finally:
            eng.close()

    def test_corrupt_record_session_conf(self, spark, cache_dir,
                                         tmp_path):
        d = str(tmp_path)
        _w(d, "c/a.csv", b"1,x\nbad,line,extra\n")
        root = os.path.join(d, "c")
        ddl = "i int, s string, oops string"
        spark.conf.set("spark.sql.columnNameOfCorruptRecord", "oops")
        try:
            eng = _engine(spark, cache_dir)
            try:
                _parity(spark.read.schema(ddl).csv(root),
                        eng.read_format(root, "csv", schema=ddl))
            finally:
                eng.close()
        finally:
            spark.conf.unset("spark.sql.columnNameOfCorruptRecord")

    def test_sep_quote_null_options(self, spark, cache_dir,
                                    tmp_path):
        d = str(tmp_path)
        _w(d, "c/a.csv", b"1|'a|b'|NULL\n2|plain|ok\n")
        root = os.path.join(d, "c")
        ddl = "i int, s string, t string"
        opts = {"sep": "|", "quote": "'", "nullValue": "NULL"}
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.schema(ddl).options(**opts).csv(root),
                    eng.read_format(root, "csv", schema=ddl, **opts))
        finally:
            eng.close()

    def test_hive_partitions_appended(self, spark, cache_dir,
                                      tmp_path):
        d = str(tmp_path)
        _w(d, "c/k=1/a.csv", b"1,x\n")
        _w(d, "c/k=2/b.csv", b"2,y\n")
        root = os.path.join(d, "c")
        ddl = "i int, s string"
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.schema(ddl).csv(root),
                    eng.read_format(root, "csv", schema=ddl))
        finally:
            eng.close()

    def test_record_level_options_go_raw(self, spark, cache_dir,
                                         tmp_path):
        d = str(tmp_path)
        _w(d, "c/a.csv", b"h1,h2\n1,x\n")
        root = os.path.join(d, "c")
        ddl = "i int, s string"
        eng = _engine(spark, cache_dir)
        try:
            # round 9 moved header/comment/lineSep, and round 10
            # multiLine (tests/test_csv_multiline.py), into the
            # composed path — the remaining record-level options
            # still route raw
            for opts in ({"mode": "DROPMALFORMED"},
                         {"encoding": "UTF-16"}):
                got = eng.read_format(root, "csv", schema=ddl,
                                      **opts)
                plan = got._jdf.queryExecution().toString()
                assert "sidecar_cached_text" not in plan, opts
                jvm = (spark.read.schema(ddl).options(**opts)
                       .csv(root))
                _parity(jvm, got)
            for opts in ({"header": "true"}, {"comment": "#"},
                         {"multiLine": "true"}):
                got = eng.read_format(root, "csv", schema=ddl,
                                      **opts)
                plan = got._jdf.queryExecution().toString()
                assert "sidecar_cached_text" in plan, opts
                jvm = (spark.read.schema(ddl).options(**opts)
                       .csv(root))
                _parity(jvm, got)
        finally:
            eng.close()

    def test_schema_naming_partition_key_goes_raw(self, spark,
                                                  cache_dir,
                                                  tmp_path):
        d = str(tmp_path)
        _w(d, "c/k=1/a.csv", b"1,x\n")
        root = os.path.join(d, "c")
        ddl = "i int, k int"
        eng = _engine(spark, cache_dir)
        try:
            got = eng.read_format(root, "csv", schema=ddl)
            plan = got._jdf.queryExecution().toString()
            assert "sidecar_cached_text" not in plan
            _parity(spark.read.schema(ddl).csv(root), got)
        finally:
            eng.close()


JSON_GAUNTLET = (
    b'{"i":1,"s":"a","arr":[1,2],"o":{"k":"v"},'
    b'"ts":"2021-03-04T05:06:07Z"}\n'
    b'\n'
    b'   \n'
    b'{"i":2,"s":"b"}\n'
    b'{bad json}\n'
    b'{"i":3}{"i":4}\n'
    b'{"i":5,"extra":9}\n')

JSON_DDL = ("i int, s string, arr array<int>, o struct<k:string>, "
            "ts timestamp")


class TestCachedJsonUserSchema:
    def test_gauntlet_parity(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "j/a.json", JSON_GAUNTLET)
        root = os.path.join(d, "j")
        eng = _engine(spark, cache_dir)
        try:
            got = eng.read_format(root, "json", schema=JSON_DDL)
            assert ("sidecar_cached_text"
                    in got._jdf.queryExecution().toString())
            _parity(spark.read.schema(JSON_DDL).json(root), got)
        finally:
            eng.close()

    def test_corrupt_record_column(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "j/a.json", JSON_GAUNTLET)
        root = os.path.join(d, "j")
        ddl = JSON_DDL + ", _corrupt_record string"
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.schema(ddl).json(root),
                    eng.read_format(root, "json", schema=ddl))
        finally:
            eng.close()

    def test_partitions_and_projection(self, spark, cache_dir,
                                       tmp_path):
        d = str(tmp_path)
        _w(d, "j/k=a/a.json", b'{"i":1}\n')
        _w(d, "j/k=b/b.json", b'{"i":2}\n')
        root = os.path.join(d, "j")
        ddl = "i int"
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark.read.schema(ddl).json(root),
                    eng.read_format(root, "json", schema=ddl))
            _parity(spark.read.schema(ddl).json(root).select("k"),
                    eng.read_format(root, "json", schema=ddl,
                                    columns=["k"]))
        finally:
            eng.close()

    def test_multiline_composes(self, spark, cache_dir, tmp_path):
        # round 10: json multiLine now composes through the
        # wholetext + array-schema from_json path
        # (tests/test_json_multiline.py has the full probed matrix)
        d = str(tmp_path)
        _w(d, "j/a.json", b'[{"i":1},\n{"i":2}]\n')
        root = os.path.join(d, "j")
        eng = _engine(spark, cache_dir)
        try:
            got = eng.read_format(root, "json", schema="i int",
                                  multiLine="true")
            plan = got._jdf.queryExecution().toString()
            assert "sidecar_cached_text" in plan
            _parity(spark.read.schema("i int")
                    .option("multiLine", "true").json(root), got)
        finally:
            eng.close()

    def test_warm_read_serves_mirror(self, spark, cache_dir,
                                     tmp_path):
        """The whole point: the csv/json bytes live in the node
        mirror after the first scan."""
        import glob as g

        d = str(tmp_path)
        payload = b'{"i":41}\n{"i":42}\n'
        _w(d, "j/a.json", payload)
        root = os.path.join(d, "j")
        eng = _engine(spark, cache_dir)
        try:
            df = eng.read_format(root, "json", schema="i int")
            assert sorted(r.i for r in df.collect()) == [41, 42]
            copies = [f for f in g.glob(cache_dir + "/**/*",
                                        recursive=True)
                      if os.path.isfile(f)
                      and open(f, "rb").read() == payload]
            assert copies
        finally:
            eng.close()
