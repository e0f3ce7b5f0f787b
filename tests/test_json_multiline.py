"""json ``multiLine=true`` through the executor-mode composed path —
round 10 (closes the last raw-routed record-level option).

Probed JVM rules, each asserted against the live scan:

* each FILE is one JSON document: a top-level array yields one row
  per element (J2), an object one row (J1 — from_json's array schema
  wraps it, probed X1), trailing content after the first value is
  ignored (J3/J7/J21);
* a malformed document — unparseable (J4), top-level scalar (J10),
  scalar or nested elements (J11/J16), literal ``null`` (J20), or an
  array containing an explicit null element (J15) — collapses to
  exactly ONE all-null row;
* empty and whitespace-only files yield nothing (J5/J6); files never
  split (J13); gzip decompresses first (J8);
* charset: WITHOUT an encoding option Jackson auto-detects from
  BOMs/null-byte patterns and consumes the BOM (K1-K7; invalid utf-8
  under the detected utf-8 rides RAW into Jackson — K6); WITH a
  declared encoding the BOM-variant charsets consume a BOM while the
  fixed-endian ones keep it, breaking the parse to an all-null row
  (K8);
* raw routes: a corrupt-record column in play (array-mode from_json
  cannot reproduce the JVM's partial-corruption fills), explicit
  lineSep, non-PERMISSIVE modes (J17/J18 route raw already).
"""

import gzip
import os

import pytest


def _engine(spark, cache_dir):
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    return Engine(spark, conf=SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor"))


def _w(d, name, data: bytes):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "wb") as f:
        f.write(data)


SCH = "a long, b string"


def _parity(spark, eng, d, schema=SCH, **opts):
    reader = spark.read.schema(schema).option("multiLine", "true")
    for k, v in opts.items():
        reader = reader.option(k, v)
    jvm = reader.json(d)
    got = eng.read_format(d, "json", schema=schema,
                          multiLine="true", **opts)
    assert got.schema.simpleString() == jvm.schema.simpleString()
    assert (sorted(map(str, got.collect()))
            == sorted(map(str, jvm.collect())))
    return got


def _is_composed(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "sidecar_cached_text" in plan


class TestJsonMultiline:
    def test_document_shapes(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "docs")
        _w(d, "J1.json", b'{\n "a": 1,\n "b": "x"\n}\n')
        _w(d, "J2.json",
           b'[\n {"a": 2, "b": "y"},\n {"a": 3, "b": "z"}\n]\n')
        _w(d, "J3.json", b'{"a": 4, "b": "p"}\n{"a": 5, "b": "q"}\n')
        _w(d, "J7.json", b'[{"a": 6, "b": "r"}] {"a": 7}\n')
        _w(d, "J12.json", b'{"b": "only", "zz": 9}')
        _w(d, "J19.json", b'[ ]')
        _w(d, "J21.json", b'[{"a": 8, "b": "s"}][{"a": 9}]')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)
        assert got.count() == 7

    def test_malformed_documents(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "bad")
        _w(d, "J4.json", b'{"a": 1, "b": ')
        _w(d, "J10.json", b'"hello"')
        _w(d, "J11.json", b'[1, 2, 3]')
        _w(d, "J15.json",
           b'[{"a": 1, "b": "x"}, null, {"a": 2, "b": "y"}]')
        _w(d, "J16.json", b'[[{"a": 1}]]')
        _w(d, "J20.json", b'null')
        _w(d, "J5.json", b'')
        _w(d, "J6.json", b'  \n  ')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)
        assert got.count() == 6  # one all-null row per bad doc

    def test_charsets_auto_and_declared(self, spark, cache_dir,
                                        tmp_path):
        eng = _engine(spark, cache_dir)
        doc = '{"a": 1, "b": "é"}'
        auto = str(tmp_path / "auto")
        _w(auto, "k1.json",
           "﻿".encode("utf-16-be") + doc.encode("utf-16-be"))
        _w(auto, "k2.json",
           "﻿".encode("utf-16-le") + doc.encode("utf-16-le"))
        _w(auto, "k3.json", doc.encode("utf-16-le"))
        _w(auto, "k4.json", doc.encode("utf-16-be"))
        _w(auto, "k5.json", doc.encode("utf-32-le"))
        _w(auto, "k7.json", b'\xef\xbb\xbf' + doc.encode())
        got = _parity(spark, eng, auto)
        assert _is_composed(got)
        # K6 — KNOWN DIVERGENCE (PARITY.md round-10): invalid utf-8
        # under auto-detected utf-8. The JVM's byte-level Jackson
        # throws mid-string and nulls the in-flight field; the
        # composed path parses the replacement-char text. Pin OUR
        # behavior so a regression is loud.
        k6 = str(tmp_path / "k6")
        _w(k6, "f.json", b'{"a": 1, "b": "caf\xe9"}')
        got = eng.read_format(k6, "json", schema=SCH,
                              multiLine="true")
        assert _is_composed(got)
        [r] = got.collect()
        assert r.a == 1 and r.b == "caf�"
        # declared encoding: BOM-variant consumes, fixed-endian keeps
        d1 = str(tmp_path / "dec1")
        _w(d1, "f.json", doc.encode("utf-16-le"))
        got = _parity(spark, eng, d1, encoding="UTF-16LE")
        assert _is_composed(got)
        d2 = str(tmp_path / "dec2")
        _w(d2, "f.json", b"\xff\xfe" + doc.encode("utf-16-le"))
        got = _parity(spark, eng, d2, encoding="UTF-16LE")
        assert _is_composed(got)  # K8: all-null row, matched
        d3 = str(tmp_path / "dec3")
        _w(d3, "f.json", b'{"a": 1, "b": "caf\xe9"}')
        got = _parity(spark, eng, d3, encoding="ISO-8859-1")
        assert _is_composed(got)

    def test_gzip_never_split_and_partitions(self, spark, cache_dir,
                                             tmp_path):
        d = str(tmp_path / "gz")
        _w(d, "f.json.gz", gzip.compress(
            b'[{"a": 1, "b": "x"},{"a": 2, "b": "y"}]'))
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)
        big = str(tmp_path / "big")
        body = (b"[" + b",".join(
            b'{"a": %d, "b": "v%d"}' % (i, i)
            for i in range(50000)) + b"]")
        _w(big, "f.json", body)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        try:
            got = _parity(spark, eng, big)
            assert _is_composed(got)
            assert got.rdd.getNumPartitions() == 1
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    def test_raw_routes(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        d = str(tmp_path / "raw")
        _w(d, "f.json", b'{"a": 1, "b": ')
        # corrupt-record column named in the schema: raw
        got = _parity(spark, eng, d,
                      schema="a long, b string, _bad string",
                      columnNameOfCorruptRecord="_bad")
        assert not _is_composed(got)
        # schema naming the session's default corrupt column: raw
        got = _parity(spark, eng, d,
                      schema="a long, b string, "
                             "_corrupt_record string")
        assert not _is_composed(got)
        # non-PERMISSIVE mode: raw
        d2 = str(tmp_path / "ok")
        _w(d2, "f.json", b'{"a": 1, "b": "x"}')
        got = _parity(spark, eng, d2, mode="DROPMALFORMED")
        assert not _is_composed(got)
