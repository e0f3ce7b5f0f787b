"""Non-UTF8 ``encoding``/``charset`` for csv and json through the
executor-mode composed path — VERDICT r9 #4.

Probed JVM rules (round 10), each asserted against the live scan:

* the csv charset allowlist is {iso-8859-1, us-ascii, utf-16,
  utf-16be, utf-16le, utf-32, utf-8} (probed F0 — anything else is
  the JVM's own INVALID_PARAMETER_VALUE.CHARSET error);
* 8-bit charsets keep byte-level line framing (0x0A/0x0D) and decode
  each line with replace-on-error (US-ASCII high bytes read U+FFFD —
  probed F4); a custom lineSep frames on its ENCODED bytes (a latin-1
  0xF7 separator works — probed F10/F11);
* utf-16le/be compose only with an explicit lineSep (without one the
  JVM splits on raw 0x0A bytes mid-code-unit and produces replacement
  garbage — probed E4/E5, refused) or under multiLine (whole-file
  decode — probed F2); the BOM-detecting utf-16/utf-32 only under
  multiLine (their Java-encoded lineSep embeds a BOM and matches
  nothing — probed F1, refused);
* the BOM stripped at byte 0 is the charset's own: UTF-16LE drops a
  leading FF FE (probed F7) while 8-bit charsets drop the raw UTF-8
  BOM bytes (probed E7);
* header/comment/blank-line rules apply to the DECODED text (probed
  E9/E10/F9);
* json requires an explicit lineSep for any non-UTF8 encoding (the
  JVM's own requirement, probed E11) and denies utf-16/32 without
  multiLine (probed E12); with lineSep, latin-1 and utf-16le/be
  compose (probed F5/F14);
* the plain ``text`` format IGNORES the encoding option (probed E15)
  — no transcode there.
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


SCH = "a string, b string"


def _parity(spark, eng, d, fmt="csv", schema=SCH, **opts):
    reader = spark.read.schema(schema)
    for k, v in opts.items():
        reader = reader.option(k, v)
    jvm = reader.csv(d) if fmt == "csv" else reader.json(d)
    got = eng.read_format(d, fmt, schema=schema, **opts)
    assert got.schema.simpleString() == jvm.schema.simpleString()
    assert (sorted(map(str, got.collect()))
            == sorted(map(str, jvm.collect())))
    return got


def _is_composed(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "sidecar_cached_text" in plan


class TestCsvEncoding:
    def test_latin1_cells(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        lat = "ISO-8859-1"
        cells = [
            ("E1", b'caf\xe9,\xfcber\nx,y\n', {"encoding": lat}),
            ("E3", b'caf\xe9,x\n', {"charset": lat}),
            ("E7", b'\xef\xbb\xbfa,b\nc,d\n', {"encoding": lat}),
            ("E7b", b'\xef\xbb\xbfa,b\nc,d\n', {"encoding": "UTF-8"}),
            ("E10", b'a,b\n\xa0\nc,d\n', {"encoding": lat}),
            ("F4", b'caf\xe9,x\ny,z\n', {"encoding": "US-ASCII"}),
            ("F10", b'caf\xe9,x|y,z|',
             {"encoding": lat, "lineSep": "|"}),
            ("F11", b'a,b\xf7c,d\xf7',
             {"encoding": lat, "lineSep": "÷"}),
            ("E13", b'caf\xe9,"l1\nl2"\nx,y\n',
             {"encoding": lat, "multiLine": "true"}),
            ("F13", b'x,"caf\xe9\nl2"\ny,z\n',
             {"encoding": lat, "multiLine": "true"}),
        ]
        for name, data, opts in cells:
            d = str(tmp_path / name)
            _w(d, "f.csv", data)
            got = _parity(spark, eng, d, **opts)
            assert _is_composed(got), name

    def test_latin1_header_comment_gz(self, spark, cache_dir,
                                      tmp_path):
        eng = _engine(spark, cache_dir)
        lat = "ISO-8859-1"
        d = str(tmp_path / "e9")
        _w(d, "f.csv", b'\xa7skip\nh1,h2\ncaf\xe9,v\n')
        got = _parity(spark, eng, d, encoding=lat, header="true",
                      comment="§")
        assert _is_composed(got)
        d2 = str(tmp_path / "e8")
        _w(d2, "f.csv.gz", gzip.compress(b'caf\xe9,x\ny,z\n'))
        got = _parity(spark, eng, d2, encoding=lat)
        assert _is_composed(got)

    def test_latin1_default_framing_splits(self, spark, cache_dir,
                                           tmp_path):
        # default (no lineSep) framing stays byte-level and the file
        # still splits; each line decodes independently
        d = str(tmp_path / "split")
        rows = b"".join(b'caf\xe9%d,v\xfc%d\n' % (i, i)
                        for i in range(20000))
        _w(d, "big.csv", rows)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        try:
            eng = _engine(spark, cache_dir)
            got = _parity(spark, eng, d, encoding="ISO-8859-1")
            assert _is_composed(got)
            assert got.rdd.getNumPartitions() > 1
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    def test_utf16_cells(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        cells = [
            ("F9le", 'a,b\nc,déf\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE", "lineSep": "\n"}),
            ("F8be", 'a,b\nc,d\n'.encode("utf-16-be"),
             {"encoding": "UTF-16BE", "lineSep": "\n"}),
            ("F7bom", b'\xff\xfe' + 'a,b\nc,d\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE", "lineSep": "\n"}),
            ("F2ml", 'a,"l1\nl2"\nc,d\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE", "multiLine": "true"}),
            ("F3ml", 'a,"l1\nl2"\nc,d\n'.encode("utf-16"),
             {"encoding": "UTF-16", "multiLine": "true"}),
            # multiLine BOM rule (probed ML1-ML3): a DECODED U+FEFF
            # strips, raw UTF-8 BOM bytes under a non-UTF8 charset
            # do NOT (they read as literal 'ï»¿' characters)
            ("ML1", b"\xff\xfe" + 'a,"x\ny"\nc,d\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE", "multiLine": "true"}),
            ("ML2", b"\xef\xbb\xbf" + b'a,"x\ny"\nc,d\n',
             {"encoding": "ISO-8859-1", "multiLine": "true"}),
            ("ML3", 'a,"x\ny"\nc,d\n'.encode("utf-16"),
             {"encoding": "UTF-16", "multiLine": "true"}),
        ]
        for name, data, opts in cells:
            d = str(tmp_path / name)
            _w(d, "f.csv", data)
            got = _parity(spark, eng, d, **opts)
            assert _is_composed(got), name

    def test_utf16_header_comment_blank(self, spark, cache_dir,
                                        tmp_path):
        eng = _engine(spark, cache_dir)
        d = str(tmp_path / "f9")
        _w(d, "f.csv",
           '#skip\nh1,h2\n \ncafé,v\n'.encode("utf-16-le"))
        got = _parity(spark, eng, d, encoding="UTF-16LE",
                      lineSep="\n", header="true", comment="#")
        assert _is_composed(got)

    def test_raw_routes_and_jvm_errors(self, spark, cache_dir,
                                       tmp_path):
        eng = _engine(spark, cache_dir)
        # utf-16 variants without the composable shape: raw, parity
        raw_cells = [
            ("E4", 'a,b\nc,d\n'.encode("utf-16"),
             {"encoding": "UTF-16"}),
            ("E5", 'a,b\nc,d\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE"}),
            ("F1", 'a,b\nc,d\n'.encode("utf-16"),
             {"encoding": "UTF-16", "lineSep": "\n"}),
        ]
        for name, data, opts in raw_cells:
            d = str(tmp_path / name)
            _w(d, "f.csv", data)
            got = _parity(spark, eng, d, **opts)
            assert not _is_composed(got), name
        # outside the allowlist: the JVM's own charset error
        d = str(tmp_path / "bad")
        _w(d, "f.csv", b'a,b\n')
        got = eng.read_format(d, "csv", schema=SCH,
                              encoding="KOI8-R")
        assert not _is_composed(got)
        with pytest.raises(Exception, match="CHARSET|charset"):
            got.collect()

    def test_invalid_utf8_default_parity(self, spark, cache_dir,
                                         tmp_path):
        # the composed path must read invalid UTF-8 under the DEFAULT
        # encoding exactly like the JVM csv reader (probed E16: the
        # JVM's String decode replaces with U+FFFD)
        d = str(tmp_path / "e16")
        _w(d, "f.csv", b'caf\xe9,x\n')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)


class TestJsonEncoding:
    def test_json_cells(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        sch = "a string, b long"
        cells = [
            ("F5", b'{"a": "caf\xe9", "b": 1}\n{"a": "x", "b": 2}\n',
             {"encoding": "ISO-8859-1", "lineSep": "\n"}),
            ("F6", b'{"a": "x", "b": 1}\n', {"encoding": "UTF-8"}),
            ("F14", '{"a": "xé", "b": 1}\n'.encode("utf-16-le"),
             {"encoding": "UTF-16LE", "lineSep": "\n"}),
        ]
        for name, data, opts in cells:
            d = str(tmp_path / name)
            _w(d, "f.json", data)
            got = _parity(spark, eng, d, fmt="json", schema=sch,
                          **opts)
            assert _is_composed(got), name

    def test_json_raw_routes(self, spark, cache_dir, tmp_path):
        # non-UTF8 without lineSep: the JVM's own requirement error
        eng = _engine(spark, cache_dir)
        sch = "a string, b long"
        d = str(tmp_path / "e11")
        _w(d, "f.json", b'{"a": "caf\xe9", "b": 1}\n')
        got = eng.read_format(d, "json", schema=sch,
                              encoding="ISO-8859-1")
        assert not _is_composed(got)
        with pytest.raises(Exception, match="lineSep"):
            got.collect()
