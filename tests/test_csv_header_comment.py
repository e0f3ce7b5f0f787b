"""csv ``header`` / ``comment`` / ``lineSep`` (and json ``lineSep``)
through the executor-mode composed path — VERDICT r8 #4.

Probed JVM rules (round 9), each asserted against the live scan:

* the header is the first line of each FILE whose Java trim is
  non-empty and that does not START with the comment char (raw
  startswith — leading whitespace disqualifies a comment); it is
  skipped whatever its content (numbers, quoted commas), and a header
  opening a quote is still only its first PHYSICAL line;
* under splits only the byte-0 split skips (a 43-split file drops
  exactly one line); the skip happens after the BOM strip and any
  codec decompression; a header-only file yields no rows;
* enforceSchema=false + header validates names → routes raw;
* comment is one char max (longer → raw, the JVM raises its own
  error), empty = disabled, applies to data lines everywhere;
* lineSep (csv AND json) replaces the default \\n/\\r\\n/\\r framing
  entirely: \\n inside a record stays in the value, the blank-record
  skip follows the custom framing, multi-char separators work, and a
  quoted separator char still splits the record.
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


SCH = "a int, b string"


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
    """The composed path scans through the Python DataSource — its
    plan mentions the cached text source; a raw fallback plans the
    JVM FileScan csv."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "sidecar_cached_text" in plan


class TestCsvHeader:
    def test_header_per_file(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "h")
        _w(d, "f1.csv", b"a,b\n1,x\n2,y\n")
        _w(d, "f2.csv", b"a,b\n3,z\n")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true")
        assert _is_composed(got)
        assert got.count() == 3

    def test_header_skipped_whatever_content(self, spark, cache_dir,
                                             tmp_path):
        # numbers, quoted commas: always the first physical line
        d = str(tmp_path / "h2")
        _w(d, "f.csv", b"9,z\n1,x\n")
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, d, header="true")
        d2 = str(tmp_path / "h3")
        _w(d2, "f.csv", b'"a,1",b\n1,x\n')
        _parity(spark, eng, d2, header="true")

    def test_header_after_blank_and_bom(self, spark, cache_dir,
                                        tmp_path):
        d = str(tmp_path / "h4")
        _w(d, "f.csv", b"\n  \na,b\n1,x\n")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true")
        assert [tuple(r) for r in got.collect()] == [(1, "x")]
        d2 = str(tmp_path / "h5")
        _w(d2, "f.csv", b"\xef\xbb\xbfa,b\n1,x\n")
        _parity(spark, eng, d2, header="true")

    def test_header_quoted_newline_first_physical_line(
            self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "h6")
        _w(d, "f.csv", b'"a\nz",b\n1,x\n')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true")
        assert got.count() == 2  # z",b becomes a (None,'b') data row

    def test_header_only_and_empty_files(self, spark, cache_dir,
                                         tmp_path):
        d = str(tmp_path / "h7")
        _w(d, "only.csv", b"a,b\n")
        _w(d, "empty.csv", b"")
        _w(d, "n.csv", b"a,b\n5,q\n")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true")
        assert [tuple(r) for r in got.collect()] == [(5, "q")]

    def test_header_under_splits_once(self, spark, cache_dir,
                                      tmp_path):
        d = str(tmp_path / "h8")
        buf = [b"a,b\n"]
        for i in range(50000):
            buf.append(b"%d,v%d\n" % (i, i))
        _w(d, "big.csv", b"".join(buf))
        eng = _engine(spark, cache_dir)
        got = eng.read_format(d, "csv", schema=SCH, header="true",
                              split_bytes=65536)
        assert got.rdd.getNumPartitions() > 1
        assert got.count() == 50000
        assert got.agg({"a": "min"}).collect()[0][0] == 0

    def test_header_gz(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "h9")
        _w(d, "f.csv.gz", gzip.compress(b"a,b\n1,x\n2,y\n"))
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true")
        assert _is_composed(got)

    def test_enforce_schema_false_routes_raw(self, spark, cache_dir,
                                             tmp_path):
        d = str(tmp_path / "h10")
        _w(d, "f.csv", b"a,b\n1,x\n")
        eng = _engine(spark, cache_dir)
        got = eng.read_format(d, "csv", schema=SCH, header="true",
                              enforceSchema="false")
        assert not _is_composed(got)  # raw fallback
        assert [tuple(r) for r in got.collect()] == [(1, "x")]
        # explicit true (the default) stays composed
        got2 = eng.read_format(d, "csv", schema=SCH, header="true",
                               enforceSchema="true")
        assert _is_composed(got2)


class TestCsvComment:
    def test_comment_lines_dropped_everywhere(self, spark, cache_dir,
                                              tmp_path):
        d = str(tmp_path / "c1")
        _w(d, "f.csv", b"#top\na,b\n#mid\n1,x\n#tail")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, header="true", comment="#")
        assert [tuple(r) for r in got.collect()] == [(1, "x")]

    def test_comment_raw_startswith_only(self, spark, cache_dir,
                                         tmp_path):
        # leading whitespace, quoted first field, mid-line char:
        # all DATA (probed)
        d = str(tmp_path / "c2")
        _w(d, "f.csv", b"  #x,y\n" + b'"#q",x\n' + b"a#b,x\n1,ok\n")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, comment="#")
        assert got.count() == 4

    def test_unicode_comment_char(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "c3")
        _w(d, "f.csv", "§skip\n1,x\n".encode())
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, comment="§")
        assert [tuple(r) for r in got.collect()] == [(1, "x")]

    def test_empty_comment_disabled(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "c4")
        _w(d, "f.csv", b"#1,x\n2,y\n")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, comment="")
        assert got.count() == 2  # '#1' is data

    def test_multichar_comment_routes_raw(self, spark, cache_dir,
                                          tmp_path):
        d = str(tmp_path / "c5")
        _w(d, "f.csv", b"1,x\n")
        eng = _engine(spark, cache_dir)
        got = eng.read_format(d, "csv", schema=SCH, comment="//")
        assert not _is_composed(got)
        with pytest.raises(Exception, match="(?i)one char"):
            got.collect()  # the JVM's own error


class TestLineSep:
    def test_csv_linesep_framing(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "l1")
        _w(d, "f.csv", b"1,x;2,y;")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, lineSep=";")
        assert _is_composed(got)
        assert got.count() == 2  # trailing sep adds no empty record

    def test_csv_linesep_newline_in_value(self, spark, cache_dir,
                                          tmp_path):
        d = str(tmp_path / "l2")
        _w(d, "f.csv", b"1,x\n2,y;3,z")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, lineSep=";")
        vals = sorted(r.b for r in got.collect())
        assert "x\n2" in vals  # \n stays inside the record

    def test_csv_linesep_blank_records_and_multichar(
            self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "l3")
        _w(d, "f.csv", b"1,x;; ;2,y")
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, lineSep=";")
        assert got.count() == 2  # empty + whitespace records skipped
        d2 = str(tmp_path / "l4")
        _w(d2, "f.csv", b"1,x;;2,y")
        got2 = _parity(spark, eng, d2, lineSep=";;")
        assert got2.count() == 2

    def test_csv_linesep_header_comment_gz(self, spark, cache_dir,
                                           tmp_path):
        d = str(tmp_path / "l5")
        _w(d, "f.csv.gz", gzip.compress(b"#c;a,b;1,x;2,y"))
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, lineSep=";", header="true",
                      comment="#")
        assert [tuple(r) for r in sorted(got.collect())] == [
            (1, "x"), (2, "y")]

    def test_json_linesep(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "l6")
        _w(d, "a.json", b'{"a":1,"b":"x"};;  ;{"a":2,"b":"y"}')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, fmt="json", lineSep=";")
        assert _is_composed(got)
        assert got.count() == 2

    def test_empty_linesep_routes_raw(self, spark, cache_dir,
                                      tmp_path):
        d = str(tmp_path / "l7")
        _w(d, "f.csv", b"1,x\n")
        eng = _engine(spark, cache_dir)
        got = eng.read_format(d, "csv", schema=SCH, lineSep="")
        assert not _is_composed(got)
        with pytest.raises(Exception):
            got.collect()  # the JVM's own empty-lineSep error
