"""csv ``multiLine=true`` through the executor-mode composed path —
VERDICT r9 #3.

Probed JVM rules (round 10), each asserted against the live scan:

* the record separator is AUTO-DETECTED from the first ``\\r``/``\\n``
  byte in the raw stream — even one inside a quoted field (d1/e23);
  records split at it OUTSIDE quoted spans only, and its occurrences
  INSIDE quoted spans are normalized to ``\\n`` (n1/n3 — ``from_csv``
  on the raw bytes would keep ``\\r\\n``);
* a quoted span opens only at FIELD START (after whitespace only
  under ignoreLeadingWhiteSpace=true — G2/G3); with escape != quote a
  bare quote ALWAYS closes the span (a doubled quote is close-then-
  garbage: ``"x""y`` ends its record at the next newline and keeps
  its quotes raw — g3/p4/e13); with escape == quote the doubled quote
  escapes and the span continues across newlines (m4/m5);
* after a close, a delimiter exits garbage into a NEW field whose
  quote can swallow newlines (G1/G7); a separator ends the record;
  an unclosed span runs to EOF as one record (p11);
* only length-0 records drop (whitespace-only records are rows —
  p10/h4); comment matches the framed record's first bytes (p6b);
  the header is the first surviving RECORD, quoted newlines included
  (p5/h1-h4);
* multiLine files are never split (p13: one partition whatever
  maxPartitionBytes); BOM strips before framing (p9/e17); codec
  decompression applies first (p8);
* raw routes: explicit lineSep with multiLine (the JVM keeps the
  separator inside values — m3/p12), json multiLine, explicit
  charToEscapeQuoteEscaping with escape == quote, markers colliding
  with the delimiter.
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


SCH = "a string, b string, c string"


def _parity(spark, eng, d, fmt="csv", schema=SCH, **opts):
    reader = spark.read.schema(schema).option("multiLine", "true")
    for k, v in opts.items():
        reader = reader.option(k, v)
    jvm = reader.csv(d) if fmt == "csv" else reader.json(d)
    got = eng.read_format(d, fmt, schema=schema, multiLine="true",
                          **opts)
    assert got.schema.simpleString() == jvm.schema.simpleString()
    assert (sorted(map(str, got.collect()))
            == sorted(map(str, jvm.collect())))
    return got


def _is_composed(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "sidecar_cached_text" in plan


class TestMultilineFraming:
    def test_default_framing_cells(self, spark, cache_dir, tmp_path):
        # every default-option boundary cell in one directory —
        # framing is per file, parity covers the union
        d = str(tmp_path / "ml1")
        _w(d, "p2.csv", b'x,"l1\nl2"\ny,z\n')            # quoted \n
        _w(d, "p3.csv", b'a,b"c\nd,e\n')                 # mid-field quote literal
        _w(d, "p3b.csv", b'a,"b"x\nd,e\n')               # garbage after close
        _w(d, "p4.csv", b'a,"x\\"y"\nb,"p""q"\n')        # escape works, "" reverts raw
        _w(d, "p11.csv", b'a,"unclosed\nmore,stuff\n')   # unclosed -> EOF
        _w(d, "e10.csv", b'a,b')                         # no trailing newline
        _w(d, "m1.csv", b'')                             # empty file
        _w(d, "m2.csv", b'\n\n\n')                       # only empties
        _w(d, "p10.csv", b'a,b\n\n   \nc,d\n')           # ws-only record kept
        _w(d, "p10b.csv", b'a,b\n""\nc,d\n')             # quoted-empty record
        _w(d, "g3.csv", b'a,"x""y\nz"\nw,v\n')           # close-then-garbage ends record
        _w(d, "g5.csv", b'a,"p"x"q\nr",s\nz,w\n')        # quote in garbage inert
        _w(d, "e13.csv", b'a,"x""\ny"\nz,w\n')
        _w(d, "e4.csv", b'a,"x\\\\"\ny,z\n')             # escaped escape then close
        _w(d, "g9.csv", b'a,x\\\ny,z\n')                 # unquoted backslash-newline splits
        _w(d, "g10.csv", b'a,"x\\\ny"\nz,w\n')           # escape-newline stays quoted
        _w(d, "G1.csv", b'a,"b"x,"c\nd",e\nz,w,q\n')     # delim exits garbage, requote
        _w(d, "G2.csv", b'a, "x\ny",c\nz,w,q\n')         # space blocks quote (ilw off)
        _w(d, "G4.csv", b'a,"x\ny" ,c\nz,w,q\n')         # close-space-delim
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)

    def test_separator_detection_cells(self, spark, cache_dir,
                                       tmp_path):
        d = str(tmp_path / "ml2")
        _w(d, "p7.csv", b'a,b\r\nc,"d\re"\r\nf,g\r')     # crlf; bare \r content
        _w(d, "p7b.csv", b'a,b\rc,d\r')                  # cr-only files
        _w(d, "d1.csv", b'"a\r\nb",c\nd,e\n')            # detection INSIDE quotes
        _w(d, "d3.csv", b'a,b\r\nc,d\re,f\r\n')
        _w(d, "e1.csv", b'a,b\r\nc,d\ne,f\r\n')          # bare \n content under crlf
        _w(d, "e2.csv", b'a,b\nc,d\r\ne,f\n')            # bare \r content under lf
        _w(d, "e22.csv", b'a,b\rc,d\ne,f\r')
        _w(d, "e23.csv", b'"a\nb",c\r\nd,e\r\n')
        _w(d, "n1.csv", b'"a\rb",c\rx,y\r')              # \r -> \n normalized in quotes
        _w(d, "n3.csv", b'"a\r\nb",c\r\nx,y\r\n')        # \r\n -> \n normalized
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)

    def test_eof_tail_peel_cells(self, spark, cache_dir, tmp_path):
        # univocity's EOF-tail peel: chunks after the last
        # delimiter-bearing chunk detach as their own records;
        # S-terminated records never peel (probed T/U/W series)
        d = str(tmp_path / "tail")
        _w(d, "T3.csv", b'a,b\nc,d\r')          # \n sep: trailing \r kept
        _w(d, "T4.csv", b'a,b\rc,d\n')          # \r sep: trailing \n peels
        _w(d, "T6.csv", b'a,b\r\nc,d\n\n')
        _w(d, "T7.csv", b'a,b\r\nc,"x"\n')
        _w(d, "T8.csv", b'a,b\r\nc,d\n\r\n')    # S-terminated: \n kept
        _w(d, "T10.csv", b'a,b\nc,d\r\r')
        _w(d, "T11.csv", b'a,b\r\nc,de\nf\n')   # no-delim chunk peels
        _w(d, "T12.csv", b'a,b\r\nc,d\rx\n')
        _w(d, "T14.csv", b'a,b\r\nc,"x\ny"\n')  # in-span \n: no chunk
        _w(d, "T15.csv", b'a,b\r\nc,"x\r\ny"\n')
        _w(d, "T16.csv", b'a,b\r\nc,d\ne,f\r\ng,h\nq,r\n')
        _w(d, "T20.csv", b'a,b\r\nc,"un\nclosed\n')
        _w(d, "U1.csv", b'a,b\r\nc,de\nf,g\n')  # delim chunk: merged
        _w(d, "U2.csv", b'a,b\r\nc,de\nfg\n')
        _w(d, "U3.csv", b'a,b\r\nc,d\ne\nf\n')
        _w(d, "U4.csv", b'a,b\r\nc,d\ne\nf,g\n')
        _w(d, "U5.csv", b'a,b\r\nc,de\n"f"\n')
        _w(d, "U9.csv", b'a,b\r\nc,d\ne,f\ngh\n')
        _w(d, "U10.csv", b'a,b\r\nc,d\n\nef\n')
        _w(d, "W1.csv", b'a,b\r\nc,de\nfg\r\nh,i\r\n')  # mid-file: no peel
        _w(d, "W9.csv", b'a,b\r\n\nc,d\n')      # leading empty chunk drops
        _w(d, "W14.csv", b'a,b\r\nxy\nc,d\n')   # leading non-empty merges
        _w(d, "W16.csv", b'a,b\r\nxy\nc,d\nfg\n')
        _w(d, "W17.csv", b'a,b\r\n\nfg\n')
        _w(d, "W18.csv", b'a,b\r\nc,de\nf\rg\n')
        _w(d, "W22.csv", b'a,b\r\nc,d\n\ne,f\n')  # middle empty merges
        _w(d, "W23.csv", b'a,b\r\nc,d\nxy\ne,f\n')
        _w(d, "W24.csv", b'a,b\r\nc,d\n  \n')     # ws-only peeled row
        _w(d, "W25.csv", b'a,b\r\n"xy\nz\n')
        _w(d, "W26.csv", b'a,b\r\nx\ny\n')
        _w(d, "W2.csv", b'a,b\r\nc,de\n"f,g"\n')  # mid-field quote: delim counts
        _w(d, "W3.csv", b'a,b\r\nc,"x\ny",de\nfg\n')
        _w(d, "W10.csv", b'a,b\r\n"x\ny"\nfg\n')
        _w(d, "W13.csv", b'a,b\r\nc,de\nfg\r\n')
        _w(d, "W20.csv", b'a,b\r\n"x\ny",c\nfg\n')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d)
        assert _is_composed(got)

    def test_tail_peel_header_comment(self, spark, cache_dir,
                                      tmp_path):
        # a peeled chunk is a real record: the comment filter drops it
        d = str(tmp_path / "w27")
        _w(d, "f.csv", b'h1,h2\r\nv1,v2\n#x\n')
        eng = _engine(spark, cache_dir)
        got = _parity(spark, eng, d, schema="a string, b string",
                      header="true", comment="#")
        assert _is_composed(got)

    def test_custom_marker_cells(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        cells = [
            ("e11", b'a,"x~"y"\nz,w\n', {"escape": "~"}),
            ("e12", b"a,'x\ny'\nz,w\n", {"quote": "'"}),
            ("m4", b'a,"p""q"\nz,w\n', {"escape": '"'}),
            ("m5", b'a,"p""q\nr"\nz,w\n', {"escape": '"'}),
            ("G5", b'a,"x#\\"y",c\nz,w,q\n',
             {"charToEscapeQuoteEscaping": "#"}),
            ("e7", b'a||b\nc||"d\ne"\n', {"sep": "||"}),
            ("p15", b'a;"x\ny"\nb;c\n', {"sep": ";"}),
            ("p16", b'a,"x\nb,c\n', {"quote": ""}),
            ("G3", b'a, "x\ny",c\nz,w,q\n',
             {"ignoreLeadingWhiteSpace": "true"}),
            ("G7", b'a||"b"x||"c\nd"||e\nz||w||q\n', {"sep": "||"}),
        ]
        for name, data, opts in cells:
            d = str(tmp_path / name)
            _w(d, "f.csv", data)
            got = _parity(spark, eng, d, **opts)
            assert _is_composed(got), name

    def test_header_comment_cells(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        cells = [
            ("p5", b'"h\n1",h2\nv1,v2\n', {"header": "true"}),
            ("p5b", b'a,b\nv1,"v2\nv3"\n', {"header": "true"}),
            ("p6", b'#skip\nv1,v2\n"#notskip",x\n',
             {"comment": "#"}),
            ("p6b", b'v1,"x\n#inside"\n#skip\nv2,y\n',
             {"comment": "#"}),
            ("h1", b'#c1\n#c2\nh1,h2\nv1,v2\n',
             {"header": "true", "comment": "#"}),
            ("h2", b'h1,h2\n', {"header": "true"}),
            ("h3", b'\nh1,h2\nv1,v2\n', {"header": "true"}),
            # the whitespace-only record IS the header (h4, probed)
            ("h4", b'   \nh1,h2\nv1,v2\n', {"header": "true"}),
        ]
        for name, data, opts in cells:
            d = str(tmp_path / name)
            _w(d, "f.csv", data)
            got = _parity(spark, eng, d, **opts)
            assert _is_composed(got), name

    def test_bom_gzip_and_corrupt_column(self, spark, cache_dir,
                                         tmp_path):
        eng = _engine(spark, cache_dir)
        d1 = str(tmp_path / "bom")
        _w(d1, "p9.csv", "﻿a,b\nc,d\n".encode())
        _w(d1, "e17.csv", '﻿"h\nx",b\nc,d\n'.encode())
        assert _is_composed(_parity(spark, eng, d1))
        d2 = str(tmp_path / "gz")
        _w(d2, "p8.csv.gz", gzip.compress(b'x,"l1\nl2"\ny,z\n'))
        assert _is_composed(_parity(spark, eng, d2))
        d3 = str(tmp_path / "corrupt")
        _w(d3, "f.csv", b'1,"x\ny"\nnotint,"p\nq"\n')
        got = _parity(spark, eng, d3,
                      schema="a int, b string, _bad string",
                      columnNameOfCorruptRecord="_bad")
        assert _is_composed(got)

    def test_never_split_and_packed_files(self, spark, cache_dir,
                                          tmp_path):
        # a would-be-split file stays one task; many small files pack
        d = str(tmp_path / "big")
        rows = b"".join(b'%d,"v\n%d"\n' % (i, i) for i in range(20000))
        _w(d, "big.csv", rows)
        for i in range(12):
            _w(d, f"s{i}.csv", b'%d,"a\nb"\n' % i)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        try:
            eng = _engine(spark, cache_dir)
            got = _parity(spark, eng, d, schema="a int, b string")
            assert _is_composed(got)
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    def test_raw_routes(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        # explicit lineSep + multiLine: the JVM's framing keeps the
        # separator inside values (m3/p12) — refuse to guess
        d1 = str(tmp_path / "ls")
        _w(d1, "f.csv", b'a,b|c,"d|e"|')
        got = _parity(spark, eng, d1, schema="a string, b string",
                      lineSep="|")
        assert not _is_composed(got)
        # json multiLine: composes since the later round-10 work
        # (tests/test_json_multiline.py has the full matrix)
        d2 = str(tmp_path / "js")
        _w(d2, "f.json", b'[{"a": 1, "b": "x"},\n {"a": 2, "b": "y"}]')
        got = _parity(spark, eng, d2, fmt="json",
                      schema="a int, b string")
        assert _is_composed(got)
        # explicit cEQE with escape == quote: unprobed — raw
        d3 = str(tmp_path / "cq")
        _w(d3, "f.csv", b'a,"p""q"\nz,w\n')
        got = _parity(spark, eng, d3, schema="a string, b string",
                      escape='"', charToEscapeQuoteEscaping="#")
        assert not _is_composed(got)
        # delimiter containing the quote char: degenerate — raw
        d4 = str(tmp_path / "dq")
        _w(d4, "f.csv", b'a"x"b\nc"y"d\n')
        got = _parity(spark, eng, d4, schema="a string, b string",
                      sep='"x"')
        assert not _is_composed(got)
