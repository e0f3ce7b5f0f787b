"""csv/json ``mode=DROPMALFORMED`` stays RAW — and the round-10
probes showing WHY that refusal is correct, pinned as tests.

A composed from_csv/from_json + corrupt-column filter reproduces the
collect()-time drop set exactly (type failures, too-few/too-many
tokens, unparseable json lines drop; empty fields, unclosed quotes
and missing json fields stay — all probed). But the JVM evaluates
malformed-ness against the projection's REQUIRED schema:

* ``select(b)`` over ``notint,y`` KEEPS the row (only ``b`` was
  required and it parsed);
* ``count()`` keeps EVERY raw csv line (empty required schema skips
  parsing entirely) — and every json multiLine document element;
* json multiLine drops the WHOLE document when ANY element has a
  bad-typed field (probed M5), which array-mode from_json cannot
  see.

A compose-time parse sees the full schema and cannot know the
downstream projection, so the same DataFrame would return DIFFERENT
answers than the JVM under projection — raw keeps parity. These
tests assert the raw route AND the projection-dependence evidence
(both sides quirky, identically).
"""

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


def _is_composed(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "sidecar_cached_text" in plan


class TestDropMalformedStaysRaw:
    def test_raw_route_and_projection_dependence(self, spark,
                                                 cache_dir,
                                                 tmp_path):
        eng = _engine(spark, cache_dir)
        d = str(tmp_path / "d1")
        _w(d, "f.csv", b"1,x\nnotint,y\n2,z\n")
        sch = "a int, b string"
        got = eng.read_format(d, "csv", schema=sch,
                              mode="DROPMALFORMED")
        assert not _is_composed(got)
        jvm = (spark.read.schema(sch)
               .option("mode", "DROPMALFORMED").csv(d))
        # full projection: the malformed row drops (both sides)
        assert (sorted(map(str, got.collect()))
                == sorted(map(str, jvm.collect())))
        assert len(got.collect()) == 2
        # the probed JVM quirks that make composing impossible:
        # a narrower projection KEEPS the row whose other column
        # failed, and count() keeps every raw line
        assert sorted(r.b for r in got.select("b").collect()) == [
            "x", "y", "z"]
        assert got.count() == 3
        assert jvm.count() == 3

    def test_json_and_failfast_raw(self, spark, cache_dir, tmp_path):
        eng = _engine(spark, cache_dir)
        d = str(tmp_path / "j")
        _w(d, "f.json",
           b'{"a": 1, "b": "x"}\nnotjson\n{"a": 2, "b": "y"}\n')
        sch = "a long, b string"
        got = eng.read_format(d, "json", schema=sch,
                              mode="DROPMALFORMED")
        assert not _is_composed(got)
        jvm = (spark.read.schema(sch)
               .option("mode", "DROPMALFORMED").json(d))
        assert (sorted(map(str, got.collect()))
                == sorted(map(str, jvm.collect())))
        # json multiLine: a bad ELEMENT drops the WHOLE document
        d2 = str(tmp_path / "jml")
        _w(d2, "f.json",
           b'[{"a": 1, "b": "x"}, {"a": "xx", "b": "y"}]')
        got = eng.read_format(d2, "json", schema=sch,
                              mode="DROPMALFORMED", multiLine="true")
        assert not _is_composed(got)
        assert len(got.collect()) == 0
        # FAILFAST: raw, both sides raise the JVM's error
        d3 = str(tmp_path / "ff")
        _w(d3, "f.csv", b"1,x\nbad,y\n")
        got = eng.read_format(d3, "csv", schema="a int, b string",
                              mode="FAILFAST")
        assert not _is_composed(got)
        with pytest.raises(Exception):
            got.collect()
