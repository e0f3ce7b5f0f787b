"""ORC explicit user schemas in executor mode — VERDICT r8 #5.

The JVM ORC reader's schema-conversion matrix (SchemaEvolution /
ConvertTreeReaderFactory) was probed live, round 9; the cells the
cached source implements (``cached_orc._orc_cast_gate``) and the
engine's footer gate (out-of-matrix cells → raw JVM scan) are each
asserted against the JVM's own scan of the same files:

* structural: subset / reorder / missing-column-null / case match /
  hive partition relocation;
* int widening exact; NARROWING → NULL on overflow (probed: unlike
  parquet's mod-2^k truncation); int → float/double IEEE; double →
  float overflows to ±Inf;
* float/double → int TRUNCATES toward zero, NaN/Inf/overflow → NULL;
* int → decimal (NULL on overflow), decimal widening exact, decimal
  → int truncates toward zero, decimal → double; scale REDUCTION
  rounds HALF_UP (half away from zero) with NULL on overflow;
* boolean ↔ int, boolean → 'TRUE'/'FALSE';
* int/date → string (identical rendering); float/double/decimal →
  string (Java shortest-repr) refused → raw;
* string → binary reinterpret; binary → string ZERO-PADDED
  space-joined hex ('0a ff 00'); string → numeric parses refused.
"""

import os

import pytest


def _engine(spark, cache_dir):
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    return Engine(spark, conf=SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor"))


@pytest.fixture(scope="module")
def orc_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orcus") / "t")
    spark.sql("""
    SELECT * FROM VALUES
      (CAST(1 AS TINYINT), CAST(300 AS SMALLINT), CAST(70000 AS INT),
       CAST(5000000000 AS BIGINT), CAST(1.5 AS FLOAT),
       CAST(2.25 AS DOUBLE), CAST(123.45 AS DECIMAL(9,2)),
       'hello', CAST('bin' AS BINARY), DATE'2023-05-06', true),
      (CAST(-2 AS TINYINT), CAST(-300 AS SMALLINT),
       CAST(-70000 AS INT), CAST(-5000000000 AS BIGINT),
       CAST(-1.5 AS FLOAT), CAST(-2.25 AS DOUBLE),
       CAST(-0.05 AS DECIMAL(9,2)), 'world',
       CAST(X'0AFF00' AS BINARY), DATE'1981-12-31', false)
     AS t(c_ti, c_si, c_i, c_bi, c_f, c_d, c_dec, c_s, c_b,
          c_date, c_bool)
    """).coalesce(1).write.mode("overwrite").orc(d)
    return d


def _parity(spark, eng, d, schema, want_cached=True):
    jvm = spark.read.schema(schema).orc(d)
    got = eng.read_format(d, "orc", schema=schema)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert ("sidecar_cached_orc" in plan) == want_cached, schema
    assert got.schema.simpleString() == jvm.schema.simpleString()
    assert (sorted(map(str, got.collect()))
            == sorted(map(str, jvm.collect())))


class TestStructural:
    def test_subset_reorder_missing_case(self, spark, cache_dir,
                                         orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_i int, c_s string")
        _parity(spark, eng, orc_table, "c_s string, c_i int")
        _parity(spark, eng, orc_table, "c_i int, nope string")
        _parity(spark, eng, orc_table, "C_I int, c_S string")

    def test_partition_relocation_and_typing(self, spark, cache_dir,
                                             tmp_path):
        d = str(tmp_path / "p")
        spark.sql("SELECT 1 AS a, 'x' AS b").coalesce(1) \
            .write.mode("overwrite").orc(d + "/k=1")
        spark.sql("SELECT 2 AS a, 'y' AS b").coalesce(1) \
            .write.mode("overwrite").orc(d + "/k=2")
        eng = _engine(spark, cache_dir)
        for sch in ("a int, b string",
                    "k int, a int, b string",
                    "a bigint, b string"):
            _parity(spark, eng, d, sch)


class TestNumericCells:
    def test_widening_exact(self, spark, cache_dir, orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table,
                "c_ti int, c_si bigint, c_f double")

    def test_narrowing_null_on_overflow(self, spark, cache_dir,
                                        orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_si tinyint, c_bi int")
        got = eng.read_format(orc_table, "orc",
                              schema="c_si tinyint")
        assert [r[0] for r in got.collect()] == [None, None]

    def test_float_to_int_truncates(self, spark, cache_dir,
                                    orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_d int, c_f bigint")
        got = eng.read_format(orc_table, "orc", schema="c_d int")
        assert sorted(r[0] for r in got.collect()) == [-2, 2]

    def test_decimal_cells(self, spark, cache_dir, orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_i decimal(12,2)")
        _parity(spark, eng, orc_table, "c_dec decimal(18,4)")
        # scale REDUCTION rounds HALF_UP, carry included; a too-small
        # precision reads NULL (probed) — served cached
        _parity(spark, eng, orc_table, "c_dec decimal(9,1)")
        _parity(spark, eng, orc_table, "c_dec decimal(4,1)")
        _parity(spark, eng, orc_table, "c_dec int")
        _parity(spark, eng, orc_table, "c_dec double")
        # int -> too-small decimal: NULL on overflow, value when it
        # fits (70000 has 5 digits: fits (5,0), overflows (4,0))
        _parity(spark, eng, orc_table, "c_i decimal(5,0)")
        got = eng.read_format(orc_table, "orc",
                              schema="c_i decimal(4,0)")
        assert [r[0] for r in got.collect()] == [None, None]

    def test_bool_cells(self, spark, cache_dir, orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_bool int")
        _parity(spark, eng, orc_table, "c_i boolean")
        _parity(spark, eng, orc_table, "c_bool string")


class TestStringBinaryCells:
    def test_to_string_cells(self, spark, cache_dir, orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_i string")
        _parity(spark, eng, orc_table, "c_date string")

    def test_binary_hex_dump(self, spark, cache_dir, orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_b string")
        got = eng.read_format(orc_table, "orc", schema="c_b string")
        assert sorted(r[0] for r in got.collect()) == [
            "0a ff 00", "62 69 6e"]

    def test_string_binary_reinterpret(self, spark, cache_dir,
                                       orc_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, "c_s binary")


class TestRefusedCellsRouteRaw:
    @pytest.mark.parametrize("sch", [
        "c_d string",          # Java shortest-repr rendering
        "c_s int",             # string parse
        "c_date timestamp",    # temporal cross-kind
        "c_bi timestamp",      # long-as-seconds
    ])
    def test_refused_cell_matches_jvm_raw(self, spark, cache_dir,
                                          orc_table, sch):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, orc_table, sch, want_cached=False)

    def test_gate_unit_refusals(self):
        import pyarrow as pa

        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        assert _orc_cast_gate(pa.float64(), pa.string()) is None
        assert _orc_cast_gate(pa.string(), pa.int32()) is None
        assert callable(_orc_cast_gate(pa.decimal128(9, 2),
                                       pa.decimal128(9, 1)))
        assert _orc_cast_gate(pa.date32(),
                              pa.timestamp("us", tz="UTC")) is None
        assert _orc_cast_gate(
            pa.timestamp("us", tz="UTC"), pa.timestamp("us")) is None
