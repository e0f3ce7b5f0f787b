"""Regression tests for the round-9 ADVICE items (fixed in round 10).

1. (high) ``dec_to_i``: the int64 range check ran in float64, where
   2^63-1 rounds UP to 2^63 — a decimal value of exactly 2^63 passed
   and the unsafe cast wrapped to -2^63 where the JVM reads NULL.
   Now compared in decimal space.
2. (medium) ``f_to_i``: same float boundary — ``tr <= hi*1.0``
   admitted 2.0^63 exactly. Now a strict ``tr < 2^(w-1)`` bound.
3. (medium) ``dec_rescale``: a precision-38 destination built a
   39-digit decimal128 bound scalar → ArrowInvalid at scan time.
   Now decimal256 intermediates with inclusive max-representable
   bounds.
4. (low) ORC bin-packing ran uncapped (split_bytes zeroed before
   ``super().partitions()``) and could swallow stripe-split
   candidates into _PackedParts. Now ``_pack_policy`` caps at the
   ORC split size and excludes oversized files.
5. (low) ``_pack_whole_files`` counted the incoming file's openCost
   in the overflow test; Spark's FilePartition tests
   ``currentSize + file.length > maxSplitBytes`` only. Now exact.
"""

from decimal import Decimal

import pyarrow as pa
import pytest


def _engine(spark, cache_dir):
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    return Engine(spark, conf=SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor"))


def _parity(spark, eng, d, schema, want_cached=True):
    jvm = spark.read.schema(schema).orc(d)
    got = eng.read_format(d, "orc", schema=schema)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert ("sidecar_cached_orc" in plan) == want_cached, schema
    assert got.schema.simpleString() == jvm.schema.simpleString()
    assert (sorted(map(str, got.collect()))
            == sorted(map(str, jvm.collect())))


class TestGateBoundaries:
    """Unit-level: the exact boundary values the float64 round-trip
    used to admit."""

    def test_dec_to_i_int64_boundaries(self):
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        f = _orc_cast_gate(pa.decimal128(38, 0), pa.int64())
        col = pa.array(
            [Decimal(2**63), Decimal(2**63 - 1), Decimal(-2**63),
             Decimal(-2**63 - 1), Decimal(5), None],
            type=pa.decimal128(38, 0))
        assert f(col).to_pylist() == [
            None, 2**63 - 1, -2**63, None, 5, None]

    def test_dec_to_i_narrow_boundaries(self):
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        f = _orc_cast_gate(pa.decimal128(9, 2), pa.int8())
        col = pa.array(
            [Decimal("127.99"), Decimal("128.00"), Decimal("-128.5"),
             Decimal("-129.0")], type=pa.decimal128(9, 2))
        # truncate toward zero, NULL outside [-128, 127]
        assert f(col).to_pylist() == [127, None, -128, None]

    def test_f_to_i_int64_boundaries(self):
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        g = _orc_cast_gate(pa.float64(), pa.int64())
        col = pa.array([2.0**63, 2.0**63 - 1024, -2.0**63,
                        -2.0**63 * 1.001, 7.9, float("nan")])
        assert g(col).to_pylist() == [
            None, 9223372036854774784, -2**63, None, 7, None]

    def test_f_to_i_narrow_boundaries(self):
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        g = _orc_cast_gate(pa.float64(), pa.int8())
        col = pa.array([127.0, 128.0, -128.0, -129.0, 2.5, -2.5])
        assert g(col).to_pylist() == [127, None, -128, None, 2, -2]

    def test_dec_rescale_precision38(self):
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        h = _orc_cast_gate(pa.decimal128(38, 10), pa.decimal128(38, 2))
        col = pa.array(
            [Decimal("1.2345"), Decimal("99999.999"),
             Decimal("-0.005")], type=pa.decimal128(38, 10))
        assert h(col).to_pylist() == [
            Decimal("1.23"), Decimal("100000.00"), Decimal("-0.01")]

    def test_dec_rescale_scale_up_overflow_nulls(self):
        # a scale INCREASE whose integer digits no longer fit must
        # read NULL, not raise in the decimal128 intermediate
        from sidecar_spark.sources.cached_orc import _orc_cast_gate

        h = _orc_cast_gate(pa.decimal128(38, 0), pa.decimal128(38, 2))
        col = pa.array([Decimal(10) ** 37, Decimal(123)],
                       type=pa.decimal128(38, 0))
        assert h(col).to_pylist() == [None, Decimal("123.00")]


class TestJvmParityBoundaries:
    """The same boundary cells end-to-end: cached scan vs the JVM's
    own read of the same ORC files."""

    @pytest.fixture(scope="class")
    def edge_table(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("orcedge") / "t")
        spark.sql("""
        SELECT * FROM VALUES
          (CAST(9223372036854775808.0 AS DOUBLE),
           CAST('9223372036854775808' AS DECIMAL(38,0)),
           CAST('12345678901234567890123456.7890123456'
                AS DECIMAL(38,10))),
          (CAST(-9223372036854775809024.0 AS DOUBLE),
           CAST('-9223372036854775809' AS DECIMAL(38,0)),
           CAST('-0.0050000000' AS DECIMAL(38,10))),
          (CAST(12.75 AS DOUBLE),
           CAST('9223372036854775807' AS DECIMAL(38,0)),
           CAST('1.2345' AS DECIMAL(38,10)))
         AS t(c_d, c_dec0, c_dec10)
        """).coalesce(1).write.mode("overwrite").orc(d)
        return d

    def test_double_to_bigint_boundary(self, spark, cache_dir,
                                       edge_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, edge_table, "c_d bigint")

    def test_decimal_to_bigint_boundary(self, spark, cache_dir,
                                        edge_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, edge_table, "c_dec0 bigint")

    def test_decimal38_rescale_serves_cached(self, spark, cache_dir,
                                             edge_table):
        eng = _engine(spark, cache_dir)
        _parity(spark, eng, edge_table, "c_dec10 decimal(38,2)")


class TestPackingRule:
    def test_overflow_test_matches_spark(self):
        """Spark's FilePartition: close when currentSize +
        file.length > maxSplitBytes; openCost is added only AFTER
        placing. Six 2-byte files, openCost 2, target 10: place
        (cost 4), 4+2 ≤ 10 place (8), 8+2 ≤ 10 place (12),
        12+2 > 10 close → bins of 3."""
        from sidecar_spark.sources.cached_parquet import (
            _FilePart,
            _PackedPart,
            _pack_whole_files,
        )

        parts = [_FilePart(f"/f{i}", 0, 2, False) for i in range(6)]
        out = _pack_whole_files(parts, 10, 2, 1)
        sizes = sorted(
            len(p.subs) if isinstance(p, _PackedPart) else 1
            for p in out)
        assert sizes == [3, 3]

    def test_open_cost_not_counted_for_incoming(self):
        from sidecar_spark.sources.cached_parquet import (
            _FilePart,
            _PackedPart,
            _pack_whole_files,
        )

        # two 5-byte files, openCost 4, target 10: the OLD rule
        # closed at 5+4 + (5+4) = 18 > 10 → two bins; Spark's rule
        # tests 9 + 5 = 14 > 10 → also two bins. Distinguishing
        # case: 3-byte files, openCost 4, target 10 — Spark: place
        # (7), 7+3=10 ≤ 10 place (14), 14+3 > 10 close → bins of 2;
        # old rule: 7 + (3+4) = 14 > 10 → bins of 1.
        parts = [_FilePart(f"/f{i}", 0, 3, False) for i in range(4)]
        out = _pack_whole_files(parts, 10, 4, 1)
        sizes = sorted(
            len(p.subs) if isinstance(p, _PackedPart) else 1
            for p in out)
        assert sizes == [2, 2]

    def test_no_pack_above_excludes(self):
        from sidecar_spark.sources.cached_parquet import (
            _FilePart,
            _PackedPart,
            _pack_whole_files,
        )

        parts = [_FilePart("/big", 0, 100, False)] + [
            _FilePart(f"/s{i}", 0, 2, False) for i in range(4)]
        out = _pack_whole_files(parts, 200, 0, 1, no_pack_above=50)
        packed = [p for p in out if isinstance(p, _PackedPart)]
        singles = [p for p in out if not isinstance(p, _PackedPart)]
        assert len(packed) == 1 and len(packed[0].subs) == 4
        assert [p.path for p in singles] == ["/big"]

    def test_orc_big_file_still_stripe_splits(self, cache_dir,
                                              tmp_path):
        """A multi-stripe ORC file above the split size must come out
        of partitions() as stripe-range splits even when surrounded
        by packable small files (it used to vanish into a
        _PackedPart when split_bytes was zeroed before packing)."""
        import pyarrow.orc as po

        from sidecar_spark.cache.manager import CacheManager
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.sources.cached_orc import CachedOrcReader
        from sidecar_spark.sources.cached_parquet import _PackedPart

        d = tmp_path / "t"
        d.mkdir()
        big = pa.table({"a": list(range(50000)),
                        "b": ["x" * 40] * 50000})
        po.write_table(big, str(d / "big.orc"),
                       stripe_size=64 * 1024)
        small = pa.table({"a": [1], "b": ["y"]})
        for i in range(3):
            po.write_table(small, str(d / f"s{i}.orc"))
        nstripes = po.ORCFile(str(d / "big.orc")).nstripes
        assert nstripes > 1

        conf = SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, resolve_mode="executor")
        mgr = CacheManager.get_or_create(conf)
        try:
            big_len = (d / "big.orc").stat().st_size
            reader = CachedOrcReader(
                {"path": str(d), "conf": conf.to_json(),
                 "split_bytes": str(big_len // 4),
                 "open_cost": "0", "parallelism": "4"})
            parts = reader.partitions()
            stripe_parts = [p for p in parts
                            if getattr(p, "stripes", None) is not None]
            assert len(stripe_parts) >= 2, parts
            covered = sorted(s for p in stripe_parts for s in
                             range(p.stripes[0], p.stripes[1]))
            assert covered == list(range(nstripes))
            for p in parts:
                if isinstance(p, _PackedPart):
                    assert all(s.length <= big_len // 4
                               for s in p.subs)
        finally:
            mgr.release()
            CacheManager.clear_instances()
