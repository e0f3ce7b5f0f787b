"""Compression-codec parity for the cached text source (and the
composed csv/json-with-user-schema path built on it) — ADVICE r8 #1.

Every cell below was probed against the live JVM first (round 9):

* extension → codec map, matched case-INsensitively on the LAST dot
  suffix: ``.gz``/``.gzip`` (gzip), ``.bz2`` (bzip2), ``.deflate``
  (zlib-wrapped; raw deflate is a read ERROR), ``.zst``/``.zstd``
  (zstd frames), ``.lz4``/``.snappy`` (Hadoop BlockCompressorStream
  framing: 4B BE uncompressed-block-len, then 4B BE compressed-len +
  chunk). ``.tgz``/``.gz2``/``.bz``/``.sz``/``.lzo`` serve RAW bytes;
* no content sniffing: gzip bytes in a ``.txt`` come through verbatim;
* line framing, BOM strip, blank-line skip and custom lineSep all
  apply to the DECOMPRESSED bytes;
* concatenated members/streams (gzip, bzip2, zlib, zstd) all read
  fully; trailing garbage after a gzip member is a read error;
* compressed files are never byte-split (a gz under a 64 KiB
  maxPartitionBytes plans ONE partition);
* wholetext hands back the decompressed stream, BOM kept; a gz of an
  EMPTY payload (physical length > 0) yields one row with an empty
  string, while an empty PLAIN file yields no row;
* binaryFile NEVER decompresses: raw bytes, physical listing length.
"""

import bz2
import gzip
import os
import zlib

import pyarrow as pa
import pytest


def _engine(spark, cache_dir):
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    return Engine(spark, conf=SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file",
        cache_persistent=False, resolve_mode="executor"))


def _parity(jvm_df, got_df):
    assert (got_df.schema.simpleString()
            == jvm_df.schema.simpleString())
    assert (sorted(tuple(r) for r in got_df.collect())
            == sorted(tuple(r) for r in jvm_df.collect()))


def _w(d, name, data: bytes):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "wb") as f:
        f.write(data)


class TestCodecOf:
    def test_extension_map(self):
        from sidecar_spark.sources.cached_rawfile import codec_of

        assert codec_of("/x/a.txt.gz") == "gzip"
        assert codec_of("/x/a.GZ") == "gzip"
        assert codec_of("/x/a.Gzip") == "gzip"
        assert codec_of("s3://b/a.json.bz2") == "bzip2"
        assert codec_of("/x/a.deflate") == "zlib"
        assert codec_of("/x/a.zst") == "zstd"
        assert codec_of("/x/a.ZSTD") == "zstd"
        assert codec_of("/x/a.lz4") == "hadoop-lz4"
        assert codec_of("/x/a.snappy") == "hadoop-snappy"
        # probed raw: near-miss suffixes and unregistered codecs
        for raw in ("a.txt", "a.tgz", "a.gz2", "a.bz", "a.sz",
                    "a.lzo", "a", "a.gz.txt"):
            assert codec_of(raw) is None, raw


class TestCodecText:
    def test_mixed_dir_all_codecs(self, spark, cache_dir, tmp_path):
        """One directory mixing plain, gzip (BOM + concat member),
        multi-stream bz2, zlib deflate and multi-frame zstd — the JVM
        scan and the cached source must agree row-for-row."""
        d = str(tmp_path / "mixed")
        _w(d, "p.txt", b"plain1\nplain2\n")
        _w(d, "g.txt.gz",
           gzip.compress(b"\xef\xbb\xbfgz1\ngz2")
           + gzip.compress(b"gz3\n"))
        _w(d, "b.txt.bz2",
           bz2.compress(b"bz1\nbz2\n") + bz2.compress(b"bz3\n"))
        _w(d, "d.txt.deflate", zlib.compress(b"df1\ndf2"))
        _w(d, "z.txt.zst",
           pa.Codec("zstd").compress(b"zs1\nzs2", asbytes=True)
           + pa.Codec("zstd").compress(b"\nzs3", asbytes=True))
        eng = _engine(spark, cache_dir)
        _parity(spark.read.text(d), eng.read_format(d, "text"))

    @pytest.mark.parametrize("codec", ["gzip", "bzip2", "deflate",
                                       "lz4", "snappy"])
    def test_spark_written_roundtrip(self, spark, cache_dir, tmp_path,
                                     codec):
        """Spark-written compressed text (the JVM's own codec output,
        incl. the Hadoop lz4/snappy block framing) reads back
        identically through the cached source."""
        d = str(tmp_path / codec)
        df = spark.createDataFrame(
            [("row-%05d" % i,) for i in range(20000)], "value string")
        (df.coalesce(2).write.option("compression", codec)
         .mode("overwrite").text(d))
        eng = _engine(spark, cache_dir)
        _parity(spark.read.text(d), eng.read_format(d, "text"))

    def test_multiblock_lz4_snappy_decode(self, spark, tmp_path):
        """The Hadoop block decoder reassembles multi-block files
        byte-exactly (several MB → multiple 256 KiB blocks)."""
        import io

        from sidecar_spark.sources.cached_rawfile import _codec_chunks

        df = spark.createDataFrame(
            [("line-%07d" % i,) for i in range(300000)],
            "value string")
        for codec, name in (("lz4", "hadoop-lz4"),
                            ("snappy", "hadoop-snappy")):
            d = str(tmp_path / ("blk_" + codec))
            (df.coalesce(1).write.option("compression", codec)
             .mode("overwrite").text(d))
            part = [f for f in os.listdir(d) if f.startswith("part-")]
            with open(os.path.join(d, part[0]), "rb") as f:
                raw = f.read()
            dec = b"".join(_codec_chunks(io.BytesIO(raw), name))
            lines = dec.split(b"\n")
            assert len(lines) == 300001 and lines[-1] == b""
            assert lines[0] == b"line-0000000"
            assert lines[299999] == b"line-0299999"

    def test_wholetext_gz_bom_kept_and_empty_payload_row(
            self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "wt")
        _w(d, "a.txt.gz", gzip.compress(b"\xef\xbb\xbfab\ncd"))
        _w(d, "e.txt.gz", gzip.compress(b""))  # 26 bytes on disk
        eng = _engine(spark, cache_dir)
        jvm = spark.read.text(d, wholetext=True)
        got = eng.read_format(d, "text", wholetext="true")
        _parity(jvm, got)
        vals = sorted(r.value for r in got.collect())
        assert vals == ["", "﻿ab\ncd"]  # empty-payload row kept

    def test_linesep_gz(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "sep")
        _w(d, "a.txt.gz", gzip.compress(b"a|b||c|"))
        eng = _engine(spark, cache_dir)
        _parity(spark.read.option("lineSep", "|").text(d),
                eng.read_format(d, "text", lineSep="|"))

    def test_no_content_sniffing(self, spark, cache_dir, tmp_path):
        """gzip bytes under a plain extension serve RAW (probed: the
        JVM matches by extension only)."""
        d = str(tmp_path / "sniff")
        _w(d, "a.txt", gzip.compress(b"x\ny"))
        eng = _engine(spark, cache_dir)
        _parity(spark.read.text(d), eng.read_format(d, "text"))

    def test_gz_single_partition_despite_split(self, spark, cache_dir,
                                               tmp_path):
        d = str(tmp_path / "split")
        os.makedirs(d)
        with gzip.open(os.path.join(d, "big.txt.gz"), "wb") as f:
            for i in range(100000):
                f.write(b"line-%07d\n" % i)
        eng = _engine(spark, cache_dir)
        got = eng.read_format(d, "text", split_bytes=65536)
        assert got.rdd.getNumPartitions() == 1
        assert got.count() == 100000

    def test_corrupt_gz_errors(self, spark, cache_dir, tmp_path):
        """Extension says gzip, bytes are not: a read ERROR on both
        sides (probed: FAILED_READ_FILE in the JVM)."""
        d = str(tmp_path / "corrupt")
        _w(d, "a.txt.gz", b"not gzip at all\n")
        eng = _engine(spark, cache_dir)
        with pytest.raises(Exception):
            spark.read.text(d).collect()
        with pytest.raises(Exception):
            eng.read_format(d, "text").collect()

    def test_csv_json_user_schema_gz(self, spark, cache_dir, tmp_path):
        """The composed csv/json path inherits codec handling from
        the text source."""
        d1 = str(tmp_path / "csv")
        _w(d1, "a.csv.gz", gzip.compress(b"1,foo\n2,bar\n"))
        d2 = str(tmp_path / "json")
        _w(d2, "a.json.gz",
           gzip.compress(b'{"a":1,"b":"x"}\n{"a":2,"b":"y"}\n'))
        eng = _engine(spark, cache_dir)
        _parity(spark.read.schema("a int, b string").csv(d1),
                eng.read_format(d1, "csv", schema="a int, b string"))
        _parity(spark.read.schema("a int, b string").json(d2),
                eng.read_format(d2, "json", schema="a int, b string"))


class TestBinaryFileCodecAndMaxLength:
    def test_binaryfile_never_decompresses(self, spark, cache_dir,
                                           tmp_path):
        d = str(tmp_path / "bf")
        _w(d, "a.bin.gz", gzip.compress(b"payload"))
        eng = _engine(spark, cache_dir)
        _parity(
            spark.read.format("binaryFile").load(d)
            .select("length", "content"),
            eng.read_format(d, "binaryFile",
                            columns=["length", "content"]))

    def test_maxlength_metadata_only_succeeds(self, spark, cache_dir,
                                              tmp_path):
        """ADVICE r8 #3: the JVM throws on maxLength only when
        `content` is in the required schema (probed) — a metadata
        projection over an oversized file succeeds on both sides."""
        d = str(tmp_path / "bfmax")
        _w(d, "big.bin", b"x" * 100)
        eng = _engine(spark, cache_dir)
        spark.conf.set("spark.sql.sources.binaryFile.maxLength", "10")
        try:
            jvm = spark.read.format("binaryFile").load(d)
            assert [r.length for r in jvm.select("length").collect()
                    ] == [100]
            got = eng.read_format(d, "binaryFile", columns=["length"])
            assert [r.length for r in got.collect()] == [100]
            with pytest.raises(Exception):
                jvm.select("content").collect()
            with pytest.raises(Exception):
                eng.read_format(d, "binaryFile",
                                columns=["content"]).collect()
        finally:
            spark.conf.unset("spark.sql.sources.binaryFile.maxLength")


class TestOversizeValueGuard:
    def test_value_batch_int32_guard(self):
        """ADVICE r8 #4: a single line past int32 raises loudly
        instead of silently corrupting Arrow offsets. Exercised with
        a fake len() so the test doesn't allocate 2 GiB."""
        from sidecar_spark.sources import cached_rawfile as m

        class Huge(bytes):
            def __len__(self):
                return m._MAX_INT + 1

        with pytest.raises(ValueError, match="2 GiB"):
            list(m._value_batches(iter([Huge()]), True))
