"""Executor-mode cached ``text`` + ``binaryFile`` sources: live-JVM
parity (every probed semantic from sources/cached_rawfile.py asserted
against the JVM's own scan of the same fixtures) plus unit tests for
the line splitter and glob matcher.
"""

import io
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


def _parity(spark, jvm_df, got_df):
    assert (got_df.schema.simpleString()
            == jvm_df.schema.simpleString())
    assert (sorted(tuple(r) for r in got_df.collect())
            == sorted(tuple(r) for r in jvm_df.collect()))


class TestLineSplitterUnits:
    DATA = b"one\ntwo\r\nthree\rfour\n\nsix\nlast-no-term"

    def _lines(self, data, s, e, sep=None, chunk=7):
        from sidecar_spark.sources.cached_rawfile import _line_spans

        f = io.BytesIO(data)
        f.seek(s)
        return list(_line_spans(lambda: f.read(chunk), s, e, sep))

    def test_default_framing(self):
        assert self._lines(self.DATA, 0, len(self.DATA)) == [
            b"one", b"two", b"three", b"four", b"", b"six",
            b"last-no-term"]

    @pytest.mark.parametrize("chunk", [1, 2, 3, 7, 64])
    def test_every_split_point_consistent(self, chunk):
        """The Hadoop assignment rule must reassemble the exact line
        sequence for EVERY boundary position — including boundaries
        inside a \\r\\n terminator — at every chunk size."""
        full = self._lines(self.DATA, 0, len(self.DATA), chunk=chunk)
        for cut in range(1, len(self.DATA)):
            got = (self._lines(self.DATA, 0, cut, chunk=chunk)
                   + self._lines(self.DATA, cut, len(self.DATA),
                                 chunk=chunk))
            assert got == full, f"boundary {cut}"

    def test_three_way_split(self):
        data = b"aa\r\nbb\r\ncc\r\ndd"
        full = self._lines(data, 0, len(data))
        for c1 in range(1, len(data) - 1):
            for c2 in range(c1 + 1, len(data)):
                got = (self._lines(data, 0, c1)
                       + self._lines(data, c1, c2)
                       + self._lines(data, c2, len(data)))
                assert got == full, (c1, c2)

    def test_custom_sep(self):
        assert self._lines(b"a|b||c|", 0, 7, sep=b"|") == [
            b"a", b"b", b"", b"c"]
        assert self._lines(b"aXYbXY", 0, 6, sep=b"XY") == [b"a", b"b"]
        assert self._lines(b"a\nb|c", 0, 5, sep=b"|") == [b"a\nb", b"c"]

    def test_edges(self):
        assert self._lines(b"", 0, 0) == []
        assert self._lines(b"\n", 0, 1) == [b""]
        assert self._lines(b"a\r", 0, 2) == [b"a"]
        assert self._lines(b"a\n", 0, 2) == [b"a"]


class TestGlobUnits:
    def test_shapes(self):
        from sidecar_spark.sources.cached_rawfile import glob_match

        assert glob_match("*.bin", "a.bin")
        assert not glob_match("*.bin", "a.dat")
        assert glob_match("part-*", "part-00000")
        assert glob_match("{a,b}*", "b9")
        assert glob_match("[^x]*", "ab")
        assert not glob_match("[^a]*", "ab")
        assert glob_match("a?c", "abc")


class TestBinaryFileParity:
    @pytest.fixture()
    def root(self, tmp_path):
        d = str(tmp_path)
        _w(d, "bin/k=1/a.bin", b"hello")
        _w(d, "bin/k=1/sub.txt", b"zz")
        _w(d, "bin/k=2/b.dat", b"")          # empty: NO row (probed)
        _w(d, "bin/k=2/c.bin", b"\x00\x01binary\xff")
        return os.path.join(d, "bin")

    def test_basic_and_schema(self, spark, cache_dir, root):
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    spark.read.format("binaryFile").load(root),
                    eng.read_format(root, "binaryFile"))
        finally:
            eng.close()

    def test_glob_and_rfl(self, spark, cache_dir, root):
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    (spark.read.format("binaryFile")
                     .option("pathGlobFilter", "*.bin").load(root)),
                    eng.read_format(root, "binaryFile",
                                    pathGlobFilter="*.bin"))
            _parity(spark,
                    (spark.read.format("binaryFile")
                     .option("recursiveFileLookup", "true").load(root)),
                    eng.read_format(root, "binaryFile",
                                    recursiveFileLookup="true"))
        finally:
            eng.close()

    def test_projection_skips_content(self, spark, cache_dir, root):
        """A projection without ``content`` must move zero data bytes
        (metadata-only batches) and still match the JVM values."""
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    (spark.read.format("binaryFile").load(root)
                     .select("length", "path")),
                    eng.read_format(root, "binaryFile",
                                    columns=["length", "path"]))
            # nothing was mirrored: no file opens happened
            assert eng.cache.stats.snapshot().get(
                "total_bytes_read", 0) == 0
        finally:
            eng.close()

    def test_filters_parity(self, spark, cache_dir, root):
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    (spark.read.format("binaryFile").load(root)
                     .where("length > 2 and k = 2")),
                    (eng.read_format(root, "binaryFile")
                     .where("length > 2 and k = 2")))
        finally:
            eng.close()

    def test_length_filter_prunes_files(self, spark, cache_dir, root):
        """Provable length predicates skip whole files at PLAN time
        (the 100 TB path: a metadata predicate never opens the
        non-matching files)."""
        import json

        from sidecar_spark.sources.cached_rawfile import (
            PruningCachedBinaryFileReader,
        )

        eng = _engine(spark, cache_dir)
        try:
            opts = {"path": root, "conf": eng.conf.to_json(),
                    "pushdown": "true"}
            r = PruningCachedBinaryFileReader(opts)
            # lengths: a.bin=5, sub.txt=2, c.bin=9 (b.dat empty,
            # dropped) — `length > 5` provably keeps only c.bin
            r._part_filters.append(("length", "gt", 5))
            parts = r.partitions()
            assert [os.path.basename(p.path)
                    for p in parts] == ["c.bin"]
        finally:
            eng.close()

    def test_max_length_errors_like_jvm(self, spark, cache_dir, root):
        spark.conf.set("spark.sql.sources.binaryFile.maxLength", "3")
        try:
            eng = _engine(spark, cache_dir)
            try:
                with pytest.raises(Exception, match="max length"):
                    eng.read_format(root, "binaryFile").collect()
            finally:
                eng.close()
        finally:
            spark.conf.unset("spark.sql.sources.binaryFile.maxLength")

    def test_mtime_millis(self, spark, cache_dir, tmp_path):
        """modificationTime is the listing mtime at MILLISECOND
        precision, exactly the JVM's FileStatus value (probed)."""
        d = str(tmp_path)
        _w(d, "one/x.bin", b"x")
        root = os.path.join(d, "one")
        eng = _engine(spark, cache_dir)
        try:
            jvm = spark.read.format("binaryFile").load(root).collect()
            got = eng.read_format(root, "binaryFile").collect()
            assert got[0].modificationTime == jvm[0].modificationTime
            assert got[0].path == jvm[0].path  # file:/... rendering
        finally:
            eng.close()

    def test_warm_read_hits_mirror(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "warm/x.bin", b"payload-bytes")
        root = os.path.join(d, "warm")
        eng = _engine(spark, cache_dir)
        try:
            eng.read_format(root, "binaryFile").collect()
            import glob as g
            copies = [f for f in g.glob(cache_dir + "/**/*",
                                        recursive=True)
                      if os.path.isfile(f)
                      and open(f, "rb").read() == b"payload-bytes"]
            assert copies, "mirror holds the file after the scan"
            got = eng.read_format(root, "binaryFile").collect()
            assert bytes(got[0].content) == b"payload-bytes"
        finally:
            eng.close()


class TestTextParity:
    @pytest.fixture()
    def root(self, tmp_path):
        d = str(tmp_path)
        _w(d, "t/p=x/a.txt",
           b"one\ntwo\r\nthree\rfour\n\nsix\nlast-no-term")
        _w(d, "t/p=y/b.txt", b"alpha\nbeta\n")
        _w(d, "t/p=y/empty.txt", b"")
        return os.path.join(d, "t")

    def test_partitioned_lines(self, spark, cache_dir, root):
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark, spark.read.text(root),
                    eng.read_format(root, "text"))
        finally:
            eng.close()

    def test_wholetext(self, spark, cache_dir, root):
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark, spark.read.text(root, wholetext=True),
                    eng.read_format(root, "text", wholetext="true"))
        finally:
            eng.close()

    def test_linesep(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        _w(d, "s/a.txt", b"a|b||c|")
        _w(d, "s/b.txt", b"x\ny|z")
        root = os.path.join(d, "s")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    spark.read.option("lineSep", "|").text(root),
                    eng.read_format(root, "text", lineSep="|"))
        finally:
            eng.close()

    def test_invalid_utf8_passthrough(self, spark, cache_dir,
                                      tmp_path):
        """Bytes ride into the JVM unvalidated (raw Arrow buffers) —
        length() and collect must match the JVM's UTF8String
        semantics on invalid sequences."""
        import pyspark.sql.functions as F

        d = str(tmp_path)
        _w(d, "b/a.txt", b"ok\n\xff\xfe bad\nend")
        root = os.path.join(d, "b")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark,
                    (spark.read.text(root)
                     .select(F.length("value").alias("n"), "value")),
                    (eng.read_format(root, "text")
                     .select(F.length("value").alias("n"), "value")))
        finally:
            eng.close()

    def test_byte_splits_match_jvm(self, spark, cache_dir, tmp_path):
        """Tiny split size → many splits per file; the line multiset
        must equal the JVM's unsplit read (the checksum-style guard
        behind executor_text_read_agg)."""
        d = str(tmp_path)
        big = ("\n".join(
            f"line-{i:06d}-" + "x" * (i % 37) for i in range(5000))
            + "\ncr\rmid\r\nend").encode()
        _w(d, "big/a.txt", big)
        root = os.path.join(d, "big")
        eng = _engine(spark, cache_dir)
        try:
            jvm = sorted(r.value for r in spark.read.text(root).collect())
            got = sorted(r.value for r in eng.read_format(
                root, "text", split_bytes=1024).collect())
            assert got == jvm
        finally:
            eng.close()

    def test_unsupported_option_goes_raw(self, spark, cache_dir,
                                         tmp_path):
        d = str(tmp_path)
        _w(d, "r/a.txt", b"x\n")
        root = os.path.join(d, "r")
        eng = _engine(spark, cache_dir)
        try:
            df = eng.read_format(root, "text",
                                 pathGlobFilter="a\\.txt")
            plan = df._jdf.queryExecution().toString()
            assert "sidecar_cached_text" not in plan
        finally:
            eng.close()

    def test_driver_mode_binaryfile_goes_raw(self, spark, cache_dir,
                                             tmp_path):
        """Driver mode must NOT serve binaryFile through the symlink
        view — the path column would render view paths. It reads the
        original raw (correct), and values match the JVM."""
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine

        d = str(tmp_path)
        _w(d, "dm/x.bin", b"x")
        root = os.path.join(d, "dm")
        eng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False))
        try:
            got = eng.read_format(root, "binaryFile").collect()
            jvm = spark.read.format("binaryFile").load(root).collect()
            assert got[0].path == jvm[0].path
        finally:
            eng.close()


class TestBomParity:
    """Hadoop's LineRecordReader strips a UTF-8 BOM at the start of
    the file (probed round 8): line-mode drops it, wholetext and
    mid-file BOM sequences keep it — all asserted against the JVM."""

    def test_bom_line_mode_and_wholetext(self, spark, cache_dir,
                                         tmp_path):
        d = str(tmp_path)
        _w(d, "bom/a.txt", b"\xef\xbb\xbfhello\nworld\n")
        _w(d, "bom/b.txt", b"x\n\xef\xbb\xbfy\n")  # mid-file: kept
        root = os.path.join(d, "bom")
        eng = _engine(spark, cache_dir)
        try:
            _parity(spark, spark.read.text(root),
                    eng.read_format(root, "text"))
            _parity(spark, spark.read.text(root, wholetext=True),
                    eng.read_format(root, "text", wholetext="true"))
        finally:
            eng.close()

    def test_bom_with_splits(self, spark, cache_dir, tmp_path):
        d = str(tmp_path)
        body = b"\xef\xbb\xbf" + b"\n".join(
            b"line-%05d" % i for i in range(500)) + b"\n"
        _w(d, "bs/a.txt", body)
        root = os.path.join(d, "bs")
        eng = _engine(spark, cache_dir)
        try:
            jvm = sorted(r.value
                         for r in spark.read.text(root).collect())
            got = sorted(r.value for r in eng.read_format(
                root, "text", split_bytes=256).collect())
            assert got == jvm
        finally:
            eng.close()


class TestRawFileOverS3Stub:
    """The raw-file sources against the localhost S3 REST stub — the
    real-cluster deployment shape, scan tasks fetching object-store
    bytes themselves. (No S3A jars in this environment, so expected
    values are asserted directly rather than against a JVM S3 scan.)"""

    def test_binaryfile_and_text_over_s3(self, spark, cache_dir):
        from sidecar_spark.cache.fs import RemoteFS
        from sidecar_spark.config import SidecarConfig
        from sidecar_spark.engine import Engine
        from sidecar_spark.testing.s3server import S3StubServer

        with S3StubServer() as srv:
            os.environ["SIDECAR_S3_ENDPOINT"] = srv.endpoint
            try:
                fs, _ = RemoteFS.from_uri("s3://lake")
                fs.write_all("s3://lake/raw/a.bin", b"hello-s3")
                fs.write_all("s3://lake/raw/b.txt", b"l1\nl2\n")
                eng = Engine(spark, conf=SidecarConfig.create(
                    cache_dir=cache_dir, data_cache_type="file",
                    cache_persistent=False, resolve_mode="executor"))
                try:
                    rows = (eng.read_format("s3://lake/raw",
                                            "binaryFile")
                            .orderBy("path").collect())
                    assert [r.path for r in rows] == [
                        "s3://lake/raw/a.bin", "s3://lake/raw/b.txt"]
                    assert bytes(rows[0].content) == b"hello-s3"
                    assert rows[0].length == 8
                    lines = sorted(
                        r.value for r in eng.read_format(
                            "s3://lake/raw", "text",
                            pathGlobFilter="*.txt").collect())
                    assert lines == ["l1", "l2"]
                    # warm read serves node-local mirror copies
                    import glob as g

                    copies = [f for f in g.glob(
                        cache_dir + "/**/*", recursive=True)
                        if os.path.isfile(f)
                        and open(f, "rb").read() == b"hello-s3"]
                    assert copies
                    again = (eng.read_format("s3://lake/raw",
                                             "binaryFile")
                             .where("length = 8").collect())
                    assert bytes(again[0].content) == b"hello-s3"
                finally:
                    eng.close()
            finally:
                os.environ.pop("SIDECAR_S3_ENDPOINT", None)
