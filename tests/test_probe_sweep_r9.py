"""Round-9 probe sweep (VERDICT r8 #8): ``spark.sql.caseSensitive``
through the raw-file and csv-compose paths, and the
``recursiveFileLookup`` × ``pathGlobFilter`` interplay on the raw-file
sources — each cell asserted against the live JVM's own scan.
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
    p = os.path.join(d, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(data)


def _parity(jvm_df, got_df):
    assert (got_df.schema.simpleString()
            == jvm_df.schema.simpleString())
    assert (sorted(map(str, got_df.collect()))
            == sorted(map(str, jvm_df.collect())))


@pytest.fixture()
def case_sensitive(spark):
    spark.conf.set("spark.sql.caseSensitive", "true")
    yield
    spark.conf.unset("spark.sql.caseSensitive")


class TestCaseSensitiveRawFile:
    def test_text_partition_key_case(self, spark, cache_dir, tmp_path,
                                     case_sensitive):
        """Under caseSensitive=true a partition directory key keeps
        its exact case in the schema, for text like for parquet."""
        d = str(tmp_path / "t")
        _w(d + "/K=1", "a.txt", b"x\ny")
        _w(d + "/K=2", "b.txt", b"z")
        eng = _engine(spark, cache_dir)
        _parity(spark.read.text(d), eng.read_format(d, "text"))

    def test_text_projection_case(self, spark, cache_dir, tmp_path,
                                  case_sensitive):
        """An explicit projection of 'VALUE' under caseSensitive=true
        must fail like the JVM's analyzer (no such column)."""
        d = str(tmp_path / "p")
        _w(d, "a.txt", b"x")
        eng = _engine(spark, cache_dir)
        with pytest.raises(Exception):
            spark.read.text(d).select("VALUE").collect()
        with pytest.raises(Exception):
            eng.read_format(d, "text", columns=["VALUE"]).collect()

    def test_binaryfile_partition_case(self, spark, cache_dir,
                                       tmp_path, case_sensitive):
        d = str(tmp_path / "b")
        _w(d + "/K=1", "a.bin", b"pay")
        eng = _engine(spark, cache_dir)
        _parity(
            spark.read.format("binaryFile").load(d)
            .select("length", "K"),
            eng.read_format(d, "binaryFile", columns=["length", "K"]))


class TestCaseSensitiveCsvCompose:
    def test_user_schema_case_exact(self, spark, cache_dir, tmp_path,
                                    case_sensitive):
        """caseSensitive=true: the declared field case IS the output
        case for the composed csv path, like the raw JVM read."""
        d = str(tmp_path / "c")
        _w(d, "a.csv", b"1,x\n2,y\n")
        eng = _engine(spark, cache_dir)
        sch = "A int, b string"
        _parity(spark.read.schema(sch).csv(d),
                eng.read_format(d, "csv", schema=sch))

    def test_header_skip_unaffected_by_case(self, spark, cache_dir,
                                            tmp_path, case_sensitive):
        d = str(tmp_path / "h")
        _w(d, "a.csv", b"A,B\n1,x\n")
        eng = _engine(spark, cache_dir)
        sch = "a int, b string"
        _parity(spark.read.schema(sch).option("header", "true").csv(d),
                eng.read_format(d, "csv", schema=sch, header="true"))


class TestRecursiveLookupTimesGlob:
    def test_rfl_glob_text(self, spark, cache_dir, tmp_path):
        """recursiveFileLookup=true flattens nested dirs (partition
        columns dropped) and pathGlobFilter still matches BASENAMES of
        the nested files."""
        d = str(tmp_path / "r")
        _w(d, "top.txt", b"t1")
        _w(d + "/sub", "keep_a.txt", b"a1\na2")
        _w(d + "/sub/deep", "keep_b.txt", b"b1")
        _w(d + "/sub", "drop.txt", b"no")
        eng = _engine(spark, cache_dir)
        jvm = (spark.read.option("recursiveFileLookup", "true")
               .option("pathGlobFilter", "keep_*.txt").text(d))
        got = eng.read_format(d, "text", recursiveFileLookup="true",
                              pathGlobFilter="keep_*.txt")
        _parity(jvm, got)
        assert sorted(r.value for r in got.collect()) == [
            "a1", "a2", "b1"]

    def test_rfl_glob_binaryfile(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "rb")
        _w(d + "/x=1", "img_a.bin", b"aa")
        _w(d + "/x=2/y", "img_b.bin", b"bbb")
        _w(d + "/x=2", "other.dat", b"cc")
        eng = _engine(spark, cache_dir)
        jvm = (spark.read.format("binaryFile")
               .option("recursiveFileLookup", "true")
               .option("pathGlobFilter", "img_*").load(d)
               .select("length", "content"))
        got = eng.read_format(d, "binaryFile",
                              recursiveFileLookup="true",
                              pathGlobFilter="img_*",
                              columns=["length", "content"])
        _parity(jvm, got)

    def test_rfl_glob_parquet(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "rp")
        (spark.range(3).coalesce(1).write.mode("overwrite")
         .parquet(d + "/k=1"))
        (spark.range(3, 5).coalesce(1).write.mode("overwrite")
         .parquet(d + "/k=2"))
        eng = _engine(spark, cache_dir)
        jvm = (spark.read.option("recursiveFileLookup", "true")
               .option("pathGlobFilter", "*.parquet").parquet(d))
        got = eng.read_parquet(d, recursiveFileLookup="true",
                               pathGlobFilter="*.parquet")
        _parity(jvm, got)

    def test_rfl_glob_csv_compose(self, spark, cache_dir, tmp_path):
        d = str(tmp_path / "rc")
        _w(d + "/sub", "keep.csv", b"1,x\n")
        _w(d + "/sub", "drop.csv.bak", b"9,z\n")
        eng = _engine(spark, cache_dir)
        sch = "a int, b string"
        jvm = (spark.read.schema(sch)
               .option("recursiveFileLookup", "true")
               .option("pathGlobFilter", "*.csv").csv(d))
        got = eng.read_format(d, "csv", schema=sch,
                              recursiveFileLookup="true",
                              pathGlobFilter="*.csv")
        _parity(jvm, got)

    def test_rfl_glob_gz_text(self, spark, cache_dir, tmp_path):
        """The three features compose: recursion + glob + codec."""
        d = str(tmp_path / "rg")
        _w(d + "/sub", "keep.txt.gz", gzip.compress(b"g1\ng2"))
        _w(d + "/sub", "drop.txt", b"no")
        eng = _engine(spark, cache_dir)
        jvm = (spark.read.option("recursiveFileLookup", "true")
               .option("pathGlobFilter", "*.gz").text(d))
        got = eng.read_format(d, "text", recursiveFileLookup="true",
                              pathGlobFilter="*.gz")
        _parity(jvm, got)
        assert sorted(r.value for r in got.collect()) == ["g1", "g2"]
