"""Source/sink format coverage: CSV, JSON and ORC round-trips.

The reference is content-transparent — any byte format flows through
its cache (SURVEY.md §2.6). The Spark engine's analog capability is
the DataFrameReader/Writer format family; these entries prove
byte-exact round-trip fidelity per format by writing a testdata table
out, reading it back, and aggregating — the oracle computes the same
aggregate from the original parquet, so any loss in the round-trip
(type coercion, precision, timestamp parsing) breaks the hash match.

Precision note: Spark serializes doubles as their shortest
round-trippable decimal form (Java ``Double.toString``), so CSV/JSON
text round-trips reproduce bit-identical doubles and the aggregates
match exactly.

Writes are marker-guarded one-time materializations under /tmp —
repeated runs (bench, driver) reuse them, mirroring a real pipeline
where the export is produced once and queried many times.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sidecar_spark.queries.registry import query, t

_ROOT = "/tmp/sidecar-formats"

# DuckDB twin of functions/dedup.py::hash60 over a SQL expression
_H60 = "('0x' || substr(md5({e}), 1, 15))::BIGINT"


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


def _materialize(spark, sf_dir, table: str, fmt: str, options: dict):
    """Write ``table`` as ``fmt`` once (success-marker guarded), return
    a DataFrame reading it back with the original schema (explicit
    schema: header inference would re-guess types and is a second scan
    at scale).  The cache path includes the SOURCE parquet's mtime —
    the page-key self-invalidation idea — so regenerated testdata can
    never be served a stale format copy."""
    src = t(spark, sf_dir, table)
    try:
        mt = os.stat(os.path.join(sf_dir, f"{table}.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    path = os.path.join(_ROOT, _tag(sf_dir), f"{table}_{fmt}_{mt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # superseded copies from prior testdata generations are dead
        # weight — drop siblings whose mtime suffix differs before
        # writing the current one (bounds /tmp growth across regens)
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), f"{table}_{fmt}_*")):
            if old != path:
                _shutil.rmtree(old, ignore_errors=True)
        src.write.mode("overwrite").format(fmt).options(**options).save(path)
    return (spark.read.format(fmt).options(**options)
            .schema(src.schema).load(path))


@query(
    "csv_roundtrip_agg",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def csv_roundtrip_agg(spark, sf_dir):
    """CSV sink+source round-trip on ``orders``: write with header,
    read back with the explicit schema, aggregate. Exact equality with
    the parquet-side oracle proves timestamps and doubles survived the
    text round-trip."""
    o = _materialize(spark, sf_dir, "orders", "csv",
                     {"header": "true", "timestampFormat":
                      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"})
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
             F.date_format(F.min("o_orderdate"), "yyyy-MM-dd")
             .alias("first_order"))
    )


@query(
    "json_roundtrip_agg",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def json_roundtrip_agg(spark, sf_dir):
    """JSON-lines sink+source round-trip on ``customer`` (the format
    of most raw training-data drops); schema-on-read with the original
    schema, then aggregate."""
    c = _materialize(spark, sf_dir, "customer", "json", {})
    return (
        c.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"),
             F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@query(
    "orc_roundtrip_agg",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS sum_price,
           round(avg(p_size), 6) AS avg_size
    FROM part
    GROUP BY p_brand
    """,
)
def orc_roundtrip_agg(spark, sf_dir):
    """ORC sink+source round-trip on ``part`` — the second columnar
    format next to parquet (both carry column pruning and predicate
    pushdown in Spark's vectorized readers)."""
    p = _materialize(spark, sf_dir, "part", "orc", {})
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
             F.round(F.avg("p_size"), 6).alias("avg_size"))
    )


@query(
    "compact_small_files",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
           min(event_id) AS min_id, max(event_id) AS max_id
    FROM events
    GROUP BY event_type
    """,
)
def compact_small_files(spark, sf_dir):
    """Small-files compaction — the Spark analog of the reference's
    ``concat`` verb (SidecarCachingFileSystem.java:1560-1586: merge
    many part files into one object). A 64-way fragmented copy of
    events is compacted to 4 files with a round-robin repartition
    (coalesce would merely glue input splits; repartition rebalances
    output sizes evenly — what a 100 TB compaction job wants), then
    the compacted copy is aggregated. Hash-parity with the original
    table proves the compaction was lossless."""
    tag = _tag(sf_dir)
    frag = os.path.join(_ROOT, tag, "events_fragmented")
    compact = os.path.join(_ROOT, tag, "events_compacted")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        t(spark, sf_dir, "events").repartition(64) \
            .write.mode("overwrite").parquet(frag)
    if not os.path.exists(os.path.join(compact, "_SUCCESS")):
        spark.read.parquet(frag).repartition(4) \
            .write.mode("overwrite").parquet(compact)
    e = spark.read.parquet(compact)
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.min("event_id").alias("min_id"),
             F.max("event_id").alias("max_id"))
    )


@query(
    "cache_lifecycle",
    oracle="""
    SELECT * FROM (VALUES
      ('1_create',            'none'),
      ('2_first_read',        'write_cache'),
      ('3_second_read',       'data_cache'),
      ('4_read_after_rename', 'write_cache'),
      ('5_reread_after_rename','data_cache'),
      ('6_after_delete',      'gone')
    ) t(step, served_from)
    """,
)
def cache_lifecycle(spark, sf_dir):
    """The reference's CRUD tier-provenance scenario as a graded
    battery entry (TestCachingFileSystemBase.java:179-334 →
    tests/test_cache.py::test_crud_lifecycle_tier_provenance): write 4
    pages through the caching FS, then prove WHICH tier served each
    subsequent read from the Statistics deltas — write cache on first
    read, data cache on the second, write cache again after a rename
    (content-addressed page keys self-invalidate), and both tiers
    drained after delete. Payload bytes come from the sf_dir lineitem
    parquet, so the probe exercises real testdata content."""
    import shutil
    import tempfile

    from sidecar_spark.cache.manager import CacheManager
    from sidecar_spark.config import SidecarConfig

    page = 4096
    tmp = tempfile.mkdtemp(prefix="sidecar-lifecycle-")
    try:
        conf = SidecarConfig.create(
            cache_dir=os.path.join(tmp, "cache"), data_page_size=page,
            io_buffer_size=4 * page, data_cache_type="file",
            cache_persistent=False)
        mgr = CacheManager.get_or_create(conf)
        with open(os.path.join(sf_dir, "lineitem.parquet"), "rb") as f:
            payload = f.read(4 * page)

        tiers = ("write_cache", "data_cache", "prefetch", "remote")

        def snap():
            return {k: mgr.stats.get(f"total_bytes_read_{k}") for k in tiers}

        def served(s0, s1):
            deltas = {k: s1[k] - s0[k] for k in tiers}
            best = max(deltas, key=deltas.get)
            return best if deltas[best] > 0 else "none"

        rows = []
        src = os.path.join(tmp, "remote", "f1")
        os.makedirs(os.path.dirname(src), exist_ok=True)
        s0 = snap()
        out = mgr.create(src)
        out.write(payload)
        out.close()
        mgr.drain()
        rows.append(("1_create", served(s0, snap())))

        for step in ("2_first_read", "3_second_read"):
            s0 = snap()
            st = mgr.open(src)
            assert st.read_at(0, 4 * page) == payload
            rows.append((step, served(s0, snap())))

        dst = os.path.join(tmp, "remote", "f2")
        mgr.rename(src, dst)
        mgr.drain()
        for step in ("4_read_after_rename", "5_reread_after_rename"):
            s0 = snap()
            st = mgr.open(dst)
            assert st.read_at(0, 4 * page) == payload
            rows.append((step, served(s0, snap())))

        mgr.delete(dst)
        mgr.drain()
        gone = mgr.meta.get(dst) is None and not os.path.exists(dst)
        rows.append(("6_after_delete", "gone" if gone else "present"))
        mgr.close(save=False)
        return spark.createDataFrame(rows, "step string, served_from string")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "python_datasource_scan",
    oracle="""
    SELECT 'h' || CAST(i % 50 AS VARCHAR) AS host,
           count(*) AS n,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS sum_metric,
           min((i * 2654435761) % 1000) AS min_metric,
           max((i * 2654435761) % 1000) AS max_metric
    FROM (SELECT unnest(generate_series(0, 79999)) AS i)
    GROUP BY host
    """,
)
def python_datasource_scan(spark, sf_dir):
    """Custom connector via the Python DataSource API (Spark 4.x) —
    the engine's answer to the reference's per-vendor FileSystem
    wrappers (SURVEY.md §2.6) for systems of record that are NOT a
    filesystem. sources/pyds.py::TelemetrySource plans 8 independent
    InputPartitions; each task streams its span as Arrow batches, so
    the scan parallelizes like any file source (no driver fan-in).
    Rows are a deterministic Knuth-hash sequence, which is how a
    procedural source stays oracle-checkable: DuckDB regenerates the
    identical feed from generate_series and must agree exactly."""
    from sidecar_spark.sources.pyds import TelemetrySource

    try:
        spark.dataSource.register(TelemetrySource)
    except Exception:
        pass  # already registered in this session
    feed = (spark.read.format("sidecar_telemetry")
            .option("rows", 80_000).option("partitions", 8).load())
    return (
        feed.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("metric").alias("sum_metric"),
             F.min("metric").alias("min_metric"),
             F.max("metric").alias("max_metric"))
    )


@query(
    "stream_python_source",
    oracle="""
    SELECT 'h' || CAST(i % 50 AS VARCHAR) AS host,
           count(*) AS n,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS sum_metric
    FROM (SELECT unnest(generate_series(0, 39999)) AS i)
    GROUP BY host
    """,
)
def stream_python_source(spark, sf_dir):
    """Streaming Python DataSource (SimpleDataSourceStreamReader) +
    checkpoint resume + exactly-once sink, in one probe: the telemetry
    feed is consumed in TWO separate availableNow runs sharing one
    checkpoint — run 1 takes the first 20k-row micro-batch, run 2
    resumes from the COMMITTED offset and takes the rest — through the
    idempotent per-batchId foreachBatch parquet sink. The oracle is
    the full 40k-row feed: only if offsets persist across restarts
    (no replay, no gap) does the union of both runs match it."""
    import shutil
    import tempfile as _tf

    from sidecar_spark.sources.pyds import TelemetrySource
    from sidecar_spark.streaming import run_foreach_batch_parquet

    try:
        spark.dataSource.register(TelemetrySource)
    except Exception:
        pass  # already registered in this session
    from sidecar_spark.streaming.ops import scratch_dir
    work = scratch_dir("sidecar-pystream-")
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    try:
        for _ in range(2):  # two runs, one checkpoint: offset resume
            feed = (spark.readStream.format("sidecar_telemetry")
                    .option("rows", 40_000).option("batch", 20_000).load())
            run_foreach_batch_parquet(
                feed, "stream_python_source", out,
                state_partitions=2, checkpoint=ckpt)
        result = (
            spark.read.option("basePath", out).parquet(out)
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("metric").alias("sum_metric"))
        )
        return result.localCheckpoint(eager=True)  # detach from tmp dir
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "xml_roundtrip_agg",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size,
           round(sum(p_retailprice), 2) AS sum_price
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def xml_roundtrip_agg(spark, sf_dir):
    """XML sink+source round-trip (Spark 4 built-in xml data source,
    rowTag records): the part table is written as XML, read back with
    the original schema, and aggregated — hash-parity with the
    parquet original proves the round trip is value-faithful
    (escaping, numeric formatting, null handling). Completes the
    format matrix: parquet / CSV / JSON / ORC / XML. XML parsing is
    JVM-side (StaxXmlParser) and splits by rowTag, so ingest
    parallelizes per-file like the other text formats."""
    df = _materialize(spark, sf_dir, "part", "xml", {"rowTag": "part"})
    return (
        df.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.sum(F.col("p_size").cast("long")).alias("sum_size"),
             F.round(F.sum("p_retailprice"), 2).alias("sum_price"))
        .orderBy("p_brand")
    )


@query(
    "python_datasource_write",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey < 20000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def python_datasource_write(spark, sf_dir):
    """The WRITER half of the Python DataSource API
    (sources/pyds.py::JsonlSink): executor-parallel JSON-lines tasks
    with a two-phase commit — per-task ``.inprogress`` files renamed
    into place by the driver commit, ``_SUCCESS`` marker last (the
    reference's moniker protocol as a Spark commit protocol,
    ``SidecarCachingFileSystem.java:1704-1717``).  The audit re-reads
    the COMMITTED files and must reproduce the source aggregate —
    a torn or duplicated task file would break the hash."""
    import shutil
    import tempfile

    from sidecar_spark.sources.pyds import JsonlSink

    try:
        spark.dataSource.register(JsonlSink)
    except Exception:  # noqa: BLE001  (already registered in this session)
        pass
    out = tempfile.mkdtemp(prefix="sidecar-pydsw-")
    try:
        o = (t(spark, sf_dir, "orders")
             .where(F.col("o_orderkey") < 20000)
             .select("o_orderkey", "o_orderstatus", "o_totalprice"))
        (o.write.format("sidecar_jsonl").option("path", out)
         .mode("append").save())
        back = spark.read.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double"
        ).json(_os_path_glob(out))
        rows = (
            back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderstatus")
            .collect())
        return spark.createDataFrame(
            rows, "o_orderstatus string, n bigint, total double")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _os_path_glob(out):
    import os as _os

    return [_os.path.join(out, f) for f in sorted(_os.listdir(out))
            if f.endswith(".jsonl")]


@query(
    "union_by_name_evolution",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(flagged) AS BIGINT) AS n_flagged,
           round(sum(coalesce(price, 0)), 2) AS total_priced
    FROM (
      SELECT o_orderstatus, 0 AS flagged, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL BY NAME
      SELECT 1 AS flagged, o_orderstatus, NULL::DOUBLE AS price
      FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def union_by_name_evolution(spark, sf_dir):
    """Schema-evolution union: ``unionByName(allowMissingColumns=
    True)`` aligns batches by COLUMN NAME (different column order,
    one batch missing a column → nulls) — the daily reality of
    long-lived ingest pipelines, where positional UNION silently
    corrupts when a producer reorders fields.  DuckDB's UNION ALL BY
    NAME is the exact oracle twin.  Pure narrow op: no shuffle, the
    union is a plan-level concatenation."""
    o = t(spark, sf_dir, "orders")
    old_batch = (o.where(F.col("o_orderkey") % 2 == 0)
                 .select("o_orderstatus",
                         F.lit(0).alias("flagged"),
                         F.round("o_totalprice", 2).alias("price")))
    new_batch = (o.where(F.col("o_orderkey") % 2 == 1)
                 .select(F.lit(1).alias("flagged"), "o_orderstatus"))
    merged = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("flagged").alias("n_flagged"),
             F.round(F.sum(F.coalesce("price", F.lit(0.0))), 2)
             .alias("total_priced"))
        .orderBy("o_orderstatus")
    )


@query(
    "mergeschema_read_evolution",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           count(region_tag) AS n_tagged,
           round(sum(coalesce(o_totalprice, 0)), 2) AS total
    FROM (
      SELECT o_orderpriority, o_totalprice, NULL AS region_tag
      FROM orders WHERE o_orderkey < 10000
      UNION ALL BY NAME
      SELECT o_orderpriority, o_totalprice,
             'r' || CAST(o_custkey % 5 AS VARCHAR) AS region_tag
      FROM orders WHERE o_orderkey >= 10000
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def mergeschema_read_evolution(spark, sf_dir):
    """Schema evolution ON READ: two parquet batches written with
    different schemas (the later one adds ``region_tag``) into one
    dataset directory, read back with ``mergeSchema=true`` — the
    union-of-schemas scan every long-lived lake table eventually
    needs.  Old files surface the new column as NULL; the oracle
    reconstructs the same evolution with UNION ALL BY NAME.  At
    scale, mergeSchema pays a footer-read per file at planning —
    production tables pin the merged schema in a catalog instead,
    which is why this entry reads with an explicit final schema
    check rather than leaving inference on per query."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="sidecar-mergeschema-")
    try:
        o = t(spark, sf_dir, "orders")
        (o.where(F.col("o_orderkey") < 10000)
         .select("o_orderpriority", "o_totalprice")
         .write.mode("overwrite").parquet(os.path.join(out, "b=1")))
        (o.where(F.col("o_orderkey") >= 10000)
         .select("o_orderpriority", "o_totalprice",
                 F.concat(F.lit("r"), (F.col("o_custkey") % 5)
                          .cast("string")).alias("region_tag"))
         .write.mode("overwrite").parquet(os.path.join(out, "b=2")))
        merged = (spark.read.option("mergeSchema", "true")
                  .parquet(os.path.join(out, "b=1"),
                           os.path.join(out, "b=2")))
        rows = (
            merged.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("region_tag").alias("n_tagged"),
                 F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2)
                 .alias("total"))
            .orderBy("o_orderpriority")
            .collect())
        return spark.createDataFrame(
            rows, "o_orderpriority string, n bigint, n_tagged bigint, "
                  "total double")
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# s3:// object-store connector: read tables THROUGH the cache layer from
# a live localhost S3-dialect endpoint
# ---------------------------------------------------------------------------

@query(
    "s3_object_store_agg",
    oracle="""
    SELECT r_name AS region, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY region
    """,
)
def s3_object_store_agg(spark, sf_dir):
    """The reference's headline deployment shape — Spark reading cloud
    objects through the caching layer (fs/s3a/SidecarS3AFileSystem.java:
    50-188) — as a graded battery entry: nation and region are uploaded
    to a live localhost S3-dialect endpoint (testing/s3server.py),
    resolved through CacheManager's local mirror (ranged HTTP GETs via
    pyarrow S3FileSystem on the wire), and joined/aggregated by Spark
    from the mirrored files.  The oracle runs on the original local
    parquet: identical results prove the object-store round trip is
    byte-faithful.  At 100 TB this mirror is per-executor and
    page-granular; here the dims are tiny so whole objects
    materialize."""
    import shutil
    import tempfile

    from sidecar_spark.cache.fs import RemoteFS
    from sidecar_spark.cache.manager import CacheManager
    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.testing.s3server import S3StubServer

    tmp = tempfile.mkdtemp(prefix="sidecar-s3q-")
    try:
        with S3StubServer() as srv:
            os.environ["SIDECAR_S3_ENDPOINT"] = srv.endpoint
            try:
                fs, _ = RemoteFS.from_uri("s3://lake")
                for tbl in ("nation", "region"):
                    with open(os.path.join(sf_dir, f"{tbl}.parquet"),
                              "rb") as f:
                        fs.write_all(
                            f"s3://lake/{tbl}.parquet/part-0.parquet",
                            f.read())
                conf = SidecarConfig.create(
                    cache_dir=os.path.join(tmp, "cache"),
                    data_cache_type="file", cache_persistent=False)
                mgr = CacheManager.get_or_create(conf)
                nation = spark.read.parquet(
                    *mgr.resolve_for_spark("s3://lake/nation.parquet"))
                region = spark.read.parquet(
                    *mgr.resolve_for_spark("s3://lake/region.parquet"))
                out = (
                    nation.join(
                        F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
                    .groupBy(F.col("r_name").alias("region"))
                    .agg(F.count(F.lit(1)).alias("n_nations"),
                         F.sum("n_nationkey").cast("bigint")
                         .alias("key_sum"))
                    .orderBy("region")
                )
                # materialize while the mirror files + server still exist
                out = out.localCheckpoint(eager=True)
                mgr.close(save=False)
                return out
            finally:
                os.environ.pop("SIDECAR_S3_ENDPOINT", None)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# error-tolerant ingestion: PERMISSIVE mode + corrupt-record column
# ---------------------------------------------------------------------------

@query(
    "csv_corrupt_records",
    oracle="""
    WITH lines AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE o_totalprice END AS price,
             o_orderkey % 13 = 0 AS corrupt
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           round(sum(coalesce(price, 0)), 2) AS clean_revenue
    FROM lines
    """,
)
def csv_corrupt_records(spark, sf_dir):
    """Error-tolerant ingestion — PERMISSIVE CSV parsing with the
    _corrupt_record escape hatch: rows that fail the declared schema
    land intact in the corrupt-record column instead of killing the
    job (the quarantine pattern every at-scale ingest needs; DROPMALFORMED
    and FAILFAST are the stricter siblings).  Malformed rows are
    synthesized deterministically (every 13th order gets a non-numeric
    price), so the oracle knows exactly which rows must quarantine.
    The parse runs partition-parallel over the staged CSV; the audit
    is a single tiny aggregate."""
    import tempfile

    src = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    staged = (src.select(
        F.concat_ws(",",
                    F.col("o_orderkey").cast("string"),
                    F.when(F.col("o_orderkey") % 13 == 0, F.lit("N/A"))
                    .otherwise(F.col("o_totalprice").cast("string")))
        .alias("value")))
    out = tempfile.mkdtemp(prefix="sidecar-corrupt-")
    try:
        staged.write.mode("overwrite").text(os.path.join(out, "csv"))
        parsed = (
            spark.read.schema(
                "o_orderkey long, price double, _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(os.path.join(out, "csv")))
        # caching the parsed frame is REQUIRED for _corrupt_record
        # queries (Spark refuses a bare filter on only that column)
        parsed = parsed.cache()
        result = parsed.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1)
                  .otherwise(0)).alias("n_corrupt"),
            F.round(F.sum(F.coalesce(F.col("price"), F.lit(0.0))), 2)
            .alias("clean_revenue"))
        return result.localCheckpoint(eager=True)
    finally:
        import shutil
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Raw-file sources: binaryFile + text (the corpus-of-files ingest path)
# ---------------------------------------------------------------------------

def _materialize_doc_files(spark, sf_dir, mod: int) -> str:
    """One raw file per document (doc_id % mod == 0), laid out as
    ``doc_id=<k>/part-*`` via a partitionBy text write — the
    file-per-record corpus layout a crawl or scrape delivers.  Same
    marker + source-mtime guard as ``_materialize``."""
    docs = t(spark, sf_dir, "documents")
    try:
        mt = os.stat(os.path.join(sf_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    path = os.path.join(_ROOT, _tag(sf_dir), f"docfiles_{mod}_{mt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), f"docfiles_{mod}_*")):
            if old != path:
                _shutil.rmtree(old, ignore_errors=True)
        (docs.where(F.col("doc_id") % mod == 0)
             .select("doc_id", "text")
             .write.mode("overwrite").partitionBy("doc_id")
             .format("text").save(path))
    return path


def _materialize_text_lines(spark, sf_dir, single: bool) -> str:
    """documents.text exported line-per-row as raw text, either with
    natural partitioning (distributed read path) or coalesced to one
    file (the wholetext case)."""
    docs = t(spark, sf_dir, "documents").select("text")
    try:
        mt = os.stat(os.path.join(sf_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    tag = "textlines1" if single else "textlines"
    path = os.path.join(_ROOT, _tag(sf_dir), f"{tag}_{mt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(_ROOT, _tag(sf_dir), f"{tag}_*")):
            if old != path:
                _shutil.rmtree(old, ignore_errors=True)
        out = docs.coalesce(1) if single else docs
        out.write.mode("overwrite").format("text").save(path)
    return path


@query(
    "binaryfile_source_scan",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(strlen(text) + 1) AS BIGINT) AS total_bytes,
           CAST(count(*) AS BIGINT) AS n_verified
    FROM documents
    WHERE doc_id % 25 = 0
    """,
)
def binaryfile_source_scan(spark, sf_dir):
    """The ``binaryFile`` source — Spark's opaque-bytes reader and the
    front door for every multimodal ingest (images, audio, raw docs
    land as files, not rows; SURVEY.md multimodal plumbing starts
    here).  Each file arrives as (path, modificationTime, length,
    content); the partition-directory key is recovered from the path
    and every payload is byte-verified against the table of record
    (text + the sink's line terminator), so the aggregate proves
    content fidelity, not just file counts.  At 100 TB this scan is
    embarrassingly parallel — files split across tasks, no shuffle
    until the final 1-row aggregate; the join back to ``documents``
    broadcasts the (tiny) file-key side only because verification
    demands it, a test-only step."""
    path = _materialize_doc_files(spark, sf_dir, 25)
    docs = (t(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 25 == 0)
            .select("doc_id", "text"))
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "part-*")
             .option("recursiveFileLookup", "true")
             .load(path))
    parsed = files.select(
        F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("long")
         .alias("doc_id"),
        F.col("length").alias("nbytes"),
        F.decode("content", "UTF-8").alias("payload"))
    return (parsed.join(docs, "doc_id")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("nbytes").alias("total_bytes"),
                 F.sum(F.when(F.col("payload")
                              == F.concat(F.col("text"), F.lit("\n")), 1)
                       .otherwise(0)).alias("n_verified")))


@query(
    "text_source_lines",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(strlen(text)) AS BIGINT) AS total_chars,
           CAST(min(strlen(text)) AS BIGINT) AS min_len,
           CAST(max(strlen(text)) AS BIGINT) AS max_len,
           CAST(sum({_H60.format(e='text')} % 1000000007) AS BIGINT)
               AS checksum
    FROM documents
    """,
)
def text_source_lines(spark, sf_dir):
    """``spark.read.text`` line-per-row — the raw-text ingest path
    (crawl dumps, log corpora) before any schema exists.  The export
    keeps natural partitioning so the read is distributed: one task
    per split, newline framing inside the scan, zero shuffles before
    the final aggregate.  A content checksum (the battery's shared
    60-bit md5 fold) rides along so any mangling of line framing or
    encoding — not just a miscount — breaks the oracle match."""
    from sidecar_spark.functions.dedup import hash60

    path = _materialize_text_lines(spark, sf_dir, single=False)
    lines = spark.read.text(path)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
        F.sum(hash60(F.col("value")) % 1000000007).alias("checksum"))


@query(
    "text_source_wholetext",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(strlen(text) + 1) AS BIGINT) AS file_bytes
    FROM documents
    """,
)
def text_source_wholetext(spark, sf_dir):
    """``wholetext=true``: one row per FILE instead of per line — how
    document-level formats (one story/article per file) enter a
    pipeline without losing their internal newlines.  The export is
    coalesced to a single file, so the source must deliver exactly
    one row carrying every byte; line count and byte count are then
    recovered from inside the payload and must equal the per-row
    truth.  The scale contract differs from the line reader: wholetext
    files are NOT splittable (one task per file), so at 100 TB the
    unit of parallelism is the file count, never the byte count."""
    path = _materialize_text_lines(spark, sf_dir, single=True)
    # NOTE: reader.option("wholetext", ...).text(path) is silently
    # overridden by .text()'s own keyword defaults - pass the kwarg
    whole = spark.read.text(path, wholetext=True)
    return whole.agg(
        F.sum(F.size(F.split(F.col("value"), "\n")) - 1).alias("n_lines"),
        F.sum(F.length("value")).alias("file_bytes"))


def _exec_engine(spark):
    """The shared executor-mode Engine the raw-file entries read
    through (same cache root as the other executor entries — warm
    across the battery, like a long-lived cluster's node mirror)."""
    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    return Engine(spark, conf=conf)


@query(
    "executor_binaryfile_read_agg",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(strlen(text) + 1) AS BIGINT) AS total_bytes,
           CAST(count(*) AS BIGINT) AS n_verified
    FROM documents
    WHERE doc_id % 25 = 0
    """,
)
def executor_binaryfile_read_agg(spark, sf_dir):
    """``binaryFile`` through the CACHED executor source (round-8
    verdict #1: the reference caches every ``open()`` —
    ``SidecarCachingFileSystem.java:1596-1619`` — and binaryFile is
    the multimodal-corpus ingest format). Each scan task resolves its
    file against the node-local mirror and emits the JVM's exact row
    shape: ORIGINAL path rendering, listing mtime, length, raw bytes
    (all probed, sources/cached_rawfile.py). pathGlobFilter +
    recursiveFileLookup ride natively. Every payload is byte-verified
    against the table of record, so the aggregate proves content
    fidelity THROUGH the cache, not just file counts."""
    path = _materialize_doc_files(spark, sf_dir, 25)
    docs = (t(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 25 == 0)
            .select("doc_id", "text"))
    eng = _exec_engine(spark)
    files = eng.read_format(path, "binaryFile",
                            pathGlobFilter="part-*",
                            recursiveFileLookup="true")
    parsed = files.select(
        F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("long")
         .alias("doc_id"),
        F.col("length").alias("nbytes"),
        F.decode("content", "UTF-8").alias("payload"))
    return (parsed.join(docs, "doc_id")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("nbytes").alias("total_bytes"),
                 F.sum(F.when(F.col("payload")
                              == F.concat(F.col("text"), F.lit("\n")), 1)
                       .otherwise(0)).alias("n_verified")))


@query(
    "executor_text_read_agg",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(strlen(text)) AS BIGINT) AS total_chars,
           CAST(max(strlen(text)) AS BIGINT) AS max_len,
           CAST(sum({_H60.format(e='text')} % 1000000007) AS BIGINT)
               AS checksum
    FROM documents
    """,
)
def executor_text_read_agg(spark, sf_dir):
    """``text`` through the CACHED executor source with a tiny
    byte-range split size — dozens of splits per file, each task
    applying Hadoop's line-assignment rule (a line belongs to the
    split containing its START) against its node-local resolve. The
    per-line checksum breaks on ANY framing error: a line lost,
    doubled, or split at a boundary changes the fold (round-8
    verdict #1; framing semantics probed in
    tests/test_cached_rawfile.py)."""
    from sidecar_spark.functions.dedup import hash60

    path = _materialize_text_lines(spark, sf_dir, single=False)
    eng = _exec_engine(spark)
    lines = eng.read_format(path, "text", split_bytes="65536")
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.max(F.length("value")).alias("max_len"),
        F.sum(hash60(F.col("value")) % 1000000007).alias("checksum"))


@query(
    "executor_csv_schema_read_agg",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def executor_csv_schema_read_agg(spark, sf_dir):
    """csv with an EXPLICIT user schema through the CACHED executor
    path (round-8 verdict #3): the cached text source supplies record
    framing (Hadoop line rules, BOM strip, blank-line skip — probed)
    and the JVM's own ``from_csv`` supplies value parsing — the same
    UnivocityParser the csv file source runs, so the parse matrix is
    parity-by-construction (tests/test_csv_json_schema.py). No
    inference, no refuse-to-guess conflict: the schema is the
    user's."""
    src = t(spark, sf_dir, "orders")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    # headerless fixture (header is a record-level option the
    # compose refuses — csv_roundtrip_agg's copy has one)
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_csvnh_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_csvnh_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        src.write.mode("overwrite").format("csv").save(loc)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in src.schema.fields)
    eng = _exec_engine(spark)
    od = eng.read_format(loc, "csv", schema=ddl)
    return od.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd")
        .alias("first_order"),
    )


@query(
    "executor_json_schema_read_agg",
    oracle="""
    SELECT n_nationkey % 5 AS bucket, count(*) AS n,
           CAST(sum(strlen(n_name)) AS BIGINT) AS name_chars
    FROM nation
    GROUP BY n_nationkey % 5
    """,
)
def executor_json_schema_read_agg(spark, sf_dir):
    """json-lines with an EXPLICIT user schema through the cached
    executor path — same compose as the csv entry (cached text
    framing + JVM JacksonParser via ``from_json``), proving the
    second half of round-8 verdict #3."""
    _materialize(spark, sf_dir, "nation", "json", {})
    try:
        mt = os.stat(os.path.join(sf_dir, "nation.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"nation_json_{mt}")
    eng = _exec_engine(spark)
    nt = eng.read_format(loc, "json",
                         schema="n_nationkey bigint, n_name string")
    return (nt.groupBy((F.col("n_nationkey") % 5).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.length("n_name")).alias("name_chars")))


@query(
    "cached_csv_header_read_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def cached_csv_header_read_agg(spark, sf_dir):
    """csv with ``header=true`` over GZIPPED files through the CACHED
    executor path — both round-9 additions in one read (verdict r8
    #4 + ADVICE r8 #1): the cached text source decompresses by codec
    extension and drops each file's first non-blank non-comment line
    (probed framing rules, tests/test_csv_header_comment.py +
    test_codec_text.py); the JVM's own ``from_csv`` parses the
    values. The fixture is Spark's OWN gzip csv WITH header, so both
    the codec bytes and the header convention are the JVM's."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_csvhgz_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_csvhgz_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        (src.write.mode("overwrite").format("csv")
         .option("header", "true").option("compression", "gzip")
         .save(loc))
    eng = _exec_engine(spark)
    od = eng.read_format(
        loc, "csv", header="true",
        schema="o_orderkey bigint, o_orderpriority string, "
               "o_totalprice double")
    return od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).cast("double")
        .alias("sum_price"),
    )


@query(
    "csv_multiline_read_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(length(o_orderpriority) + 6
                    + length(CAST(o_orderkey AS VARCHAR)))
                AS BIGINT) AS ml_chars,
           CAST(round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def csv_multiline_read_agg(spark, sf_dir):
    """csv ``multiLine=true`` through the CACHED executor path
    (VERDICT r9 #3): the fixture embeds a REAL newline inside a
    quoted field (``o_orderpriority || '\\n' || 'note-' ||
    o_orderkey``, written
    by Spark's own csv writer, so the quoting convention is the
    JVM's), and the cached text source's quote-aware record framing
    (``_csv_multiline_records`` — every boundary rule probed,
    tests/test_csv_multiline.py) reassembles the records before
    ``from_csv`` parses the values. The oracle recomputes the
    multi-line field's length arithmetically from the base table, so
    a hash match proves the embedded newlines round-tripped
    byte-exactly. Scale shape: multiLine files are never split (the
    JVM's own rule), but small files bin-pack into shared tasks and
    each task frames its files node-locally — no driver bytes."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat_ws("\n", "o_orderpriority",
                    F.concat(F.lit("note-"),
                             F.col("o_orderkey").cast("string")))
        .alias("ml_note"),
        "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_csvml_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_csvml_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        (src.write.mode("overwrite").format("csv")
         .option("header", "true").save(loc))
    eng = _exec_engine(spark)
    od = eng.read_format(
        loc, "csv", multiLine="true", header="true",
        schema="o_orderkey bigint, ml_note string, "
               "o_totalprice double")
    return (od.groupBy(F.substring_index("ml_note", "\n", 1)
                       .alias("o_orderpriority"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.length("ml_note")).cast("bigint")
                 .alias("ml_chars"),
                 F.round(F.sum("o_totalprice"), 2).cast("double")
                 .alias("sum_price")))


@query(
    "csv_encoding_read_agg",
    oracle="""
    SELECT o_orderpriority || 'é' AS o_pri_acc,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority || 'é'
    """,
)
def csv_encoding_read_agg(spark, sf_dir):
    """Non-UTF8 csv through the CACHED executor path (VERDICT r9
    #4): the fixture is ISO-8859-1 csv WITH header written by Spark's
    own writer (so the 0xE9 byte for 'é' is the JVM's encoding), and
    the cached text source transcodes each framed line
    (replace-on-error, the probed Java CharsetDecoder behavior —
    tests/test_csv_encoding.py) before ``from_csv`` parses the
    values. The oracle concatenates the accent in UTF-8 SQL, so a
    hash match proves the latin-1 byte decoded through the cache to
    the identical code point. Scale shape: byte-level framing keeps
    the file SPLITTABLE (probed — unlike lineSep/multiLine files);
    per-line decode is a C call per line, no driver work."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(F.col("o_orderpriority"), F.lit("é"))
        .alias("o_pri_acc"),
        "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_csvlat_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_csvlat_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        (src.write.mode("overwrite").format("csv")
         .option("header", "true").option("encoding", "ISO-8859-1")
         .save(loc))
    eng = _exec_engine(spark)
    od = eng.read_format(
        loc, "csv", encoding="ISO-8859-1", header="true",
        schema="o_orderkey bigint, o_pri_acc string, "
               "o_totalprice double")
    return (od.groupBy("o_pri_acc")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).cast("double")
                 .alias("sum_price")))


@query(
    "ignore_corrupt_files_read",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ignore_corrupt_files_read(spark, sf_dir):
    """``ignoreCorruptFiles`` through the CACHED executor path
    (VERDICT r9 #7): the fixture is the orders table rewritten as
    parquet with a PLANTED corrupt file (truncated copy of a real
    part file, path-sorted LAST so the head-file schema inference
    stays valid — the probed JVM rule) — the scan must serve every
    good row and skip the corrupt file exactly like FileScanRDD
    (tests/test_ignore_files.py for the full probed matrix: partial
    rows kept, missing-file stat gates, inference head-file rule).
    At 100 TB objects vanish and uploads half-land mid-job; per-file
    skip in the task, no driver coordination."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_icf_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_icf_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        src.write.mode("overwrite").parquet(loc)
        part = sorted(_glob.glob(os.path.join(loc,
                                              "part-*.parquet")))[0]
        with open(part, "rb") as f:
            head = f.read(max(64, os.path.getsize(part) // 2))
        with open(os.path.join(loc, "zzz-corrupt.parquet"),
                  "wb") as f:
            f.write(head)
    eng = _exec_engine(spark)
    od = eng.read_format(loc, "parquet", ignoreCorruptFiles="true")
    return (od.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).cast("double")
                 .alias("sum_price")))


@query(
    "json_multiline_read_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
           CAST(sum(length(n_name)) AS BIGINT) AS name_chars
    FROM nation
    GROUP BY n_regionkey
    """,
)
def json_multiline_read_agg(spark, sf_dir):
    """json ``multiLine=true`` through the CACHED executor path
    (round 10): one pretty-printed top-level JSON ARRAY file per
    region (records span many physical lines), parsed by the
    composed wholetext + array-schema ``from_json`` path — every
    document-shape rule probed in tests/test_json_multiline.py. The
    oracle recomputes from the base nation table, so a hash match
    proves the multi-line documents reassembled exactly. Scale
    shape: one never-split task per document file (the JVM's own
    rule), bin-packed when small; parse stays JVM-side."""
    import json as _json

    try:
        mt = os.stat(os.path.join(sf_dir, "nation.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"nation_jsonml_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "nation_jsonml_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        rows = (t(spark, sf_dir, "nation")
                .select("n_nationkey", "n_name", "n_regionkey")
                .collect())  # 25 rows — bounded fixture build
        os.makedirs(loc, exist_ok=True)
        by_region = {}
        for r in sorted(rows, key=lambda r: r.n_nationkey):
            by_region.setdefault(r.n_regionkey, []).append(
                {"n_nationkey": r.n_nationkey, "n_name": r.n_name,
                 "n_regionkey": r.n_regionkey})
        for rk, docs in by_region.items():
            with open(os.path.join(loc, f"region-{rk}.json"),
                      "w") as f:
                _json.dump(docs, f, indent=2)
        with open(os.path.join(loc, "_SUCCESS"), "w"):
            pass
    eng = _exec_engine(spark)
    nt = eng.read_format(
        loc, "json", multiLine="true",
        schema="n_nationkey bigint, n_name string, "
               "n_regionkey bigint")
    return (nt.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.sum("n_nationkey").cast("bigint").alias("sum_key"),
                 F.sum(F.length("n_name")).cast("bigint")
                 .alias("name_chars")))


@query(
    "executor_binaryfile_png_decode",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_imgs,
           CAST(sum(3 + doc_id % 6) AS BIGINT) AS sum_w,
           CAST(sum(2 + doc_id % 5) AS BIGINT) AS sum_h,
           round(sum((doc_id % 256) / 255.0), 4) AS sum_luma
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def executor_binaryfile_png_decode(spark, sf_dir):
    """The full multimodal INGEST loop through the cache: spec-valid
    PNG FILES on disk (one per selected document, constant-gray,
    dimensions/fill derived from doc_id) → the CACHED executor
    binaryFile source (each task resolves its file against the node
    mirror) → the REAL pixel decoder (``extract_image_features``,
    PIL when importable else the stdlib zlib+unfilter path) inside
    mapInPandas. The oracle recomputes width/height/luma
    arithmetically, so the hash match proves actual pixels decoded
    THROUGH the cache — the crawl-drop-to-features pipeline shape at
    100 TB (files split across tasks, no shuffle before the 1-row
    aggregate)."""
    from sidecar_spark.functions import multimodal as M

    try:
        mt = os.stat(os.path.join(sf_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"pngfiles_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "pngfiles_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        os.makedirs(loc, exist_ok=True)
        ids = [r.doc_id for r in
               (t(spark, sf_dir, "documents")
                .where(F.col("doc_id") % 10 == 0)
                .select("doc_id").collect())]
        for i in ids:
            with open(os.path.join(loc, f"img_{i:08d}.png"),
                      "wb") as f:
                f.write(M.synthesize_png(3 + i % 6, 2 + i % 5,
                                         i % 256))
        with open(os.path.join(loc, "_SUCCESS"), "wb"):
            pass
    eng = _exec_engine(spark)
    files = eng.read_format(loc, "binaryFile",
                            pathGlobFilter="img_*.png")
    payloads = files.select(
        F.regexp_extract("path", r"img_(\d+)\.png", 1).cast("long")
         .alias("doc_id"),
        F.col("content").alias("payload"))
    feats = M.extract_image_features(payloads, fake=False)
    return feats.agg(
        F.count(F.lit(1)).alias("n_imgs"),
        F.sum("width").alias("sum_w"),
        F.sum("height").alias("sum_h"),
        F.round(F.sum("mean_luma"), 4).alias("sum_luma"))


@query(
    "executor_image_neardup_pipeline",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, doc_id % 16 AS base FROM documents
      WHERE doc_id % 9 = 0
    ), bits AS (
      -- pixel(x,y) = (base*7 + x*13 + y*31) % 256 on the 8x8 grid;
      -- aHash bit p (p = y*8+x) = pixel > mean(pixels)
      SELECT i.doc_id, i.base, g.p,
             CASE WHEN (i.base * 7 + (g.p % 8) * 13 + (g.p // 8) * 31)
                       % 256 >
                  (SELECT avg((i.base * 7 + (h.q % 8) * 13
                               + (h.q // 8) * 31) % 256)
                   FROM generate_series(0, 63) h(q))
                  THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM imgs i CROSS JOIN generate_series(0, 62) g(p)
    ), hashes AS (
      SELECT doc_id, CAST(sum(bit << p) AS BIGINT) AS ahash
      FROM bits GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, ahash, g.b AS band_idx,
             (ahash >> (16 * g.b)) & 65535 AS bv
      FROM hashes CROSS JOIN generate_series(0, 3) g(b)
    ), cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.ahash AS ha, b.ahash AS hb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.bv = b.bv
       AND a.doc_id < b.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_near_pairs,
           CAST(count(DISTINCT doc_a) AS BIGINT) AS n_left_docs,
           CAST(coalesce(sum(bit_count(xor(ha, hb))), 0) AS BIGINT)
               AS hamming_total
    FROM cands WHERE bit_count(xor(ha, hb)) <= 6
    """,
)
def executor_image_neardup_pipeline(spark, sf_dir):
    """The FULL LLM-corpus image story on the cached executor path —
    ingest → decode → near-dup — in one oracle-checked read (VERDICT
    r8 #6): patterned 8×8 PNG FILES on disk (pixel = (base·7 + x·13 +
    y·31) mod 256, base = doc_id mod 16) flow through the CACHED
    ``binaryFile`` source (each task resolves its file against ITS
    node's mirror; the plan moves path+content only), are decoded to
    pixels by the real PNG decoder inside mapInPandas, aHashed
    (bit = pixel > image mean), banded 4×16-bit (pigeonhole: any pair
    within Hamming ≤ 6 of 63 bits shares a band) and verified with
    ``bit_count(xor)`` — the same shape MinHash-LSH gives text. The
    oracle recomputes every aHash bit arithmetically from the
    synthesis formula, so a hash match proves REAL pixels moved
    through cache → decode → join. At 100 TB: one task per image
    file, map-side hashing, band equi-join — never all-pairs."""
    from sidecar_spark.functions import multimodal as M

    try:
        mt = os.stat(os.path.join(sf_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"ndpngs_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil

        import numpy as np
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "ndpngs_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        os.makedirs(loc, exist_ok=True)
        ids = [r.doc_id for r in
               (t(spark, sf_dir, "documents")
                .where(F.col("doc_id") % 9 == 0)
                .select("doc_id").collect())]
        x = np.arange(8)
        for i in ids:
            base = i % 16
            px = ((base * 7 + x[None, :] * 13 + x[:, None] * 31)
                  % 256).astype(np.uint8)
            with open(os.path.join(loc, f"nd_{i:08d}.png"),
                      "wb") as f:
                f.write(M.encode_png_gray(px))
        with open(os.path.join(loc, "_SUCCESS"), "wb"):
            pass
    eng = _exec_engine(spark)
    files = eng.read_format(loc, "binaryFile",
                            pathGlobFilter="nd_*.png")
    payloads = files.select(
        F.regexp_extract("path", r"nd_(\d+)\.png", 1).cast("long")
         .alias("doc_id"),
        F.col("content").alias("payload"))

    def decode_hash(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                a = M.decode_image_array(bytes(payload))  # real decode
                bits = (a.astype("float64") > a.mean()).flatten()
                # 63-bit aHash: bit 63 would overflow signed int64
                hashes.append(int(sum(1 << p for p, v in
                                      enumerate(bits[:63]) if v)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "ahash": pd.array(hashes,
                                                  dtype="int64")})

    hashes = payloads.mapInPandas(decode_hash,
                                  "doc_id long, ahash long")
    banded = hashes.select(
        "doc_id", "ahash",
        F.posexplode(F.array(*[
            F.shiftright("ahash", 16 * b).bitwiseAND(F.lit(65535))
            for b in range(4)])).alias("band_idx", "bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.ahash").alias("ha"),
                F.col("b.ahash").alias("hb"))
        .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    near = cands.where(ham <= 6)
    return near.agg(
        F.count(F.lit(1)).alias("n_near_pairs"),
        F.countDistinct("doc_a").alias("n_left_docs"),
        F.coalesce(F.sum(ham), F.lit(0)).cast("bigint")
        .alias("hamming_total"))


@query(
    "orc_user_schema_read",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(n_nationkey AS BIGINT)) AS BIGINT)
               AS key_sum,
           CAST(sum(CASE WHEN n_regionkey BETWEEN -128 AND 127
                         THEN n_regionkey END) AS BIGINT)
               AS narrow_sum,
           CAST(round(sum(CAST(n_nationkey AS DOUBLE) + 0.0), 2)
                AS DOUBLE) AS dec_sum
    FROM nation
    """,
)
def orc_user_schema_read(spark, sf_dir):
    """ORC with an EXPLICIT user schema through the CACHED executor
    path (round-9 verdict #5): the engine's footer gate admits only
    conversions in the live-probed ORC matrix
    (``cached_orc._orc_cast_gate`` — int widening exact, narrowing
    NULL on overflow, int→decimal, ...; everything else routes to the
    raw JVM scan). This entry exercises widening (int→bigint),
    narrowing (int→tinyint, all in range at any SF: regionkey < 5)
    and int→decimal in one declared schema
    (tests/test_orc_user_schema.py holds the full matrix)."""
    _materialize(spark, sf_dir, "nation", "orc", {})
    try:
        mt = os.stat(os.path.join(sf_dir, "nation.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"nation_orc_{mt}")
    eng = _exec_engine(spark)
    nt = eng.read_format(
        loc, "orc",
        schema="n_nationkey decimal(12,2), n_regionkey tinyint, "
               "n_name string")
    return nt.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_nationkey").cast("bigint")).alias("key_sum"),
        F.sum(F.col("n_regionkey").cast("bigint")).alias("narrow_sum"),
        F.round(F.sum("n_nationkey"), 2)
        .cast("double").alias("dec_sum"),
    )


@query(
    "executor_orc_statprune_agg",
    oracle="""
    SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def executor_orc_statprune_agg(spark, sf_dir):
    """ORC stripe-STATISTICS pruning in the executor scan (round-8):
    the pushed ``o_orderkey <= 1000`` reaches the cached ORC source
    and ``sources/orc_stats.py`` — a manual parse of the file's
    metadata protobuf (pyarrow exposes no stripe-stats API) — skips
    every stripe whose min/max provably fail it. On this
    orderkey-sorted multi-stripe ZSTD table that is all but the head
    stripe(s): measured 7.5× at 0.8% selectivity (BASELINE.md), the
    parquet row-group analog on the #2 lake format. Filters stay
    residual, so pruning can only skip provably-empty stripes; the
    count/sum pair would catch any over-pruned row."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_orcsorted_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_orcsorted_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        (src.orderBy("o_orderkey").coalesce(1).write
         .option("orc.stripe.size", 262144).format("orc").save(loc))
    eng = _exec_engine(spark)
    o = eng.read_format(loc, "orc")
    return (o.where(F.col("o_orderkey") <= 1000)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("key_sum"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@query(
    "executor_wholetext_read",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(strlen(text) + 1) AS BIGINT) AS file_bytes
    FROM documents
    """,
)
def executor_wholetext_read(spark, sf_dir):
    """``wholetext=true`` through the cached executor source: one row
    per FILE carrying every byte (one task per file — wholetext is
    not splittable, the JVM rule), resolved node-locally. Line and
    byte counts recovered from inside the payload must equal the
    per-row truth, proving no byte was lost or reframed through the
    mirror."""
    path = _materialize_text_lines(spark, sf_dir, single=True)
    eng = _exec_engine(spark)
    whole = eng.read_format(path, "text", wholetext="true")
    return whole.agg(
        F.sum(F.size(F.split(F.col("value"), "\n")) - 1).alias("n_lines"),
        F.sum(F.length("value")).alias("file_bytes"))


@query(
    "parallel_listing_read_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def parallel_listing_read_agg(spark, sf_dir):
    """A many-file hive tree read through the DISTRIBUTED listing
    path (round 10, VERDICT r9 #1): orders written as 40 hive
    partitions x ~40 files each (~1.6k objects). 40 subdirectories
    exceed ``spark.sidecar.parallelListing.threshold`` (32 — the
    JVM's parallelPartitionDiscovery threshold), so the Engine fans
    the recursive LIST out as a Spark job
    (``CacheManager.maybe_list_files_job``) and ships the listing to
    the plan worker as a manifest; the scan then aggregates across
    every partition, so a single missing/duplicated file breaks the
    hash match. At 100 TB this is the path that keeps a
    multi-million-object prefix from serializing its LIST on the
    driver."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    try:
        mt = os.stat(os.path.join(sf_dir, "orders.parquet")).st_mtime_ns
    except OSError:
        mt = 0
    loc = os.path.join(_ROOT, _tag(sf_dir), f"orders_ptree_{mt}")
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        import glob as _glob
        import shutil as _shutil
        for old in _glob.glob(os.path.join(
                _ROOT, _tag(sf_dir), "orders_ptree_*")):
            if old != loc:
                _shutil.rmtree(old, ignore_errors=True)
        (src.withColumn("pk", F.col("o_orderkey") % 40)
         .repartition(40)
         .write.mode("overwrite").partitionBy("pk").parquet(loc))
    eng = _exec_engine(spark)
    od = eng.read_format(loc, "parquet")
    return od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).cast("double")
        .alias("sum_price"),
    )
