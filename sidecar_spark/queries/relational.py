"""Relational operator battery over the TPC-H-ish testdata.

The reference has NO relational operators (SURVEY.md §2.7) — its
"queries" are FS calls and the engine on top supplies the algebra. In
this repo Spark SQL is that engine; each entry demonstrates one
operator family end-to-end with a DuckDB oracle.

Conventions for oracle hash parity:
* every computed column is aliased identically on both sides;
* money aggregates round to 2 decimals, averages to 6 (absorbs
  float summation-order differences between engines);
* temporal outputs are formatted to strings (Spark timestamps are
  session-TZ objects, DuckDB's are naive — strings compare equal);
* LIMIT queries carry a total tie-break order.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Window as W
import pandas as pd
from pyspark.sql import functions as F

from sidecar_spark.queries.registry import query, t

DATE_FMT = "yyyy-MM-dd"


def _dt(col):
    return F.date_format(col, DATE_FMT)


def money(col):
    return F.round(col, 2)


# ---------------------------------------------------------------------------
# scan / filter / project — predicate pushdown + column pruning path
# ---------------------------------------------------------------------------

@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price,
           strftime(l_shipdate, '%Y-%m-%d') AS shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_quantity >= 45.0
    """,
)
def scan_filter_project(spark, sf_dir):
    """Pushdown test: the parquet scan must show PushedFilters for both
    predicates and ReadSchema limited to 4 columns."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
                 & (F.col("l_quantity") >= 45.0))
        .select(
            "l_orderkey", "l_linenumber",
            money("l_extendedprice").alias("price"),
            _dt("l_shipdate").alias("shipdate"),
        )
    )


@query(
    "cached_read_agg",
    oracle="""
    SELECT l_linestatus, count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def cached_read_agg(spark, sf_dir):
    """The I/O capability port under the oracle gate: this scan goes
    through Engine.table — CacheManager resolves the file list, admits
    and materializes it into the local mirror (cold) or serves the
    mirror path (warm) — and must be indistinguishable from a direct
    read. Repeated driver/bench runs hit the warm path."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    li = eng.table("lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "executor_resolved_agg",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def executor_resolved_agg(spark, sf_dir):
    """The real-cluster read path under the oracle gate
    (sidecar.resolve.mode = executor, sources/cached_parquet.py): the
    scan is a Python DataSource whose every TASK resolves its one file
    hit-or-materialize-or-remote against the node-local CacheManager —
    the partition-local resolve of the FileMirror multi-node design
    (SidecarCachingFileSystem.java:96-119 per-node singletons) — and
    must be value-indistinguishable from the JVM-native scan."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    od = eng.table("orders")
    return od.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd")
        .alias("first_order"),
    )


@query(
    "page_cached_scan_agg",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def page_cached_scan_agg(spark, sf_dir):
    """PAGE tier serving a real Spark scan (verdict r4 #7): the
    mirror is sized down so the file-level veto fires, and the
    executor-resolved scan streams through the node-local
    ``CachingInputStream`` instead — parquet footer + column-chunk
    ranges land in the page store (``readInternal``,
    SidecarCachingInputStream.java:796-877), so the repeat run serves
    pages locally. tests/test_executor_resolve.py proves the stats
    delta; this entry proves the values."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-pages"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor",
        mirror_size=16,                 # veto: too small for any table
        data_cache_size=256 * 1024 * 1024)  # healthy page store
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    cu = eng.table("customer")
    return cu.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


@query(
    "executor_projected_agg",
    oracle="""
    SELECT l_returnflag, count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def executor_projected_agg(spark, sf_dir):
    """Explicit column projection through the executor-resolved scan
    (round-6): pyspark 4.1's DataSource API has no automatic prune
    hook, so ``Engine.table(columns=[...])`` shrinks the declared
    schema and every task reads ONLY those parquet column chunks —
    lineitem's other 14 columns never cross the Arrow boundary. At
    100 TB this is the difference between scanning 2 columns and 16.
    tests/test_executor_resolve.py::TestColumnsProjection proves the
    batches carry only the requested columns; this entry proves the
    values."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    li = eng.table("lineitem", columns=["l_returnflag", "l_quantity"])
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "executor_split_scan_agg",
    oracle="""
    SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def executor_split_scan_agg(spark, sf_dir):
    """Byte-range split InputPartitions (round-6): a file larger than
    split_bytes becomes multiple scan tasks, each reading the row
    groups whose midpoint falls in its range — Spark's own parquet
    split rule, so splits are disjoint and complete and one big or
    skewed file no longer serializes on a single task. The tiny split
    size here forces many splits over lineitem; the count/sum/distinct
    triple would catch any dropped or double-read row group. The
    split size rides as a per-READ option — no shared-session-conf
    mutation (round-6 verdict nit #2)."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    li = eng.read_parquet(
        _os.path.join(sf_dir, "lineitem.parquet"), split_bytes="262144")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "executor_mergeschema_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, count(region_tag) AS n_tagged,
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
def executor_mergeschema_agg(spark, sf_dir):
    """mergeSchema=true through the EXECUTOR-resolved scan (round-6
    verdict #1): the Python source declares the union of ALL footers
    in path order with the JVM's merge semantics (probed: appended
    columns, case-insensitive match, decimal same-scale widening,
    CANNOT_MERGE_SCHEMAS otherwise) and each task null-fills what its
    file lacks — so the first option a real lake user passes now
    stays on the CACHED real-cluster path instead of falling back to
    a raw remote read. The file names force old-file-first path
    order; the oracle reconstructs the evolution with UNION ALL BY
    NAME."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from sidecar_spark import Engine, SidecarConfig

    out = _tempfile.mkdtemp(prefix="sidecar-exec-merge-")
    try:
        o = t(spark, sf_dir, "orders")

        def write_one(df, name):
            stage = _os.path.join(out, "_stage")
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(f for f in _os.listdir(stage)
                        if f.endswith(".parquet"))
            _os.replace(_os.path.join(stage, part),
                        _os.path.join(out, name))
            _shutil.rmtree(stage)

        write_one(o.where(F.col("o_orderkey") < 10000)
                  .select("o_orderpriority", "o_totalprice"),
                  "a_old.parquet")
        write_one(o.where(F.col("o_orderkey") >= 10000)
                  .select("o_orderpriority", "o_totalprice",
                          F.concat(F.lit("r"), (F.col("o_custkey") % 5)
                                   .cast("string")).alias("region_tag")),
                  "b_new.parquet")
        conf = SidecarConfig.create(
            cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
            data_cache_type="file", cache_persistent=False,
            resolve_mode="executor")
        eng = Engine(spark, conf=conf)
        merged = eng.read_parquet(out, mergeSchema="true")
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
        _shutil.rmtree(out, ignore_errors=True)


@query(
    "executor_statprune_scan_agg",
    oracle="""
    SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def executor_statprune_scan_agg(spark, sf_dir):
    """Row-group min/max statistics pruning in the executor scan
    (round-6 verdict #2): the pushed ``o_orderkey <= 1000`` reaches
    the Python source via pushFilters and _stat_prune skips every row
    group whose statistics provably fail it — on this orderkey-sorted
    table that is all but the first group(s), the JVM scan's own
    row-group filtering re-expressed. Every filter stays residual, so
    pruning can only skip provably-empty groups; the count/sum pair
    would catch any over-pruned row."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    o = eng.table("orders")
    return (o.where(F.col("o_orderkey") <= 1000)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("key_sum"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@query(
    "executor_orc_read_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT)
           AS key_sum
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def executor_orc_read_agg(spark, sf_dir):
    """ORC through the EXECUTOR-resolved cached scan (round-7): the
    nation table is rewritten as ORC and read via
    sources/cached_orc.py — the parquet source's node-local resolve
    with an ORC footer/stripe decode (schema parity derivable: ORC is
    self-describing; timestamps zoned UTC, catalyst-metadata ntz).
    The reference caches every format because it IS a FileSystem;
    this keeps the #2 lake format on the cached real-cluster path."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from sidecar_spark import Engine, SidecarConfig

    out = _tempfile.mkdtemp(prefix="sidecar-exec-orc-")
    try:
        t(spark, sf_dir, "nation").coalesce(1) \
            .write.mode("overwrite").orc(out)
        conf = SidecarConfig.create(
            cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
            data_cache_type="file", cache_persistent=False,
            resolve_mode="executor")
        eng = Engine(spark, conf=conf)
        rows = (eng.read_format(out, "orc")
                .groupBy("n_regionkey")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("n_nationkey").alias("key_sum"))
                .orderBy("n_regionkey")
                .collect())
        return spark.createDataFrame(
            rows, "n_regionkey int, n bigint, key_sum bigint")
    finally:
        _shutil.rmtree(out, ignore_errors=True)


@query(
    "executor_legacy_rebase_read",
    oracle="""
    SELECT strftime(CAST(o_orderdate AS DATE) - 160000, '%Y') AS yr,
           count(*) AS n,
           strftime(min(CAST(o_orderdate AS DATE) - 160000),
                    '%Y-%m-%d') AS first_d,
           strftime(max(CAST(o_orderdate AS DATE) - 160000),
                    '%Y-%m-%d') AS last_d
    FROM orders
    WHERE o_orderkey <= 2000
    GROUP BY 1
    ORDER BY 1
    """,
)
def executor_legacy_rebase_read(spark, sf_dir):
    """LEGACY-rebase parquet through the executor scan (round-7 probe
    find): Spark writes ancient dates in the hybrid Julian calendar
    under datetimeRebaseModeInWrite=LEGACY and rebases them back on
    read; the Python source must rebase identically
    (sources/rebase.py) or every pre-1582 label shifts by 9-10 days —
    the write+read roundtrip is label-identity, so the oracle simply
    recomputes the labels from the base table and any missed rebase
    hash-mismatches. Dates land in the 1550s (orderdate − 160000
    days), squarely pre-Gregorian."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from sidecar_spark import Engine, SidecarConfig

    out = _tempfile.mkdtemp(prefix="sidecar-legacy-rebase-")
    try:
        o = (t(spark, sf_dir, "orders")
             .where(F.col("o_orderkey") <= 2000)
             .select(F.date_sub("o_orderdate", 160000).alias("d")))
        spark.conf.set(
            "spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
        try:
            o.coalesce(1).write.mode("overwrite").parquet(out)
        finally:
            spark.conf.unset(
                "spark.sql.parquet.datetimeRebaseModeInWrite")
        conf = SidecarConfig.create(
            cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
            data_cache_type="file", cache_persistent=False,
            resolve_mode="executor")
        eng = Engine(spark, conf=conf)
        rows = (eng.read_parquet(out)
                .groupBy(F.date_format("d", "yyyy").alias("yr"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.date_format(F.min("d"), "yyyy-MM-dd")
                     .alias("first_d"),
                     F.date_format(F.max("d"), "yyyy-MM-dd")
                     .alias("last_d"))
                .orderBy("yr")
                .collect())
        return spark.createDataFrame(
            rows, "yr string, n bigint, first_d string, last_d string")
    finally:
        _shutil.rmtree(out, ignore_errors=True)


@query(
    "partitioned_typed_read",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def partitioned_typed_read(spark, sf_dir):
    """Date-TYPED hive partition columns through the executor-resolved
    scan (round-6 parity edge): the table is laid out as
    ``mon=1995-03-01/...`` directories, and partition discovery must
    infer DateType for them exactly as the JVM's
    inferPartitionColumnValue ladder does (cache/partitions.py,
    JVM-probed) — grouping by the partition column under the oracle
    gate proves type and values both survive the executor-mode
    rebuild."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    dest = f"/tmp/sidecar-engine-write/{tag}/orders_by_month"
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        base = eng.table("orders").withColumn(
            "mon", _dt(F.date_trunc("month", F.col("o_orderdate"))))
        eng.write(base, dest, partition_by=["mon"])
    df = eng.read_parquet(dest)
    # the partition column must come back as a real DATE (not string)
    # — a ladder regression fails here, not just cosmetically
    assert dict(df.dtypes)["mon"] == "date", dict(df.dtypes)
    return (
        df.groupBy(_dt("mon").alias("mon"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "cached_csv_read_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def cached_csv_read_agg(spark, sf_dir):
    """Format-agnostic cached reads (round-6): the reference caches
    EVERY file type — it is a FileSystem — so ``Engine.read_format``
    resolves csv/json/orc/... through the same mirror as parquet.
    orders is materialized to CSV once, read back through the cache
    with header+schema options, and must aggregate identically to the
    parquet original the oracle reads."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    dest = f"/tmp/sidecar-engine-write/{tag}/orders_csv"
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        (eng.table("orders")
         .select("o_orderpriority", "o_totalprice")
         .write.mode("overwrite").option("header", "true").csv(dest))
    df = eng.read_format(
        dest, "csv", header="true",
        schema="o_orderpriority string, o_totalprice double")
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"))


@query(
    "cached_orc_read_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           min(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
)
def cached_orc_read_agg(spark, sf_dir):
    """ORC through the cache (round-6, Engine.read_format): same
    mirror resolve as parquet, different decoder — proving the cache
    layer is format-blind exactly like the reference FS."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    dest = f"/tmp/sidecar-engine-write/{tag}/nation_orc"
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        eng.table("nation").write.mode("overwrite").orc(dest)
    df = eng.read_format(dest, "orc")
    return df.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"))


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 analog (flagship aggregation)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 analog: pure filter + global agg — all pushdown-able."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)        AS n_customers,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS sum_price,
           round(avg(o_totalprice), 6)      AS avg_price,
           round(min(o_totalprice), 2)      AS min_price,
           round(max(o_totalprice), 2)      AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark, sf_dir):
    """Distinct aggregation (expands to a two-phase plan in Spark)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum("o_totalprice")).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        money(F.min("o_totalprice")).alias("min_price"),
        money(F.max("o_totalprice")).alias("max_price"),
    )


@query(
    "having_filter",
    oracle="""
    SELECT l_partkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 30
    """,
)
def having_filter(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_items"),
             money(F.sum("l_quantity")).alias("sum_qty"))
        .where(F.col("n_items") >= 30)
    )


# ---------------------------------------------------------------------------
# grouping sets: rollup & cube
# ---------------------------------------------------------------------------

@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        money(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        money(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 analog: 3-way join + agg + top-k. The customer side is
    a small dim → broadcast."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue"))
        .select("l_orderkey", "revenue", _dt("o_orderdate").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 analog: 6-way join; all dims broadcast, fact-side join
    keys drive the one shuffle."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1999-10-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "semi_join_exists",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def semi_join_exists(spark, sf_dir):
    """EXISTS → left-semi join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_join_not_exists",
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer c JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n_name
    """,
)
def anti_join_not_exists(spark, sf_dir):
    """NOT EXISTS → left-anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "exists_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0)
    GROUP BY o_orderpriority
    """,
)
def exists_agg(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS-guarded priority counts)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49.0)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

@query(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rk
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part)
    WHERE rk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-K per group via ranking window (scale path: this shuffles on
    p_brand only — no global sort)."""
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", money("p_retailprice").alias("price"), "rk")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        _dt("o_orderdate").alias("orderdate"),
        money(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 6) AS value_delta
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def window_lag_delta(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

@query(
    "set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_union(spark, sf_dir):
    a = (t(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING")
         .select(F.col("c_custkey").alias("custkey")))
    b = (t(spark, sf_dir, "orders")
         .where(F.col("o_totalprice") > 300000)
         .select(F.col("o_custkey").alias("custkey")))
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
    """,
)
def set_intersect(spark, sf_dir):
    a = (t(spark, sf_dir, "customer")
         .where(F.col("c_acctbal") > 5000)
         .select(F.col("c_custkey").alias("custkey")))
    b = (t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")))
         .select(F.col("o_custkey").alias("custkey")))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark, sf_dir):
    a = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    b = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status(spark, sf_dir):
    """Pivot (Spark's .pivot compiles to conditional aggregation —
    the oracle spells out the CASE form)."""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


# ---------------------------------------------------------------------------
# event-stream analytics (batch over the stream-shaped table)
# ---------------------------------------------------------------------------

@query(
    "events_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation (batch analog of the
    streaming window operator; see sidecar_spark.streaming for the
    readStream version)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "sum_value", "n_users",
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap → session id via
    lag + cumulative sum (single shuffle on user_id; both windows and
    the final groupBy share the partitioning)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        e.withColumn("new_session",
                     F.when(gap_us > 1800 * 1_000_000, 1).otherwise(0))
        .withColumn("session_id",
                    F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            money(F.sum("value")).alias("session_value"),
        )
    )


@query(
    "events_rollup_hierarchy",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def events_rollup_hierarchy(spark, sf_dir):
    """Hierarchical (hypertable-style) rollup: the daily aggregate is
    computed FROM the hourly aggregate (counts add, sums add), not from
    raw events — the continuous-aggregate pattern where each coarser
    resolution reaggregates the finer one at 1/24th the input. The
    oracle aggregates raw events directly; equality IS the
    reaggregation-correctness check."""
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("h")).alias("d"), "event_type")
        .agg(F.sum("n").alias("n_events"), money(F.sum("v")).alias("sum_value"))
        .select(F.date_format("d", DATE_FMT).alias("day"),
                "event_type", "n_events", "sum_value")
    )


@query(
    "asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM events e
    ASOF JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join(spark, sf_dir):
    """As-of join (Spark lacks a native one — composed as join +
    max-per-key, which Catalyst executes as one shuffle + partial agg;
    DuckDB's native ASOF JOIN is the oracle).

    For each event: the most recent order of that user at-or-before
    the event time. Only the matched *time* is emitted — tie rows on
    the same max(o_orderdate) are therefore irrelevant."""
    e = t(spark, sf_dir, "events")
    o = t(spark, sf_dir, "orders")
    joined = e.join(
        F.broadcast(o),
        (e.user_id == o.o_custkey) & (e.ts >= o.o_orderdate),
        "inner",
    )
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(F.max("o_orderdate").alias("last_od"))
        .select(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            _dt("last_od").alias("last_orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# sort / limit (global order)
# ---------------------------------------------------------------------------

@query(
    "global_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def global_topk(spark, sf_dir):
    """Global top-K: Spark executes orderBy+limit as TakeOrderedAndProject
    (per-partition top-K + driver merge — no full sort, scale-safe)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", money("o_totalprice").alias("totalprice"),
                _dt("o_orderdate").alias("orderdate"))
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_elem,
           round(embedding[len(embedding)]::DOUBLE, 6) AS last_elem,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(list_sum(list_transform(embedding[1:8],
                                         x -> x::DOUBLE)), 6) AS head_sum,
           round(list_max(list_transform(embedding,
                                         x -> abs(x::DOUBLE))), 6) AS max_abs
    FROM embeddings
    """,
)
def array_functions(spark, sf_dir):
    """Array-function family over the embedding column: size,
    element_at (head/tail), filter-count, slice+fold, transform+max —
    all JVM-side column math (the array never leaves Tungsten rows,
    no explode)."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_elem"),
        F.round(F.element_at(v, -1), 6).alias("last_elem"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(F.aggregate(F.slice(v, 1, 8), F.lit(0.0),
                            lambda acc, x: acc + x), 6).alias("head_sum"),
        F.round(F.array_max(F.transform(v, F.abs)), 6).alias("max_abs"),
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           count(*) OVER w AS n_last_hour,
           round(sum(value) OVER w, 2) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_range_interval(spark, sf_dir):
    """RANGE-frame window over event time: per-user trailing-hour
    rolling count/sum — the time-based frame (ROWS frames count rows;
    RANGE frames measure the ORDER BY value). Spark expresses interval
    frames as rangeBetween over epoch seconds; partitioning by user
    keeps the sort local to each key (no global sort)."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(F.col("ts").cast("long"))
         .rangeBetween(-3600, 0))
    return e.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@query(
    "pandas_udf_zscore",
    oracle="""
    SELECT o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER p)
                 / stddev_samp(o_totalprice) OVER p, 6) AS price_z
    FROM orders
    WINDOW p AS (PARTITION BY o_orderpriority)
    """,
)
def pandas_udf_zscore(spark, sf_dir):
    """Vectorized Pandas UDF (Arrow-batched) as a first-class surface:
    z-score of each order's price within its priority class. The
    moments come from a JVM-side aggregate (broadcast back on the
    5-row priority dim); only the final arithmetic runs in the UDF —
    the pattern for custom math Spark lacks, at ~100× row-at-a-time
    Python UDF throughput. (Here the arithmetic IS expressible as a
    column op; the entry pins the UDF machinery itself — Arrow batch
    transfer, null passthrough, double precision — against the
    oracle.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zscore(x: pd.Series, mu: pd.Series, sd: pd.Series) -> pd.Series:
        return ((x - mu) / sd).round(6)

    o = t(spark, sf_dir, "orders")
    moments = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"))
    return (
        o.join(F.broadcast(moments), "o_orderpriority")
        .select("o_orderkey",
                zscore(F.col("o_totalprice"), F.col("mu"), F.col("sd"))
                .alias("price_z"))
    )


@query(
    "engine_write_roundtrip",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def engine_write_roundtrip(spark, sf_dir):
    """The write half of the I/O capability port under the oracle
    gate: Engine.write runs the dual-destination write (Spark commits
    the parquet 'remote', then the produced files are mirrored into
    the write cache and registered in the meta cache — SURVEY.md §3.2
    at file granularity), and the read back through Engine.read_parquet
    resolves against that same cache. Hash-parity with a direct query
    proves the mirrored write is lossless."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    dest = f"/tmp/sidecar-engine-write/{tag}/open_orders"
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        open_orders = eng.table("orders").where(F.col("o_orderstatus") == "O")
        eng.write(open_orders, dest)
    return (
        eng.read_parquet(dest)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "partitioned_roundtrip_agg",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def partitioned_roundtrip_agg(spark, sf_dir):
    """Hive-partitioned tables through the cached read path (round-5
    gap fix): Engine.write(partition_by=...) lays the table out as
    key=value directories, and the read back resolves through the
    mirror — partition COLUMNS live in those directory names, which
    flat resolved paths strip, so the engine rebuilds the structure as
    a content-addressed symlink view (cache/partitions.py) and lets
    Spark's own partition discovery and pruning run over it. Grouping
    by the PARTITION column under the oracle gate proves the columns
    and their values survive the cache."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    dest = f"/tmp/sidecar-engine-write/{tag}/orders_by_status"
    if not _os.path.exists(_os.path.join(dest, "_SUCCESS")):
        eng.write(eng.table("orders"), dest,
                  partition_by=["o_orderstatus"])
    return (
        eng.read_parquet(dest)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
             o_totalprice AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ), merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
    )
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM merged GROUP BY o_orderstatus
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE INTO / upsert without a table format: new snapshot =
    base ANTI JOIN updates ∪ updates — matched keys replaced, new
    keys inserted, one shuffle each side on the merge key. This is
    the incremental-maintenance primitive (CDC apply, late-correction
    backfill) a pipeline without Delta/Iceberg runs as a partition
    overwrite; the updates here are derived deterministically from the
    base so the oracle can rebuild the identical snapshot."""
    o = t(spark, sf_dir, "orders")
    upd = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey",
                F.lit("P").alias("o_orderstatus"),
                (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
                "o_orderdate", "o_orderpriority")
        .unionByName(
            o.where(F.col("o_orderkey") % 97 == 0)
            .select((F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                    "o_custkey", F.lit("N").alias("o_orderstatus"),
                    "o_totalprice",
                    "o_orderdate", "o_orderpriority"))
    )
    keys = upd.select("o_orderkey")
    merged = (
        o.join(keys, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .unionByName(upd.select("o_orderkey", "o_orderstatus", "o_totalprice"))
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"))


@query(
    "events_sliding_window",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM (
      SELECT event_type, value,
             to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                          - g.k * 1800) AS ws
      FROM events CROSS JOIN (VALUES (0), (1)) AS g(k))
    GROUP BY ws, event_type
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding (hopping) windows: 1-hour window every 30 minutes, so
    each event lands in exactly 2 overlapping windows. Spark's window()
    generates the assignment JVM-side; the oracle reconstructs the same
    epoch-aligned window starts arithmetically. The third window
    flavor next to tumbling and session."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


@query(
    "skew_key_profile",
    oracle="""
    WITH freq AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM freq)
    SELECT user_id, n,
           round(n * 1.0 / total, 6) AS share,
           round(n * n_keys * 1.0 / total, 6) AS skew_factor
    FROM freq CROSS JOIN tot
    ORDER BY n DESC, user_id
    LIMIT 20
    """,
)
def skew_key_profile(spark, sf_dir):
    """Hot-key diagnosis — the profiling query run before choosing a
    join strategy at scale: per-key frequency, share of total, and
    skew factor (ratio to the uniform expectation). Keys with
    skew_factor ≫ 1 are the ones that need salting or AQE skew-join
    (see skew_salted_join for the remediation)."""
    e = t(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("total"),
                   F.count(F.lit(1)).alias("n_keys"))
    return (
        freq.join(F.broadcast(tot))
        .select("user_id", "n",
                F.round(F.col("n") / F.col("total"), 6).alias("share"),
                F.round(F.col("n") * F.col("n_keys") / F.col("total"), 6)
                .alias("skew_factor"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "engine_sql_agg",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def engine_sql_agg(spark, sf_dir):
    """The Engine.sql facade under the oracle gate: tables registered
    as temp views THROUGH the cache (register_all → Engine.table →
    CacheManager resolution), then plain SQL over them — proving the
    cached views are first-class Catalyst sources."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache"),
        data_cache_type="file", cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    eng.register("supplier")
    eng.register("nation")
    return eng.sql("""
        SELECT n_name, count(*) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """)


@query(
    "window_analytic_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round(first_value(o_totalprice) OVER w, 2) AS cheapest,
           round(last_value(o_totalprice) OVER w, 2) AS priciest,
           round(nth_value(o_totalprice, 3) OVER w, 2) AS third,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6)
             AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_analytic_family(spark, sf_dir):
    """first/last/nth_value + cume_dist with an explicit full-partition
    frame (the default frame truncates last_value at the current row —
    the classic trap; both engines agree once the frame is spelled
    out). Deterministic tiebreak on o_orderkey."""
    o = t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    wc = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        money(F.first("o_totalprice").over(w)).alias("cheapest"),
        money(F.last("o_totalprice").over(w)).alias("priciest"),
        money(F.nth_value("o_totalprice", 3).over(w)).alias("third"),
        F.round(F.cume_dist().over(wc), 6).alias("cdist"),
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_returnflag, 'N'), '?') AS rf,
           round(greatest(l_quantity, l_discount * 100), 2) AS g,
           round(least(l_tax, l_discount), 2) AS l,
           CASE WHEN l_quantity > 25 THEN 'big'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM lineitem
    """,
)
def conditional_functions(spark, sf_dir):
    """Conditional/null-handling scalar family: coalesce, nullif,
    greatest/least, searched CASE — all map-side, codegen'd, no
    shuffle (scan → project only)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("?"))
        .alias("rf"),
        F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 2)
        .alias("g"),
        F.round(F.least(F.col("l_tax"), F.col("l_discount")), 2).alias("l"),
        F.when(F.col("l_quantity") > 25, "big")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small").alias("size_class"),
    )


def _morton_sql(a: str, b: str, bits: int = 16) -> str:
    """Bit-interleaved (Morton / Z-order) key of two integer columns —
    identical operator syntax in Spark SQL and DuckDB, so ONE string
    serves both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_morton_sql('l_partkey', 'l_suppkey')} AS z_key
    FROM lineitem
    """,
)
def zorder_layout_key(spark, sf_dir):
    """Z-order (Morton) layout key over (l_partkey, l_suppkey): the
    data-layout primitive behind multi-dimensional clustering — sort
    or range-partition by z_key before writing and scans filtered on
    EITHER key prune most files. Pure bit math, map-side, codegen'd;
    at 100 TB this feeds `repartitionByRange(z_key).sortWithinPartitions`
    on the write path."""
    li = t(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        f"{_morton_sql('l_partkey', 'l_suppkey')} AS z_key")


@query(
    "map_functions",
    oracle="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           json_keys(props)[1] AS first_key,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           json_extract(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
)
def map_functions(spark, sf_dir):
    """Map-typed column family: JSON props parsed once into
    map<string,bigint>, then map_keys / element_at /
    transform_values / map_contains_key — all map-side expressions
    (the oracle reads the same facts through DuckDB's JSON functions)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(F.transform_values(m, lambda k, v: v * 2), "k")
        .alias("k_doubled"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           round(l_quantity, 2) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 2)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 2)
    FROM lineitem
    """,
)
def unpivot_melt(spark, sf_dir):
    """Native unpivot (melt): three measure columns to long form —
    the inverse of pivot_status. Spark's Unpivot node expands rows
    map-side (no shuffle at all)."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure", "val",
    ).withColumn("val", F.round("val", 2))


@query(
    "pandas_udaf_gini",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag,
             l_extendedprice AS x,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS i,
             count(*) OVER (PARTITION BY l_returnflag) AS n,
             sum(l_extendedprice) OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem)
    SELECT l_returnflag,
           max(n) AS n_rows,
           round(2.0 * sum(i * x) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    GROUP BY l_returnflag
    """,
)
def pandas_udaf_gini(spark, sf_dir):
    """Grouped-aggregate Pandas UDF (Arrow-batched UDAF): Gini
    concentration of line revenue per return flag — the custom-
    statistic shape Spark has no builtin for. The whole group streams
    into one Arrow batch per key (fine for bounded groups; a 100 TB
    rollout pre-aggregates or samples within partitions first — this
    entry pins the API surface and its exact math). Tie order is
    irrelevant to sum(i*x) over equal x, so the sorted-rank formula
    is engine-portable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gini(x: pd.Series) -> float:
        xs = np.sort(x.to_numpy(dtype="float64"))
        n = xs.size
        i = np.arange(1, n + 1, dtype="float64")
        return float(2.0 * (i * xs).sum() / (n * xs.sum()) - (n + 1.0) / n)

    @pandas_udf("long")
    def n_rows(x: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in
        # one Aggregate (INVALID_PANDAS_UDF_PLACEMENT) — the count
        # rides the same Arrow batch instead
        return len(x)

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(n_rows("l_extendedprice").alias("n_rows"),
             F.round(gini("l_extendedprice"), 6).alias("gini"))
    )


@query(
    "cogrouped_asof_enrich",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id,
           epoch_us(p.ts) - (SELECT max(epoch_us(c.ts)) FROM events c
                             WHERE c.event_type = 'click'
                               AND c.user_id = p.user_id
                               AND c.ts <= p.ts
                               AND c.ts >= p.ts - INTERVAL 1 HOUR)
               AS micros_since_click
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def cogrouped_asof_enrich(spark, sf_dir):
    """Cogrouped applyInPandas (the fourth Arrow surface, after
    scalar pandas UDF / grouped-agg UDAF / mapInPandas): per-user
    as-of enrichment — each purchase annotated with the microseconds
    since that user's latest click within the preceding hour, via
    pandas merge_asof on the cogrouped pair. Both sides shuffle once
    on user_id and stream through Arrow batch-by-batch; the 100 TB
    shape is the standard feature-join of a training pipeline
    (events × behavior history, co-partitioned by entity)."""
    import pandas as pd

    ev = t(spark, sf_dir, "events")
    # cogroup on a HASH BUCKET of the entity, not the entity itself:
    # applyInPandas pays per-group Arrow/Python overhead (~5 ms/group —
    # 1500 per-user groups cost ~9 s at sf0.1), so groups are bucketed
    # 64-ways and merge_asof(by="user_id") does the per-user as-of
    # inside each batch. Identical semantics, tunable batch size —
    # exactly how a 100 TB rollout sizes Arrow batches.
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        (F.col("user_id") % 64).alias("bucket"))
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        (F.col("user_id") % 64).alias("c_bucket"))

    def enrich(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "purchase_id", "micros_since_click"])
        left = left.sort_values("p_ts", kind="mergesort")
        if right.empty:
            out = left[["user_id", "purchase_id"]].copy()
            out["micros_since_click"] = pd.array(
                [None] * len(out), dtype="Int64")
            return out
        right = (right.sort_values("c_ts", kind="mergesort")
                 .rename(columns={"c_user": "user_id"}))
        m = pd.merge_asof(left, right, left_on="p_ts", right_on="c_ts",
                          by="user_id",
                          tolerance=pd.Timedelta(hours=1),
                          direction="backward")
        delta = (m["p_ts"] - m["c_ts"]) // pd.Timedelta(microseconds=1)
        out = m[["user_id", "purchase_id"]].copy()
        out["micros_since_click"] = delta.astype("Int64")
        return out

    return (
        purchases.groupBy("bucket")
        .cogroup(clicks.groupBy("c_bucket"))
        .applyInPandas(
            enrich,
            "user_id long, purchase_id long, micros_since_click long")
    )


@query(
    "session_window_batch",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_batch(spark, sf_dir):
    """Native `session_window` in a BATCH aggregation — same operator
    the streaming sessionizer uses, no window-function pass at all:
    Catalyst's session aggregation merges overlapping [ts, ts+gap)
    spans per key in one shuffle. The oracle is the manual
    lag/cumsum formulation with the native boundary rule (a gap of
    EXACTLY the 30-min threshold starts a new session, since windows
    are half-open [start, end)) and end = last event + gap — pinning
    that native and hand-rolled sessionization agree row-for-row."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             money(F.sum("value")).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"),
                          "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("session_window.end"),
                          "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events", "session_value")
    )


@query(
    "pandas_udf_iterator_scale",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(1.0 / (1.0 + exp(-(value - 100.0) / 50.0))), 4)
               AS sum_sig
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def pandas_udf_iterator_scale(spark, sf_dir):
    """Iterator-form Pandas UDF (``Iterator[pd.Series] →
    Iterator[pd.Series]``): the variant for UDFs with expensive
    one-time setup (model weights, tokenizers, codecs) — init runs
    ONCE per task, then streams Arrow batches through, instead of
    paying init per batch like the plain scalar form.  Here the
    'model' is a centred sigmoid; the aggregate over ~100k scored
    rows pins numpy's exp against the oracle's SQL exp to 4
    decimals.  At 100 TB this form is the difference between loading
    a tokenizer 10^6 times (per batch) and 10^3 times (per task)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid_score(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init happens HERE, once per task
        center, scale = 100.0, 50.0
        for x in it:
            yield 1.0 / (1.0 + np.exp(-(x - center) / scale))

    e = t(spark, sf_dir, "events")
    return (
        e.select("event_type", sigmoid_score("value").alias("s"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("s"), 4).alias("sum_sig"))
        .orderBy("event_type")
    )


@query(
    "array_set_operations",
    oracle="""
    WITH combos AS (
      SELECT DISTINCT o_custkey % 5 AS i, o_custkey % 3 AS j FROM orders
    ), arrs AS (
      SELECT i, j, generate_series(i, i + 3) AS a,
             generate_series(j, j + 4) AS b
      FROM combos
    )
    SELECT i, j,
           coalesce(array_to_string(
             list_sort(list_distinct(a || b)), ','), '') AS u,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> list_contains(b, x)))), ','), '') AS ix,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS ex,
           list_has_any(a, b) AS overlaps,
           coalesce(list_position(a, j), 0) AS pos_j
    FROM arrs
    ORDER BY i, j
    """,
)
def array_set_operations(spark, sf_dir):
    """Array set algebra: union / intersect / except (sorted for
    engine-independent element order), overlap test, and 1-based
    position with Spark's 0-for-absent convention (the oracle
    coalesces DuckDB's NULL to 0 — the one semantic difference).
    Arrays stay inside Tungsten rows end to end; the DISTINCT combo
    driver table keeps the output bounded at any scale."""
    o = t(spark, sf_dir, "orders")
    combos = o.select((F.col("o_custkey") % 5).alias("i"),
                      (F.col("o_custkey") % 3).alias("j")).distinct()
    a = F.sequence("i", F.col("i") + 3)
    b = F.sequence("j", F.col("j") + 4)
    return (
        combos.select(
            "i", "j",
            F.array_join(F.array_sort(F.array_union(a, b))
                         .cast("array<string>"), ",").alias("u"),
            F.array_join(F.array_sort(F.array_intersect(a, b))
                         .cast("array<string>"), ",").alias("ix"),
            F.array_join(F.array_sort(F.array_except(a, b))
                         .cast("array<string>"), ",").alias("ex"),
            F.arrays_overlap(a, b).alias("overlaps"),
            F.array_position(a, F.col("j")).alias("pos_j"),
        )
        .orderBy("i", "j")
    )


@query(
    "arrow_python_udf",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice >= 100000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_jumbo,
           CAST(sum(length(o_orderpriority) + CAST(o_orderkey % 7 AS BIGINT))
               AS BIGINT) AS checksum
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def arrow_python_udf(spark, sf_dir):
    """Arrow-optimized Python UDF (``@udf(useArrow=True)``, Spark
    3.5+): the third UDF engine next to pickled-row Python UDFs and
    Pandas UDFs — scalar Python semantics (per-row function) with
    Arrow batch transport, removing pickle serialization without
    requiring vectorized pandas code.  The checksum mixes string and
    modular arithmetic so the oracle catches any transport-layer type
    coercion."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def row_checksum(prio: str, key: int) -> int:
        return len(prio) + (key % 7)

    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", "o_totalprice",
                 row_checksum("o_orderpriority", "o_orderkey").alias("cs"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("o_totalprice") >= 100000, 1).otherwise(0))
             .alias("n_jumbo"),
             F.sum("cs").alias("checksum"))
        .orderBy("o_orderpriority")
    )


@query(
    "query_result_cache",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def query_result_cache(spark, sf_dir):
    """Engine.sql_cached — the reference's content-addressed page key
    (``util/Utils.java:100-123``: md5(path+mtime), stale keys never
    match) lifted to QUERY-RESULT granularity: results are keyed by
    md5(sql ‖ every input file's path+mtime+length), so any input
    change passively invalidates.  The probe runs the aggregate cold
    (miss → cluster-written parquet entry) then warm, asserts the
    provenance counters in-query (reference test style,
    ``TestCachingFileSystemBase.java:179-334``), and returns the warm
    result — which must hash-match the oracle, proving a cache hit is
    indistinguishable from recomputation."""
    import os as _os
    import tempfile as _tf

    from sidecar_spark import Engine, SidecarConfig
    from sidecar_spark.cache.manager import CacheManager

    cache_dir = _os.path.join(
        _tf.gettempdir(), "sidecar-resultcache",
        _os.path.basename(sf_dir.rstrip("/")).replace(".", "_"))
    conf = SidecarConfig.create(cache_dir=cache_dir,
                                data_cache_type="file",
                                cache_persistent=False)
    eng = Engine(spark, base_dir=sf_dir, conf=conf)
    eng.register("lineitem")
    q = ("SELECT l_returnflag, count(*) AS n, "
         "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
         "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    eng.sql_cached(q).collect()          # cold or warm depending on run
    before = eng.result_cache_stats()
    out = eng.sql_cached(q)              # must be a hit
    rows = out.collect()
    after = eng.result_cache_stats()
    if after["hits"] != before["hits"] + 1:
        raise AssertionError(
            f"result cache did not serve the warm read: {after}")
    return spark.createDataFrame(
        rows, "l_returnflag string, n bigint, revenue double")


@query(
    "explode_outer_semantics",
    oracle="""
    WITH arr AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN []::BIGINT[]
                  WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE [o_orderkey % 5, o_orderkey % 3] END AS xs
      FROM orders WHERE o_orderkey < 30000
    )
    SELECT count(*) AS n_rows_outer,
           count(x) AS n_elems,
           count(CASE WHEN x IS NULL THEN 1 END) AS n_preserved,
           CAST(sum(coalesce(x, 0)) AS BIGINT) AS sum_x
    FROM (SELECT o_orderkey,
                 unnest(CASE WHEN xs IS NULL OR len(xs) = 0
                             THEN [NULL]::BIGINT[] ELSE xs END) AS x
          FROM arr)
    """,
)
def explode_outer_semantics(spark, sf_dir):
    """explode_outer vs explode: empty and NULL arrays are PRESERVED
    as a null-element row instead of silently dropping the parent —
    the difference between 'every document keeps a row even with no
    chunks' and rows vanishing from a left-ish pipeline.  The oracle
    emulates outer-explode with a [NULL] substitution; n_preserved
    counts exactly the rows plain explode would have lost."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 30000)
    xs = (F.when(F.col("o_orderkey") % 7 == 0,
                 F.array().cast("array<bigint>"))
          .when(F.col("o_orderkey") % 11 == 0,
                F.lit(None).cast("array<bigint>"))
          .otherwise(F.array(F.col("o_orderkey") % 5,
                             F.col("o_orderkey") % 3)))
    exploded = o.select("o_orderkey", F.explode_outer(xs).alias("x"))
    return exploded.agg(
        F.count(F.lit(1)).alias("n_rows_outer"),
        F.count("x").alias("n_elems"),
        F.count(F.when(F.isnull("x"), 1)).alias("n_preserved"),
        F.sum(F.coalesce("x", F.lit(0))).alias("sum_x"))


@query(
    "map_entries_functions",
    oracle="""
    SELECT event_id,
           len(map_entries(map {'t': CAST(user_id AS BIGINT),
                                'v': CAST(event_id % 13 AS BIGINT)}))
               AS n_entries,
           map_entries(map {'t': CAST(user_id AS BIGINT),
                            'v': CAST(event_id % 13 AS BIGINT)})[1].value
               AS t_val,
           map_entries(map {'t': CAST(user_id AS BIGINT),
                            'v': CAST(event_id % 13 AS BIGINT)})[2].value
               AS v_val
    FROM events WHERE event_id % 211 = 0
    ORDER BY event_id
    """,
)
def map_entries_functions(spark, sf_dir):
    """map_from_entries / map_entries round trip: build a map from a
    struct array, explode it back to entries, and read positional
    values — completing the map family (map_functions covers
    keys/element_at/transform_values).  DuckDB's entry struct names
    the fields key/value like Spark, so positional access twins
    exactly."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") % 211 == 0)
    m = F.map_from_entries(F.array(
        F.struct(F.lit("t").alias("key"),
                 F.col("user_id").cast("long").alias("value")),
        F.struct(F.lit("v").alias("key"),
                 (F.col("event_id") % 13).cast("long").alias("value"))))
    entries = F.map_entries(m)
    return (
        e.select(
            "event_id",
            F.size(entries).alias("n_entries"),
            F.element_at(entries, 1)["value"].alias("t_val"),
            F.element_at(entries, 2)["value"].alias("v_val"))
        .orderBy("event_id")
    )


@query(
    "array_edit_functions",
    oracle="""
    WITH base AS (
      SELECT DISTINCT o_custkey % 4 AS i FROM orders
    ), arrs AS (
      SELECT i, [i, i + 1, i + 2] AS a,
             [i, NULL, i + 1, NULL, i + 2] AS a_sparse
      FROM base
    )
    SELECT i,
           array_to_string(list_append(a, 99), ',') AS appended,
           array_to_string(list_prepend(-1, a), ',') AS prepended,
           array_to_string(list_filter(a, x -> x <> i + 1), ',')
               AS removed,
           array_to_string(a[1:2] || [CAST(7 AS BIGINT)] || a[3:], ',')
               AS inserted,
           len(a_sparse) AS n_sparse,
           len(list_filter(a_sparse, x -> x IS NOT NULL)) AS n_compacted
    FROM arrs
    ORDER BY i
    """,
)
def array_edit_functions(spark, sf_dir):
    """Array editing family: append / prepend / insert-at /
    remove-value / compact (null-strip) — the mutation verbs over
    array columns (Spark arrays are immutable; each op is a new
    array, evaluated inside Tungsten with no explode).  The oracle
    rebuilds insert-at from slices, pinning Spark's 1-based insert
    position; compaction is audited via before/after lengths (the
    driver hash cannot carry NULL array elements)."""
    o = t(spark, sf_dir, "orders")
    base = o.select((F.col("o_custkey") % 4).alias("i")).distinct()
    a = F.array(F.col("i"), F.col("i") + 1, F.col("i") + 2)
    nul = F.lit(None).cast("bigint")
    a_sparse = F.array(F.col("i"), nul, F.col("i") + 1, nul,
                       F.col("i") + 2)
    return (
        base.select(
            "i",
            F.array_join(F.array_append(a, F.lit(99))
                         .cast("array<string>"), ",").alias("appended"),
            F.array_join(F.array_prepend(a, F.lit(-1))
                         .cast("array<string>"), ",").alias("prepended"),
            F.array_join(F.array_remove(a, F.col("i") + 1)
                         .cast("array<string>"), ",").alias("removed"),
            F.array_join(F.array_insert(a, 3, F.lit(7))
                         .cast("array<string>"), ",").alias("inserted"),
            F.size(a_sparse).alias("n_sparse"),
            F.size(F.array_compact(a_sparse)).alias("n_compacted"),
        )
        .orderBy("i")
    )


@query(
    "trig_functions",
    oracle="""
    SELECT o_orderpriority,
           round(sum(sin(o_totalprice / 100000.0)), 6) AS sum_sin,
           round(sum(cos(o_totalprice / 100000.0)), 6) AS sum_cos,
           round(sum(atan2(o_totalprice / 100000.0,
                           1.0 + o_custkey % 3)), 6) AS sum_atan2,
           round(avg(degrees(atan(o_totalprice / 100000.0))), 6)
               AS avg_deg,
           round(min(radians(CAST(o_custkey % 360 AS DOUBLE))), 6)
               AS min_rad
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def trig_functions(spark, sf_dir):
    """Trigonometric family (sin/cos/atan2/degrees/radians) — the
    building blocks of haversine geo-distance and cyclical feature
    encodings (hour-of-day → (sin, cos) pairs for models).  Both
    engines delegate to libm doubles; 6-decimal rounding on the
    aggregates absorbs the summation-order ulps."""
    o = t(spark, sf_dir, "orders")
    x = F.col("o_totalprice") / 100000.0
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.sin(x)), 6).alias("sum_sin"),
            F.round(F.sum(F.cos(x)), 6).alias("sum_cos"),
            F.round(F.sum(F.atan2(x, (F.col("o_custkey") % 3 + 1)
                                  .cast("double"))), 6).alias("sum_atan2"),
            F.round(F.avg(F.degrees(F.atan(x))), 6).alias("avg_deg"),
            F.round(F.min(F.radians((F.col("o_custkey") % 360)
                                    .cast("double"))), 6).alias("min_rad"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# grouped applyInArrow: per-group pyarrow-native aggregation
# ---------------------------------------------------------------------------

@query(
    "grouped_apply_in_arrow",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value,
           round(max(value) - min(value), 4) AS value_range
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def grouped_apply_in_arrow(spark, sf_dir):
    """groupBy().applyInArrow — the Arrow-native grouped map (Spark
    4): each group arrives as a raw pyarrow.Table (no pandas
    conversion on either side), the function reduces it with
    pyarrow.compute kernels and returns a one-row table.  The
    per-group reduction shape is what a custom C-speed aggregator
    (quantile sketch, tokenizer stats) plugs into; parity against
    the plain SQL aggregate pins the plumbing end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def reduce_group(table: "pa.Table") -> "pa.Table":
        v = table.column("value")
        return pa.table({
            "event_type": [table.column("event_type")[0].as_py()],
            "n": pa.array([table.num_rows], pa.int64()),
            "sum_value": pa.array(
                [round(pc.sum(v).as_py(), 4)], pa.float64()),
            "value_range": pa.array(
                [round(pc.max(v).as_py() - pc.min(v).as_py(), 4)],
                pa.float64()),
        })

    e = t(spark, sf_dir, "events").select("event_type", "value")
    out_schema = ("event_type string, n bigint, sum_value double, "
                  "value_range double")
    return (e.groupBy("event_type")
            .applyInArrow(reduce_group, schema=out_schema)
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Arrow interchange round trip: toArrow() -> createDataFrame(pa.Table)
# ---------------------------------------------------------------------------

@query(
    "arrow_interchange_roundtrip",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus AS st, count(*) AS n,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY o_orderstatus)
    SELECT st, CAST(n AS BIGINT) AS n, rev,
           CAST(n AS BIGINT) AS n_rt, rev AS rev_rt
    FROM agg ORDER BY st
    """,
)
def arrow_interchange_roundtrip(spark, sf_dir):
    """The Arrow interchange surface: DataFrame.toArrow() exports a
    (small, aggregated — driver-side by design, like any collect)
    result as a pyarrow.Table and spark.createDataFrame accepts the
    Table straight back (Spark 4).  The round-tripped columns are
    joined against the original aggregate so any value or type
    mangling in the Arrow bridge breaks the hash.  The export runs
    AFTER reduction: 3 rows cross the driver, never the corpus."""
    o = t(spark, sf_dir, "orders")
    agg = (o.groupBy(F.col("o_orderstatus").alias("st"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("rev")))
    pa_table = agg.toArrow()
    back = spark.createDataFrame(pa_table).select(
        F.col("st").alias("st_rt"), F.col("n").alias("n_rt"),
        F.col("rev").alias("rev_rt"))
    return (agg.join(back, agg.st == back.st_rt)
            .select("st", "n", "rev", "n_rt", "rev_rt")
            .orderBy("st"))


@query(
    "dq_constraint_suite",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(o_custkey) AS n_custkey,
             count(DISTINCT o_orderkey) AS n_distinct_keys,
             CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_price_pos,
             CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_status_ok,
             CAST(sum(CASE WHEN regexp_matches(o_orderpriority,
                                               '^[1-5]-')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_prio_ok
      FROM orders)
    SELECT c.constraint_name, c.metric,
           c.metric >= c.threshold AS passed
    FROM m, LATERAL (VALUES
      ('completeness:o_custkey',
       round(n_custkey * 1.0 / n_rows, 6), 1.0),
      ('uniqueness:o_orderkey',
       round(n_distinct_keys * 1.0 / n_rows, 6), 1.0),
      ('range:o_totalprice>0',
       round(n_price_pos * 1.0 / n_rows, 6), 1.0),
      ('set:o_orderstatus',
       round(n_status_ok * 1.0 / n_rows, 6), 1.0),
      ('pattern:o_orderpriority',
       round(n_prio_ok * 1.0 / n_rows, 6), 1.0)
    ) AS c(constraint_name, metric, threshold)
    ORDER BY constraint_name
    """,
)
def dq_constraint_suite(spark, sf_dir):
    """Deequ-style declarative data-quality verification: five
    constraint classes (completeness, key uniqueness, numeric range,
    value-set membership, regex pattern) evaluated in ONE aggregation
    pass and reported as a long-form (constraint, metric, passed)
    result — the contract-check stage every ingestion pipeline runs
    before accepting a batch.  At 100 TB: all constraints share a
    single scan with map-side partial aggregation; adding a
    constraint adds a column expression, never a pass."""
    o = t(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_keys"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_price_pos"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
              .otherwise(0)).cast("bigint").alias("n_status_ok"),
        F.sum(F.when(F.col("o_orderpriority").rlike("^[1-5]-"), 1)
              .otherwise(0)).cast("bigint").alias("n_prio_ok"))
    checks = [
        ("completeness:o_custkey", F.col("n_custkey")),
        ("uniqueness:o_orderkey", F.col("n_distinct_keys")),
        ("range:o_totalprice>0", F.col("n_price_pos")),
        ("set:o_orderstatus", F.col("n_status_ok")),
        ("pattern:o_orderpriority", F.col("n_prio_ok")),
    ]
    rows = F.explode(F.array(*[
        F.struct(F.lit(name).alias("constraint_name"),
                 F.round(num / F.col("n_rows"), 6).alias("metric"))
        for name, num in checks])).alias("c")
    return (m.select(rows)
            .select(F.col("c.constraint_name").alias("constraint_name"),
                    F.col("c.metric").alias("metric"),
                    (F.col("c.metric") >= 1.0).alias("passed"))
            .orderBy("constraint_name"))


@query(
    "last_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt_ts,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt_type
      FROM events)
    SELECT CASE WHEN lt_ts IS NOT NULL
                     AND lt_ts >= ts - INTERVAL 7 DAY
                THEN lt_type ELSE 'direct' END AS channel,
           count(*) AS n_purchases,
           round(sum(value), 2) AS revenue
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY channel
    """,
)
def last_touch_attribution(spark, sf_dir):
    """Marketing-style last-touch attribution: credit each purchase
    to the user's most recent preceding non-purchase event within 7
    days (else 'direct') and roll revenue up by channel.

    100 TB plan: ONE window pass partitioned by user (the shuffle
    key every sessionization query already uses) carries the last
    touch forward — no self-join of the event stream against itself;
    the channel rollup is a combine-collapsed aggregate.  Window
    order is (ts, event_id) so same-timestamp events resolve
    identically in both engines."""
    ev = t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    not_purchase = F.col("event_type") != "purchase"
    touched = ev.select(
        "event_type", "ts", "value",
        F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True)
        .over(w).alias("lt_ts"),
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w).alias("lt_type"))
    channel = (F.when(
        F.col("lt_ts").isNotNull()
        & (F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        F.col("lt_type")).otherwise("direct"))
    return (touched.where(F.col("event_type") == "purchase")
            .groupBy(channel.alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.round(F.sum("value"), 2).alias("revenue")))


@query(
    "unsigned_widened_read",
    oracle="""
    SELECT CAST(o_orderkey % 5 AS BIGINT) AS g,
           count(*) AS n,
           CAST(sum(o_orderkey % 256) AS BIGINT) AS sum_u8,
           CAST(sum(o_orderkey % 65536) AS BIGINT) AS sum_u16,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_u32,
           CAST(max(CAST(o_orderkey AS HUGEINT)
                    + 9223372036854775808) AS VARCHAR) AS max_u64
    FROM orders
    GROUP BY 1
    """,
)
def unsigned_widened_read(spark, sf_dir):
    """Unsigned parquet ints through the executor-resolved scan
    (round-7 probe sweep, third wave): the JVM widens UINT_8/16/32/64
    to smallint/int/bigint/decimal(20,0) — probed, including uint64
    values ABOVE int64 max — and the Python source must serve the
    identical schema and values (sources/cached_parquet.py
    ``_target_type``). The fixture derives every unsigned column from
    ``o_orderkey`` (u64 = key + 2^63, deliberately past int64), so
    the DuckDB oracle recomputes the same aggregates from the
    original orders table without reading the unsigned file at all.
    pandas/pyarrow pipelines write unsigned parquet routinely — a
    100 TB training-data lake WILL contain these files."""
    import os as _os

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from sidecar_spark import Engine, SidecarConfig

    src_path = _os.path.join(sf_dir, "orders.parquet")
    try:
        mt = _os.stat(src_path).st_mtime_ns
    except OSError:
        mt = 0
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join("/tmp", "sidecar-formats", tag,
                         f"unsigned_{mt}")
    marker = _os.path.join(root, "_SUCCESS")
    if not _os.path.exists(marker):
        _os.makedirs(root, exist_ok=True)
        k = _pq.read_table(src_path, columns=["o_orderkey"]) \
            .column("o_orderkey").combine_chunks().cast(_pa.int64())
        fixture = _pa.table({
            "u8": _pc.bit_wise_and(k, 255).cast(_pa.uint8()),
            "u16": _pc.bit_wise_and(k, 65535).cast(_pa.uint16()),
            "u32": k.cast(_pa.uint32()),
            "u64": _pc.add(k.cast(_pa.uint64()),
                           _pa.scalar(2**63, _pa.uint64())),
        })
        _pq.write_table(fixture, _os.path.join(root, "part-0.parquet"))
        open(marker, "w").close()
    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, conf=conf)
    df = eng.read_parquet(root)
    return (df.groupBy((F.col("u32") % 5).cast("long").alias("g"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("u8").cast("long").alias("sum_u8"),
                 F.sum("u16").cast("long").alias("sum_u16"),
                 F.sum("u32").cast("long").alias("sum_u32"),
                 F.max("u64").cast("string").alias("max_u64")))


@query(
    "legacy_format_nested_read",
    oracle="""
    SELECT CAST(o_orderkey % 3 AS BIGINT) AS g,
           count(*) AS n,
           CAST(sum(o_orderkey % 10) AS BIGINT) AS sum_first,
           CAST(sum(2 * o_orderkey) AS BIGINT) AS sum_flat
    FROM orders
    GROUP BY 1
    """,
)
def legacy_format_nested_read(spark, sf_dir):
    """Hive-compat ``writeLegacyFormat=true`` NESTED lists through the
    executor-resolved scan (round-7 probe sweep): parquet-mr's name
    rule makes ``repeated group array (List)`` the element itself, so
    the file reads ``array<array<int>>`` — pyarrow fabricates a
    single-field struct wrapper there, silently diverging schema and
    values until ``_legacy_list_unwraps`` (cached_parquet.py) drops
    it. The fixture writes ``aa = array(array(k % 10), array(k, k))``
    per orders row with the legacy writer; the aggregate sums
    ``aa[0][0]`` and ``aa[1][0]+aa[1][1]``, so a wrapper surviving
    anywhere breaks resolution OR the values. The DuckDB oracle
    recomputes from the original orders table."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    src_path = _os.path.join(sf_dir, "orders.parquet")
    try:
        mt = _os.stat(src_path).st_mtime_ns
    except OSError:
        mt = 0
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join("/tmp", "sidecar-formats", tag,
                         f"legacynest_{mt}")
    if not _os.path.exists(_os.path.join(root, "_SUCCESS")):
        src = t(spark, sf_dir, "orders").select("o_orderkey")
        spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
        try:
            (src.select(
                F.col("o_orderkey").alias("k"),
                F.array(F.array(F.col("o_orderkey") % 10),
                        F.array(F.col("o_orderkey"),
                                F.col("o_orderkey"))).alias("aa"))
             .coalesce(4).write.mode("overwrite").parquet(root))
        finally:
            spark.conf.unset("spark.sql.parquet.writeLegacyFormat")
    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, conf=conf)
    df = eng.read_parquet(root)
    return (df.groupBy((F.col("k") % 3).cast("long").alias("g"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("aa")[0][0]).cast("long")
                 .alias("sum_first"),
                 F.sum(F.col("aa")[1][0] + F.col("aa")[1][1])
                 .cast("long").alias("sum_flat")))


@query(
    "null_partition_read",
    oracle="""
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'null'
                ELSE o_orderpriority END AS part_k,
           count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    GROUP BY 1
    """,
)
def null_partition_read(spark, sf_dir):
    """``__HIVE_DEFAULT_PARTITION__`` directories through the
    executor-resolved scan (round-7 probe): NULL partition values
    written by ``partitionBy`` must read back as NULL, grouped and
    counted exactly. The fixture partitions orders by a key that is
    NULL for every 7th order; the oracle recomputes the same groups
    from the original table (NULLs labeled 'null' on both sides so
    the group key is string-comparable)."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    src_path = _os.path.join(sf_dir, "orders.parquet")
    try:
        mt = _os.stat(src_path).st_mtime_ns
    except OSError:
        mt = 0
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join("/tmp", "sidecar-formats", tag,
                         f"nullpart_{mt}")
    if not _os.path.exists(_os.path.join(root, "_SUCCESS")):
        src = t(spark, sf_dir, "orders") \
            .select("o_orderkey", "o_orderpriority")
        (src.withColumn(
            "part_k",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_orderpriority")))
         .write.mode("overwrite").partitionBy("part_k").parquet(root))
    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, conf=conf)
    df = eng.read_parquet(root)
    return (df.groupBy(F.coalesce(F.col("part_k"), F.lit("null"))
                       .alias("part_k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("sum_key")))


@query(
    "user_schema_read",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(o_orderkey AS DECIMAL(20,0))) AS BIGINT)
               AS sum_key,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def user_schema_read(spark, sf_dir):
    """Explicit USER schema through the executor-resolved scan
    (round-7 fourth wave): the read declares a SUBSET of orders'
    columns with the key upcast to decimal(20,0) (the int64→decimal
    cell of the JVM's conversion matrix) and must stay CACHED with
    no footer inference (sources/cached_parquet.py user_schema
    branch + ``_cast_gate``). The DuckDB oracle recomputes from the
    original table with equivalent casts."""
    import os as _os

    from sidecar_spark import Engine, SidecarConfig

    conf = SidecarConfig.create(
        cache_dir=_os.path.join("/tmp", "sidecar-query-cache-exec"),
        data_cache_type="file", cache_persistent=False,
        resolve_mode="executor")
    eng = Engine(spark, conf=conf)
    df = eng.read_parquet(
        _os.path.join(sf_dir, "orders.parquet"),
        schema="o_orderkey decimal(20,0), o_orderstatus string, "
               "o_totalprice double")
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("sum_key"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_price")))
