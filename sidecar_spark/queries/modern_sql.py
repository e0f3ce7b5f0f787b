"""Modern Spark 4 SQL-surface battery.

The reference exposes no SQL (SURVEY.md §2.7 — its "queries" are FS
verbs; the engine on top supplies the algebra).  This module exercises
the Spark-4-era SQL surface a user of that stacked engine gets for
free, each with a DuckDB oracle:

* recursive CTEs (``WITH RECURSIVE`` — gap-free month spine),
* SQL pipe syntax (``|>`` operator chains),
* ``GROUP BY ALL`` / ``ORDER BY ALL``,
* string collations (``UTF8_LCASE`` case-insensitive distinct),
* ``approx_top_k`` sketch (run in its exact regime and audited
  against exact counts),
* ``Observation`` metrics (free-rider aggregates collected during a
  real action — the DataFrame analog of the reference's per-read
  Statistics counters, ``util/Statistics.java:27-63``),
* the state-store reader (``spark.read.format("statestore")`` over a
  streaming checkpoint — observability into stateful streams, the
  streaming analog of the reference's cache-snapshot introspection,
  ``SidecarCachingFileSystem.java:931-968``),
* ``parse_url`` / ``url_encode`` web-crawl plumbing (training-data
  pipelines key on host/path/query splits),
* scalar and aggregate bitwise families.

Scale notes: every query here is either a single map-side pass plus
one shuffle-free or single-shuffle aggregate, or (spine) a
driver-tiny recursion joined against a pre-aggregated fact — all
hold at 1000 executors unchanged.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from sidecar_spark.queries.registry import query, t


# ---------------------------------------------------------------------------
# WITH RECURSIVE — gap-free month spine (Spark 4 recursive CTE)
# ---------------------------------------------------------------------------

_SPINE_SQL = """
    WITH RECURSIVE yspine(y) AS (
        SELECT CAST(year((SELECT min(o_orderdate) FROM {orders})) AS INT)
        UNION ALL
        SELECT y + 1 FROM yspine
        WHERE y < CAST(year((SELECT max(o_orderdate) FROM {orders})) AS INT)
    ),
    mons AS ({months}),
    spine AS (
        SELECT make_timestamp(y, mm, 1, 0, 0, 0) AS m
        FROM yspine CROSS JOIN mons
        WHERE make_timestamp(y, mm, 1, 0, 0, 0) BETWEEN
              date_trunc('month', (SELECT min(o_orderdate) FROM {orders}))
          AND date_trunc('month', (SELECT max(o_orderdate) FROM {orders}))
    ),
    monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM {orders}
        GROUP BY 1
    )
    SELECT {fmt} AS mon,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(revenue, 0.0) AS revenue
    FROM spine LEFT JOIN monthly USING (m)
    ORDER BY mon
"""


@query(
    "recursive_cte_month_spine",
    oracle=_SPINE_SQL.format(
        orders="orders", fmt="strftime(m, '%Y-%m')",
        months="SELECT unnest(generate_series(1, 12)) AS mm"),
)
def recursive_cte_month_spine(spark, sf_dir):
    """Gap-free monthly order counts via a recursive CTE date spine.

    The recursion is driver-tiny regardless of fact size, and it
    iterates per YEAR (≈8 steps), cross-joined to a 12-month axis —
    recursing per month (≈80 steps) works but pays one Spark
    iteration (plan + tiny job) per step, ~15 s of pure driver
    overhead at any data size.  Recursion depth, not fact volume, is
    the cost driver of WITH RECURSIVE on Spark; keep it logarithmic
    in the spine when the step is compressible.  The fact side is
    pre-aggregated once (single shuffle) before the spine LEFT JOIN,
    which Spark broadcasts.  The reference has no recursion anywhere
    (SURVEY §2.7)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_v")
    return spark.sql(_SPINE_SQL.format(
        orders="orders_rec_v", fmt="date_format(m, 'yyyy-MM')",
        months="SELECT explode(sequence(1, 12)) AS mm"))


# ---------------------------------------------------------------------------
# SQL pipe syntax — |> operator chains (Spark 4.0+)
# ---------------------------------------------------------------------------

@query(
    "pipe_syntax_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-30'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pipe_syntax_pricing(spark, sf_dir):
    """The Q1 shape written in Spark 4 SQL pipe syntax.  The pipe form
    parses to the identical logical plan as the GROUP BY form — same
    partial-agg + single shuffle — so it is pure surface syntax with
    no plan cost."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe_v")
    return spark.sql("""
        FROM lineitem_pipe_v
        |> WHERE l_shipdate <= TIMESTAMP '2001-06-30'
        |> AGGREGATE count(*) AS n_items,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                         AS revenue,
                     round(avg(l_quantity), 6) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
    """)


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL
# ---------------------------------------------------------------------------

@query(
    "group_order_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority, n_orders, total
    """,
)
def group_order_by_all(spark, sf_dir):
    """``GROUP BY ALL`` infers the grouping set from the non-aggregate
    select items; ``ORDER BY ALL`` orders by every output column.
    Resolves at analysis time to the explicit form — identical plan."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba_v")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders_gba_v
        GROUP BY ALL
        ORDER BY ALL
    """)


# ---------------------------------------------------------------------------
# Collations — case-insensitive semantics without lower() rewrites
# ---------------------------------------------------------------------------

@query(
    "collated_distinct_audit",
    oracle="""
    SELECT source,
           count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                               ELSE lang END) AS n_binary,
           count(DISTINCT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                                     ELSE lang END)) AS n_ci
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def collated_distinct_audit(spark, sf_dir):
    """Spark 4 collation support: COUNT(DISTINCT) under ``UTF8_LCASE``
    equals the lower()-rewrite count, while binary collation sees the
    synthesized case variants as distinct.  Collation-aware grouping
    happens inside the hash agg — no extra projection, and the
    comparison stays whole-stage-codegen."""
    docs = t(spark, sf_dir, "documents")
    mixed = docs.withColumn(
        "lang_mixed",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang")))
    return (
        mixed.groupBy("source")
        .agg(
            F.countDistinct("lang_mixed").alias("n_binary"),
            F.countDistinct(
                F.expr("collate(lang_mixed, 'UTF8_LCASE')")).alias("n_ci"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# approx_top_k — heavy-hitter sketch, audited in its exact regime
# ---------------------------------------------------------------------------

@query(
    "approx_topk_events",
    oracle="""
    SELECT event_type AS item, count(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, item
    """,
)
def approx_topk_events(spark, sf_dir):
    """``approx_top_k`` heavy hitters over the event stream.  With
    maxItemsTracked (100k) far above the real cardinality (5) the
    sketch is exact, so the exact GROUP BY is a true oracle — same
    audit pattern as the HLL/CMS entries.  At scale the sketch is the
    point: fixed-size state, map-side combine, one row out per
    partition instead of a full shuffle of the keyspace."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 20, 100000)").alias("tk"))
        .select(F.explode("tk").alias("r"))
        .select(F.col("r.item").alias("item"), F.col("r.count").alias("cnt"))
        .orderBy(F.desc("cnt"), "item")
    )


# ---------------------------------------------------------------------------
# Observation — metrics piggybacked on a real action
# ---------------------------------------------------------------------------

@query(
    "observe_metrics_audit",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def observe_metrics_audit(spark, sf_dir):
    """``df.observe``: named aggregates computed as a free rider on an
    action's existing pass over the data — zero extra scans, exactly
    the reference's Statistics-counters idea (per-operation counters
    accumulated on the hot path, ``util/Statistics.java:27-63``)
    lifted to DataFrame level.  The observed metrics are returned as a
    one-row DataFrame and audited against a recomputing oracle."""
    from pyspark.sql import Observation

    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], float(m["sum_price"]), m["n_discounted"])],
        "n_rows bigint, sum_price double, n_discounted bigint")


# ---------------------------------------------------------------------------
# State-store reader — querying a streaming checkpoint as a table
# ---------------------------------------------------------------------------

@query(
    "statestore_reader",
    oracle="""
    SELECT event_type, count(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def statestore_reader(spark, sf_dir):
    """Run a stateful streaming aggregation over the bounded events
    backlog, then read the checkpoint's state store back as a
    DataFrame (``spark.read.format("statestore")``).  The state rows
    ARE the aggregation state, so the batch GROUP BY is an exact
    oracle.  This is streaming-state observability — the reference's
    save/load cache-snapshot introspection
    (``SidecarCachingFileSystem.java:931-968``) re-expressed for
    Spark's state store; at scale it reads state files directly,
    partition-parallel, without touching the running query."""
    from sidecar_spark.streaming.ops import (await_bounded,
        events_stream, scratch_dir)

    ckpt = scratch_dir("sidecar-ssr-ckpt-")
    try:
        counts = (
            events_stream(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                counts.writeStream.format("noop")
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            await_bounded(q)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        state = spark.read.format("statestore").load(ckpt)
        # key struct carries the grouping column; value struct carries the
        # aggregation buffer (internal field names) — bind positionally.
        out = state.select(F.col("key.*"), F.col("value.*"))
        key_col, val_col = out.columns[0], out.columns[1]
        rows = (
            out.select(F.col(key_col).alias("event_type"),
                       F.col(val_col).cast("long").alias("cnt"))
            .orderBy("event_type")
            .collect()
        )
        # materialize before the checkpoint dir is removed
        return spark.createDataFrame(rows, "event_type string, cnt bigint")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# parse_url family — web-crawl / training-data URL plumbing
# ---------------------------------------------------------------------------

@query(
    "url_parse_functions",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&rank=' || (doc_id % 7) AS url
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param,
           CAST(regexp_extract(url, 'rank=([0-9]+)', 1) AS BIGINT) AS rank
    FROM u
    ORDER BY doc_id
    """,
)
def url_parse_functions(spark, sf_dir):
    """``parse_url`` host/path/query splits plus typed query-param
    extraction — the URL normalization step of a web-crawl ingest.
    All JVM-side built-ins inside one codegen stage, no UDFs; at crawl
    scale this runs as a pure map with full predicate pushdown on the
    source filter."""
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&rank="), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"))
    return (
        u.select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang"))
            .alias("lang_param"),
            F.parse_url("url", F.lit("QUERY"), F.lit("rank"))
            .cast("long").alias("rank"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bitwise families — scalar operators and bit-aggregates
# ---------------------------------------------------------------------------

@query(
    "bitwise_functions",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(o_orderkey & 255) AS BIGINT) AS sum_and,
           CAST(sum(o_orderkey | 16) AS BIGINT) AS sum_or,
           CAST(sum(xor(o_orderkey, 85)) AS BIGINT) AS sum_xor,
           CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS sum_popcnt,
           CAST(sum((o_orderkey % 16) << 2) AS BIGINT) AS sum_shl,
           CAST(sum(o_orderkey >> 3) AS BIGINT) AS sum_shr,
           bit_and(o_orderkey) AS agg_and,
           bit_or(o_orderkey % 64) AS agg_or,
           bit_xor(o_orderkey) AS agg_xor
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bitwise_functions(spark, sf_dir):
    """Scalar bitwise operators (&, |, ^, shifts, popcount) and the
    bit_and/bit_or/bit_xor aggregates.  All evaluate inside
    whole-stage codegen with map-side partial aggregation — the
    backbone of bitmap/bit-packing tricks (the exact-bitmap distinct
    entry builds on these)."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(k.bitwiseAND(F.lit(255))).alias("sum_and"),
            F.sum(k.bitwiseOR(F.lit(16))).alias("sum_or"),
            F.sum(k.bitwiseXOR(F.lit(85))).alias("sum_xor"),
            F.sum(F.bit_count(k)).alias("sum_popcnt"),
            F.sum(F.shiftleft(k % 16, 2)).alias("sum_shl"),
            F.sum(F.shiftright(k, 3)).alias("sum_shr"),
            F.bit_and(k).alias("agg_and"),
            F.bit_or(k % 64).alias("agg_or"),
            F.bit_xor(k).alias("agg_xor"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# SQL UDFs — CREATE FUNCTION with SQL bodies (scalar + table)
# ---------------------------------------------------------------------------

@query(
    "sql_udf_pricing",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_big,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_udf_pricing(spark, sf_dir):
    """Spark 4 SQL UDFs: ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``.
    The body is inlined into the plan at analysis time — unlike Python
    UDFs there is NO serialization boundary; the expression compiles
    into whole-stage codegen exactly as if written inline, so this is
    the zero-cost way to share business logic across queries."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf_v")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION big_items()
        RETURNS TABLE(l_returnflag STRING, l_extendedprice DOUBLE,
                      l_discount DOUBLE)
        RETURN SELECT l_returnflag, l_extendedprice, l_discount
               FROM lineitem_udf_v WHERE l_quantity >= 30
    """)
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n_big,
               round(sum(disc_price(l_extendedprice, l_discount)), 2)
                   AS revenue
        FROM big_items()
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """)


# ---------------------------------------------------------------------------
# XML — from_xml parsing + xpath extraction (roundtrip audit)
# ---------------------------------------------------------------------------

@query(
    "xml_extract_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderkey < 2000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def xml_extract_roundtrip(spark, sf_dir):
    """Serialize order rows to XML strings, parse them back with
    ``from_xml`` (schema'd struct) and ``xpath_*`` (point extraction),
    and aggregate the RECOVERED values — the oracle recomputes from
    the base columns, so any parse corruption breaks the hash.
    from_xml is a JVM-side expression (no UDF); at ingest scale this
    is the XML-feed variant of the events_json_extract path."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    xml = o.select(
        F.concat(
            F.lit("<order><cust>"), F.col("o_custkey").cast("string"),
            F.lit("</cust><prio>"), F.col("o_orderpriority"),
            F.lit("</prio><total>"), F.col("o_totalprice").cast("string"),
            F.lit("</total></order>"),
        ).alias("x"))
    parsed = xml.select(
        F.from_xml("x", "cust BIGINT, prio STRING, total DOUBLE")
        .alias("r"),
        F.expr("xpath_long(x, '/order/cust/text()')").alias("cust_xp"))
    return (
        parsed
        # xpath and from_xml must agree — fold the cross-check into the
        # aggregate so a disagreement changes sum_cust
        .select(F.col("r.prio").alias("o_orderpriority"),
                F.when(F.col("r.cust") == F.col("cust_xp"), F.col("r.cust"))
                .alias("cust"),
                F.col("r.total").alias("total"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("cust").alias("sum_cust"),
             F.round(F.sum("total"), 2).alias("sum_price"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Linear-regression aggregate family (regr_*)
# ---------------------------------------------------------------------------

@query(
    "regression_functions",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
               AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y,
           mode(l_linestatus) AS mode_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def regression_functions(spark, sf_dir):
    """ANSI linear-regression aggregates (slope/intercept/R²/avgs) plus
    ``mode()`` — closed-form OLS as a single-pass distributive
    aggregate: each partition keeps 6 running sums, merge is
    associative, so the fit costs exactly one map-side-combined
    shuffle at any scale (no iterative solver needed for 1-D).

    Note: price~quantity in TPC-H-ish data is strongly linear, so the
    fit is numerically stable under 4-decimal rounding."""
    li = t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
            F.mode("l_linestatus").alias("mode_status"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Cryptographic digest family (md5 / sha2) — content addressing
# ---------------------------------------------------------------------------

@query(
    "digest_functions",
    oracle="""
    SELECT lang,
           count(DISTINCT md5(text)) AS n_md5,
           count(DISTINCT sha256(text)) AS n_sha,
           min(md5(text)) AS min_md5,
           max(sha256(text)) AS max_sha
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def digest_functions(spark, sf_dir):
    """md5 / sha2-256 content digests — the content-addressing
    primitive behind the reference's page keys
    (``util/Utils.java:100-123``: MD5(path+mtime) addressing) and this
    repo's exact-dedup path, here surfaced as SQL expressions.
    Distinct-digest counts per language double as a dedup audit.
    (sha1/crc32/xxhash64 exist Spark-side but have no DuckDB twin, so
    the oracle pins the md5/sha256 pair.)"""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.countDistinct(F.md5("text")).alias("n_md5"),
            F.countDistinct(F.sha2("text", 256)).alias("n_sha"),
            F.min(F.md5("text")).alias("min_md5"),
            F.max(F.sha2("text", 256)).alias("max_sha"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# to_char / to_number — locale-style numeric formatting roundtrip
# ---------------------------------------------------------------------------

@query(
    "to_number_roundtrip",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey < 5000
    """,
)
def to_number_roundtrip(spark, sf_dir):
    """``to_char`` renders totals with grouped thousands;
    ``to_number`` parses them back.  The aggregate sums the RECOVERED
    decimals, so a formatting/parsing mismatch on any row breaks the
    oracle hash — a roundtrip audit in the style of the CSV/JSON
    round-trips.  Both are codegen expressions (no UDF)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 5000)
    fmt = o.select(
        F.to_char(F.col("o_totalprice").cast("decimal(18,2)"),
                  F.lit("999,999,999.99")).alias("s"))
    back = fmt.select(
        F.to_number("s", F.lit("999,999,999.99")).alias("v"))
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("decimal(18,2)").cast("double").alias("total"))


# ---------------------------------------------------------------------------
# Parameterized SQL — named-parameter queries
# ---------------------------------------------------------------------------

@query(
    "parameterized_sql_filter",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4)
               AS avg_price
    FROM orders
    WHERE o_totalprice BETWEEN 1000.0 AND 150000.0
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def parameterized_sql_filter(spark, sf_dir):
    """``spark.sql(query, args=...)`` named parameters: literals are
    bound at parse time (NOT string interpolation — injection-safe and
    plan-cache friendly).  The bound literals reach the parquet scan
    as pushed filters exactly like inline constants."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4)
                   AS avg_price
        FROM orders_param_v
        WHERE o_totalprice BETWEEN :lo AND :hi
          AND o_orderdate >= :cutoff
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        args={"lo": 1000.0, "hi": 150000.0,
              "cutoff": "1995-01-01 00:00:00"})


# ---------------------------------------------------------------------------
# Dynamic partition overwrite — INSERT OVERWRITE of matched partitions only
# ---------------------------------------------------------------------------

@query(
    "dynamic_partition_overwrite",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price
        FROM orders
    ),
    final AS (
        SELECT o_orderpriority,
               -- duckdb CAST(decimal) is half-to-even; round() is
               -- half-away-from-zero, matching Spark's decimal cast
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN CAST(round(price * CAST(1.1 AS DECIMAL(2,1)), 2)
                              AS DECIMAL(18,2))
                    ELSE price END AS price
        FROM base
    )
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(price) AS DOUBLE) AS total
    FROM final
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def dynamic_partition_overwrite(spark, sf_dir):
    """``partitionOverwriteMode=dynamic``: rewriting two partitions of
    a partitioned table replaces ONLY those partitions — the others'
    files are untouched (no full-table rewrite).  This is the
    idempotent daily-reload primitive at warehouse scale; the final
    table state is oracle-checked.  Mirrors the reference's
    mirror-consistency rename/delete sweeps
    (``TestSidecarCachingOutputStream.java:252-341``) at partition
    granularity."""
    out = tempfile.mkdtemp(prefix="sidecar-dpo-")
    try:
        o = t(spark, sf_dir, "orders").select(
            "o_orderpriority",
            F.round("o_totalprice", 2).cast("decimal(18,2)").alias("price"))
        (o.write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(out))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            hot = (o.where(F.col("o_orderpriority")
                           .isin("1-URGENT", "2-HIGH"))
                   .withColumn(
                       "price",
                       F.expr("CAST(price * CAST(1.1 AS DECIMAL(2,1)) "
                              "AS DECIMAL(18,2))")))
            (hot.write.mode("overwrite").partitionBy("o_orderpriority")
             .parquet(out))
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev)
        rows = (
            spark.read.parquet(out)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("price").cast("double").alias("total"))
            .orderBy("o_orderpriority")
            .collect())
        return spark.createDataFrame(
            rows, "o_orderpriority string, n bigint, total double")
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Null-safe equality join (<=>) + null-handling scalar family
# ---------------------------------------------------------------------------

@query(
    "null_safe_join",
    oracle="""
    WITH c AS (
      SELECT nullif(c_nationkey % 25, 3) AS k, c_acctbal FROM customer
    ), s AS (
      SELECT nullif(s_nationkey % 25, 3) AS k, s_acctbal FROM supplier
    )
    SELECT c.k IS NULL AS null_group,
           count(*) AS n_pairs,
           round(sum(coalesce(c.c_acctbal, 0)
                     + CASE WHEN s.s_acctbal IS NOT NULL
                            THEN s.s_acctbal ELSE -1 END), 2) AS bal_sum
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k IS NULL
    ORDER BY null_group
    """,
)
def null_safe_join(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics MERGE
    and dedup reconciliation need.  Plan note for scale: `<=>` is an
    equi-join key (hash-partitionable, no nested loop), but all NULLs
    hash to ONE partition — a null-heavy key needs the same salting
    treatment as any skewed hot key (skew_salted_join).  coalesce /
    nullif / nvl2 ride along as the null-scalar family."""
    c = t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 25, F.lit(3)).alias("k"),
        "c_acctbal")
    s = t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 25, F.lit(3)).alias("k2"),
        "s_acctbal")
    return (
        c.join(s, F.col("k").eqNullSafe(F.col("k2")))
        .groupBy(F.isnull("k").alias("null_group"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.round(F.sum(F.coalesce(F.col("c_acctbal"), F.lit(0))
                           + F.expr("nvl2(s_acctbal, s_acctbal, -1)")), 2)
             .alias("bal_sum"))
        .orderBy("null_group")
    )


# ---------------------------------------------------------------------------
# Struct (row-value) comparison semantics
# ---------------------------------------------------------------------------

@query(
    "struct_compare_functions",
    oracle="""
    SELECT l_returnflag,
           count(CASE WHEN (l_discount, l_tax) > (l_tax, l_discount)
                      THEN 1 END) AS n_disc_gt,
           count(CASE WHEN (l_quantity, l_extendedprice)
                           <= (25.0, 30000.0) THEN 1 END) AS n_small,
           count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_pairs
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def struct_compare_functions(spark, sf_dir):
    """Row-value (struct) comparison: lexicographic tuple ordering and
    tuple DISTINCT — the SQL row-constructor semantics
    (`(a,b) < (c,d)`), which Spark expresses as struct() columns.
    Tuple comparisons compile to short-circuit scalar comparisons in
    codegen (no allocation), and tuple-DISTINCT is one hash-agg over
    a composite key — the same plan as multi-column DISTINCT."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(
                F.struct("l_discount", "l_tax")
                > F.struct("l_tax", "l_discount"), 1)).alias("n_disc_gt"),
            F.count(F.when(
                F.struct("l_quantity", "l_extendedprice")
                <= F.struct(F.lit(25.0), F.lit(30000.0)), 1))
            .alias("n_small"),
            F.countDistinct(F.struct("l_returnflag", "l_linestatus"))
            .alias("n_flag_pairs"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# JSON array-of-structs parsing (from_json + explode roundtrip)
# ---------------------------------------------------------------------------

@query(
    "json_array_explode",
    oracle="""
    SELECT event_type,
           count(*) AS n_elems,
           CAST(sum(user_id) + sum(user_id + 1) AS BIGINT) AS sum_u,
           CAST(sum(event_id) * 2 AS BIGINT) AS sum_e
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_array_explode(spark, sf_dir):
    """Array-of-structs JSON ingestion: each event is serialized to a
    2-element JSON array, parsed back with ``from_json`` (array<struct>
    schema), exploded, and aggregated.  The oracle recomputes the same
    sums from the base columns, so the parse→explode pipeline must be
    value-faithful (the roundtrip-audit pattern).  Note the oracle's
    n_elems is count(*) per type TIMES 2 folded as two sums — explode
    doubles rows, visible in the counts."""
    e = t(spark, sf_dir, "events")
    js = F.concat(
        F.lit('[{"u":'), F.col("user_id").cast("string"),
        F.lit(',"e":'), F.col("event_id").cast("string"),
        F.lit('},{"u":'), (F.col("user_id") + 1).cast("string"),
        F.lit(',"e":'), F.col("event_id").cast("string"),
        F.lit("}]"))
    parsed = e.select(
        "event_type",
        F.explode(F.from_json(js, "array<struct<u:bigint,e:bigint>>"))
        .alias("r"))
    out = (
        parsed.groupBy("event_type")
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("n_elems"),
             F.sum("r.u").alias("sum_u"),
             F.sum("r.e").alias("sum_e"))
        .orderBy("event_type")
    )
    return out


# ---------------------------------------------------------------------------
# IGNORE NULLS window fill — LOCF (last observation carried forward)
# ---------------------------------------------------------------------------

@query(
    "window_locf_fill",
    oracle="""
    WITH sparse AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ), filled AS (
      SELECT user_id,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS v_filled
      FROM sparse
    )
    SELECT user_id, count(*) AS n_rows,
           count(v_filled) AS n_filled,
           round(sum(v_filled), 2) AS sum_filled
    FROM filled
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_locf_fill(spark, sf_dir):
    """LOCF gap filling: sensor-style forward fill via
    ``last(v, ignorenulls=True)`` over an unbounded-preceding row
    window — the standard time-series imputation primitive.  One
    shuffle on user_id, sequential scan within partition (no
    per-gap joins); rows before a user's first observation stay NULL
    (count(v_filled) exposes exactly how many filled)."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    sparse = e.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value")).alias("v"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = sparse.select(
        "user_id", F.last("v", ignorenulls=True).over(w).alias("v_filled"))
    return (
        filled.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.count("v_filled").alias("n_filled"),
             F.round(F.sum("v_filled"), 2).alias("sum_filled"))
        .orderBy("user_id")
    )


@query(
    "luhn_checksum_audit",
    oracle="""
    WITH nums AS (
      SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '1') AS acct
      FROM orders WHERE o_orderkey % 97 = 0
    ), digits AS (
      SELECT acct, t.i,
             CAST(substring(reverse(acct), t.i, 1) AS BIGINT) AS d
      FROM nums CROSS JOIN generate_series(1, 10) t(i)
    ), contrib AS (
      SELECT acct,
             sum(CASE WHEN i % 2 = 0
                      THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9
                                ELSE d * 2 END
                      ELSE d END) AS s
      FROM digits GROUP BY acct
    )
    SELECT count(*) AS n_checked,
           CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM contrib
    """,
)
def luhn_checksum_audit(spark, sf_dir):
    """``luhn_check`` (Spark 3.5+): mod-10 checksum validation of
    account-number-shaped strings — the PII/payment-card detection
    primitive a redaction pipeline runs before release.  The oracle
    re-implements Luhn from first principles (reverse, double every
    second digit, subtract 9 on overflow, sum mod 10), so the
    built-in's semantics are pinned digit by digit."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    checked = o.select(
        F.expr("luhn_check(lpad(CAST(o_orderkey AS STRING), 10, '1'))")
        .alias("ok"))
    return checked.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_valid"))


@query(
    "theta_sketch_set_ops",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'click' AND value > 90
    ), b AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value > 90
    )
    SELECT (SELECT count(*) FROM a) AS n_a,
           (SELECT count(*) FROM b) AS n_b,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
               AS n_both,
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
               AS n_a_only,
           (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
               AS n_any
    """,
)
def theta_sketch_set_ops(spark, sf_dir):
    """Theta sketches (DataSketches, Spark 4.1): SET ALGEBRA on
    sketches — intersection, difference, and union of distinct-user
    sets WITHOUT joining the raw data; two fixed-size sketches meet
    on the driver instead of shuffling the keyspace.  Below the
    nominal-entries threshold the sketch retains every hash, so the
    estimates here are EXACT and the exact set-op counts are a true
    oracle (the same exact-regime audit pattern as approx_top_k /
    HLL).  At 100 TB this replaces three distinct-count jobs and an
    intersect join with one pass per side — the sketch union/
    intersection math (KMV lowest-k hashes) is order- and
    partitioning-insensitive, which is what makes the result
    deterministic."""
    e = t(spark, sf_dir, "events")
    a = (e.where((F.col("event_type") == "click") & (F.col("value") > 90))
         .agg(F.theta_sketch_agg("user_id").alias("sa")))
    b = (e.where((F.col("event_type") == "purchase")
                 & (F.col("value") > 90))
         .agg(F.theta_sketch_agg("user_id").alias("sb")))
    est = F.theta_sketch_estimate
    return (
        a.crossJoin(b)
        .select(
            est("sa").cast("long").alias("n_a"),
            est("sb").cast("long").alias("n_b"),
            est(F.theta_intersection("sa", "sb")).cast("long")
            .alias("n_both"),
            est(F.theta_difference("sa", "sb")).cast("long")
            .alias("n_a_only"),
            est(F.theta_union("sa", "sb")).cast("long").alias("n_any"),
        )
    )


@query(
    "aes_roundtrip_audit",
    oracle="""
    SELECT p_brand, count(*) AS n,
           CAST(sum(length(p_name)) AS BIGINT) AS total_len,
           count(DISTINCT p_name) AS n_distinct
    FROM part
    WHERE p_partkey % 13 = 0
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def aes_roundtrip_audit(spark, sf_dir):
    """Column-level encryption surface: aes_encrypt → aes_decrypt
    round trip (ECB keying here ONLY because the audit needs
    determinism; production uses the default GCM whose random IV
    makes ciphertexts non-reproducible by design).  The aggregate
    runs over the DECRYPTED values, so any corruption in the
    encrypt/decrypt pair breaks the oracle hash — the
    transport-integrity audit pattern applied to crypto."""
    key = "0123456789abcdef"
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") % 13 == 0)
    enc = F.expr(f"aes_encrypt(p_name, '{key}', 'ECB')")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(p_name, '{key}', 'ECB'), "
        f"'{key}', 'ECB') AS STRING)")
    return (
        p.select("p_brand", dec.alias("name_rt"), enc.alias("ct"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("name_rt")).alias("total_len"),
             F.countDistinct("name_rt").alias("n_distinct"))
        .orderBy("p_brand")
    )


@query(
    "kll_quantile_sketch_audit",
    oracle="""
    WITH pu AS (
      SELECT user_id, round(avg(value), 6) AS v
      FROM events GROUP BY user_id
    )
    SELECT CAST((SELECT count(*) FROM pu) AS BIGINT) AS n_items,
           round((SELECT quantile_disc(v, 0.25) FROM pu), 6) AS q25,
           round((SELECT quantile_disc(v, 0.50) FROM pu), 6) AS q50,
           round((SELECT quantile_disc(v, 0.90) FROM pu), 6) AS q90,
           round((SELECT quantile_disc(v, 0.50) FROM pu), 6) AS q50_merged
    """,
)
def kll_quantile_sketch_audit(spark, sf_dir):
    """KLL quantile sketches (DataSketches, Spark 4.1): mergeable
    streaming quantiles in fixed memory — the scale path for
    percentile monitoring where exact sorts are impossible.  Run in
    the exact regime (items ≤ k, no compaction) the sketch IS the
    data, so DuckDB's quantile_disc is a true oracle; the merged
    column unions two half-population sketches (kll_merge_agg) and
    must agree with the whole-population quantile — the
    mergeability contract that makes per-partition sketches
    shuffle-free at 100 TB."""
    e = t(spark, sf_dir, "events")
    pu = (e.groupBy("user_id")
          .agg(F.round(F.avg("value"), 6).alias("v")))
    whole = pu.agg(F.kll_sketch_agg_double("v").alias("s"))
    halves = (
        pu.withColumn("h", (F.col("user_id") % 2).cast("int"))
        .groupBy("h").agg(F.kll_sketch_agg_double("v").alias("hs"))
        .agg(F.expr("kll_merge_agg_double(hs)").alias("ms")))
    return (
        whole.crossJoin(halves)
        .select(
            F.expr("kll_sketch_get_n_double(s)").alias("n_items"),
            F.round(F.expr("kll_sketch_get_quantile_double(s, 0.25)"), 6)
            .alias("q25"),
            F.round(F.expr("kll_sketch_get_quantile_double(s, 0.50)"), 6)
            .alias("q50"),
            F.round(F.expr("kll_sketch_get_quantile_double(s, 0.90)"), 6)
            .alias("q90"),
            F.round(F.expr("kll_sketch_get_quantile_double(ms, 0.50)"), 6)
            .alias("q50_merged"),
        )
    )


@query(
    "timezone_conversion",
    oracle="""
    SELECT strftime(min(ts + INTERVAL '5 hours 30 minutes'),
                    '%Y-%m-%d %H:%M:%S') AS first_ist,
           strftime(max(ts - INTERVAL '8 hours'),
                    '%Y-%m-%d %H:%M:%S') AS last_pst_fixed,
           count(CASE WHEN CAST(strftime(ts + INTERVAL '5 hours 30 minutes',
                                         '%H') AS BIGINT) < 6
                      THEN 1 END) AS n_ist_night
    FROM events
    """,
)
def timezone_conversion(spark, sf_dir):
    """Timezone shifting: ``from_utc_timestamp`` to fixed-offset zones
    (+05:30 / -08:00) — pinned against plain interval arithmetic,
    which for fixed offsets is exactly what the function must do
    (named DST zones differ per-row by rule table; the fixed-offset
    audit isolates the mechanism).  ``convert_timezone`` with an
    explicit source zone rides along.  All codegen expressions in
    the aggregate pass."""
    e = t(spark, sf_dir, "events")
    ist = F.from_utc_timestamp("ts", "+05:30")
    pst = F.convert_timezone(F.lit("UTC"), F.lit("-08:00"),
                             F.col("ts").cast("timestamp_ntz"))
    return e.agg(
        F.date_format(F.min(ist), "yyyy-MM-dd HH:mm:ss")
        .alias("first_ist"),
        F.date_format(F.max(pst), "yyyy-MM-dd HH:mm:ss")
        .alias("last_pst_fixed"),
        F.count(F.when(F.hour(ist) < 6, 1)).alias("n_ist_night"))


@query(
    "json_introspection",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(len(json_keys(props))) AS BIGINT) AS total_keys,
           count(CASE WHEN json_array_length(
                   '[' || CAST(user_id AS VARCHAR) || ','
                       || CAST(event_id AS VARCHAR) || ']') = 2
                 THEN 1 END) AS n_pairs,
           min(json_keys(props)[1]) AS first_key
    FROM events
    WHERE event_id % 501 = 0
    """,
)
def json_introspection(spark, sf_dir):
    """JSON introspection without schemas: json_object_keys (what
    fields does this payload actually have — the schema-discovery
    probe for semi-structured feeds), json_array_length, and
    first-key extraction.  Complements events_json_extract (typed
    extraction) and variant_extract (VARIANT): this is the
    exploratory pass you run BEFORE committing to a schema."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") % 501 == 0)
    keys = F.json_object_keys("props")
    arr = F.concat(F.lit("["), F.col("user_id").cast("string"),
                   F.lit(","), F.col("event_id").cast("string"),
                   F.lit("]"))
    return e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(keys)).alias("total_keys"),
        F.count(F.when(F.json_array_length(arr) == 2, 1))
        .alias("n_pairs"),
        F.min(F.element_at(keys, 1)).alias("first_key"))


@query(
    "csv_codec_expression",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey % 301 = 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def csv_codec_expression(spark, sf_dir):
    """Row-level CSV codec expressions: ``to_csv`` renders each order
    row to a CSV line, ``from_csv`` (schema'd) parses it back, and
    the aggregate runs over the RECOVERED struct — the roundtrip
    audit for the expression-level codec (the file-level CSV
    round-trip is csv_roundtrip_agg; this is the per-record variant
    used inside message pipelines, no files involved)."""
    e = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 301 == 0)
    line = F.to_csv(F.struct("o_custkey", "o_orderstatus", "o_totalprice"))
    back = F.from_csv(
        line, "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
    return (
        e.select(back.alias("r"))
        .groupBy(F.col("r.o_orderstatus").alias("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("r.o_custkey").alias("sum_cust"),
             F.round(F.sum("r.o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


@query(
    "bitmap_agg_functions",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_exact,
           count(DISTINCT o_custkey) AS n_bitmap
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bitmap_agg_functions(spark, sf_dir):
    """Native bitmap aggregates (Spark 3.5): bitmap_bit_position →
    bitmap_construct_agg per 32k-key segment, bitmap_count +
    sum — EXACT distinct counting as bitwise OR over fixed 4 KB
    bitmaps, the same math as the hand-rolled bitmap_distinct_audit
    but with the built-in functions.  Bitmaps partial-aggregate
    map-side (OR is associative/commutative), so the shuffle carries
    one 4 KB value per (group, segment) regardless of row count —
    the exact-COUNT-DISTINCT scale recipe when sketches aren't
    allowed."""
    o = t(spark, sf_dir, "orders")
    seg = (
        o.select("o_orderpriority",
                 # bitmap_bit_position is (k-1) % 32768 → the segment
                 # index must be (k-1) div 32768 to partner it
                 F.floor((F.col("o_custkey") - 1) / 32768).alias("seg"),
                 F.expr("bitmap_bit_position(o_custkey)").alias("pos"))
        .groupBy("o_orderpriority", "seg")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm")))
    return (
        seg.groupBy("o_orderpriority")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_bitmap"))
        .join(
            o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_exact")),
            "o_orderpriority")
        .select("o_orderpriority", "n_exact", "n_bitmap")
        .orderBy("o_orderpriority")
    )


@query(
    "string_locator_functions",
    oracle="""
    SELECT p_partkey,
           position('o' IN p_name) AS first_o,
           list_position(string_split('STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO',
                                      ','),
                         upper(split_part(p_type, ' ', 1))) AS type_slot,
           array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ')
               AS first_two_words
    FROM part
    WHERE p_partkey % 149 = 0
    ORDER BY p_partkey
    """,
)
def string_locator_functions(spark, sf_dir):
    """String locators: instr (first occurrence position),
    find_in_set (slot lookup in a comma-list — the enum-ordinal
    idiom), substring_index (prefix up to the Nth delimiter).  The
    oracle rebuilds each from DuckDB primitives (position,
    list_position over a split, list_slice+join) — pinning Spark's
    1-based/0-on-missing conventions exactly."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") % 149 == 0)
    return (
        p.select(
            "p_partkey",
            F.instr("p_name", "o").alias("first_o"),
            F.expr("find_in_set(upper(split_part(p_type, ' ', 1)), "
                   "'STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO')")
            .alias("type_slot"),
            F.substring_index("p_name", " ", 2).alias("first_two_words"))
        .orderBy("p_partkey")
    )


@query(
    "str_to_map_parse",
    oracle="""
    WITH kv AS (
      SELECT o_orderkey,
             'status:' || o_orderstatus || ',prio:' ||
                 split_part(o_orderpriority, '-', 1) || ',bucket:' ||
                 CAST(o_orderkey % 7 AS VARCHAR) AS s
      FROM orders WHERE o_orderkey % 401 = 0
    )
    SELECT o_orderkey,
           regexp_extract(s, 'status:([^,]+)', 1) AS status,
           regexp_extract(s, 'prio:([^,]+)', 1) AS prio,
           CAST(regexp_extract(s, 'bucket:([^,]+)', 1) AS BIGINT)
               AS bucket,
           3 AS n_keys
    FROM kv
    ORDER BY o_orderkey
    """,
)
def str_to_map_parse(spark, sf_dir):
    """str_to_map: parse 'k:v,k:v' config/tag strings straight into a
    map column — the one-liner for label/annotation columns that
    arrive as delimited text.  Map access then replaces a regex per
    field (the oracle does exactly those regexes, proving
    equivalence); size() rides along as the key count."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 401 == 0)
    s = F.concat(
        F.lit("status:"), F.col("o_orderstatus"),
        F.lit(",prio:"), F.split_part("o_orderpriority", F.lit("-"),
                                      F.lit(1)),
        F.lit(",bucket:"), (F.col("o_orderkey") % 7).cast("string"))
    m = F.str_to_map(s, F.lit(","), F.lit(":"))
    return (
        o.select(
            "o_orderkey",
            F.element_at(m, "status").alias("status"),
            F.element_at(m, "prio").alias("prio"),
            F.element_at(m, "bucket").cast("long").alias("bucket"),
            F.size(m).alias("n_keys"))
        .orderBy("o_orderkey")
    )


@query(
    "reflect_java_digest",
    oracle="""
    SELECT c_custkey, sha256(c_name) AS digest
    FROM customer
    WHERE c_custkey % 211 = 0
    ORDER BY c_custkey
    """,
)
def reflect_java_digest(spark, sf_dir):
    """JVM interop surface: ``reflect()`` calls an arbitrary static
    Java method from SQL — here commons-codec's
    ``DigestUtils.sha256Hex`` (already on Spark's classpath), pinned
    against DuckDB's native sha256.  reflect() is the escape hatch
    for JVM-library logic without building a UDF jar; it is
    reflection-per-row (no codegen), so reserve it for cold paths —
    the built-in sha2() is the hot-path twin, which is exactly what
    the matching digests prove."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") % 211 == 0)
    return (
        c.select(
            "c_custkey",
            F.expr("reflect('org.apache.commons.codec.digest.DigestUtils',"
                   " 'sha256Hex', c_name)").alias("digest"))
        .orderBy("c_custkey")
    )


@query(
    "per_group_reservoir_sample",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                             || ':rsv'), 1, 15))::BIGINT,
                        o_orderkey) AS rk
      FROM orders
    )
    SELECT o_orderpriority, count(*) AS n_sampled,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM ranked WHERE rk <= 100
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def per_group_reservoir_sample(spark, sf_dir):
    """Deterministic per-group reservoir: exactly 100 rows per group,
    selected by ranking on a salted hash — uniform (md5 order is
    independent of any data order) yet fully reproducible, unlike
    rand()-based reservoirs.  One shuffle on the group key; the
    hash ranking replaces the sequential reservoir scan with a
    parallel top-k, which is the distributed form of reservoir
    sampling.  The audit fixes the exact sampled set via the key
    sum."""
    from pyspark.sql import Window as W
    from sidecar_spark.functions.dedup import hash60

    o = t(spark, sf_dir, "orders")
    rk = F.row_number().over(
        W.partitionBy("o_orderpriority")
        .orderBy(hash60(F.concat(F.col("o_orderkey").cast("string"),
                                 F.lit(":rsv"))), "o_orderkey"))
    return (
        o.select("o_orderpriority", "o_orderkey", rk.alias("rk"))
        .where(F.col("rk") <= 100)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.sum("o_orderkey").alias("key_sum"))
        .orderBy("o_orderpriority")
    )


@query(
    "data_contract_gate",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_discount), 2) AS max_disc
    FROM lineitem
    """,
)
def data_contract_gate(spark, sf_dir):
    """In-plan data contracts: ``assert_true`` expressions evaluated
    on EVERY row during the same pass as the aggregate — quantities
    positive, discounts in [0,1], ship dates sane.  A violated
    contract fails the JOB (loudly, with the row's message), not a
    downstream consumer three pipelines later; a passing gate costs
    one fused projection, no extra scan.  The returned summary is
    ordinary — the point is that it only exists if every row passed."""
    li = t(spark, sf_dir, "lineitem")
    gated = li.select(
        "l_orderkey", "l_quantity", "l_discount",
        F.assert_true(F.col("l_quantity") > 0,
                      F.lit("non-positive quantity")).alias("_c1"),
        F.assert_true((F.col("l_discount") >= 0)
                      & (F.col("l_discount") <= 1),
                      F.lit("discount out of range")).alias("_c2"),
    )
    return gated.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_discount"), 2).alias("max_disc"))


@query(
    "input_file_lineage",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows
    FROM lineitem
    """,
)
def input_file_lineage(spark, sf_dir):
    """Row-level lineage columns: ``input_file_name()`` and the hidden
    ``_metadata.file_name`` struct (Spark 3.2+ file metadata) — which
    physical file produced each row, the first question of any
    corrupt-output investigation.  Both columns are virtual (no
    storage, resolved by the scan), and the entry cross-checks them
    against each other inside the aggregate; the oracle pins the
    basename, which is layout-stable even though full paths are
    environment-specific."""
    import os as _os

    df = spark.read.parquet(_os.path.join(sf_dir, "lineitem.parquet"))
    base_a = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        df.select(base_a.alias("f1"),
                  F.col("_metadata.file_name").alias("f2"))
        .where(F.col("f1") == F.col("f2"))  # the cross-check
        .groupBy(F.col("f1").alias("file_name"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "try_parse_temporal",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0
                  THEN 'not-a-date'
                  ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS s,
             ((o_orderkey % 7) - 3) AS signed_k
      FROM orders WHERE o_orderkey < 20000
    )
    SELECT count(*) AS n,
           count(try_strptime(s, '%Y-%m-%d %H:%M:%S')) AS n_parsed,
           count(CASE WHEN try_strptime(s, '%Y-%m-%d %H:%M:%S') IS NULL
                      THEN 1 END) AS n_rejected,
           strftime(min(try_strptime(s, '%Y-%m-%d %H:%M:%S')),
                    '%Y-%m-%d') AS first_day,
           CAST(sum(((signed_k % 5) + 5) % 5) AS BIGINT) AS pmod_sum
    FROM raw
    """,
)
def try_parse_temporal(spark, sf_dir):
    """Error-tolerant ingest parsing: ``try_to_timestamp`` turns
    malformed rows into NULLs instead of failing the job (the ANSI
    try_* contract applied to temporal parsing — every fifth row here
    is deliberately broken), with parsed/rejected counts as the
    ingest-quality report.  ``pmod`` rides along: positive-modulus
    semantics on signed values (pmod(-3,5)=2, vs %'s -3) — the
    bucket-assignment edge case that silently corrupts hash
    partitioning when % is used on signed keys."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 20000)
    s = F.when(F.col("o_orderkey") % 5 == 0, F.lit("not-a-date")) \
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    parsed = F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss"))
    signed_k = (F.col("o_orderkey") % 7) - 3
    return (
        o.select(parsed.alias("ts"), signed_k.alias("signed_k"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count("ts").alias("n_parsed"),
             F.count(F.when(F.isnull("ts"), 1)).alias("n_rejected"),
             F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"),
             F.sum(F.pmod("signed_k", F.lit(5))).alias("pmod_sum"))
    )


@query(
    "window_time_accessor",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR
                    - INTERVAL 1 MICROSECOND,
                    '%Y-%m-%d %H:%M:%S.%f') AS event_time,
           count(*) AS n
    FROM events
    GROUP BY date_trunc('hour', ts)
    ORDER BY window_start
    """,
)
def window_time_accessor(spark, sf_dir):
    """``window_time()``: the event-time representative of a window
    struct (window.end − 1 µs) — the column you chain into a SECOND
    windowed aggregation (re-windowing hourly results into days)
    without off-by-one-interval errors at window boundaries.  Pinned
    here against explicit interval arithmetic on the batch window
    struct."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            F.date_format(F.window_time("w"),
                          "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("event_time"),
            "n")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4.0+): BEGIN/DECLARE/WHILE control flow
# ---------------------------------------------------------------------------

@query(
    "sql_scripting_block",
    oracle="""
    SELECT 5 AS n_steps,
           (SELECT count(*) FROM orders
            WHERE substr(o_orderpriority, 1, 1) IN ('1','2','3','4','5'))
               AS n_orders_via_loop,
           (SELECT CAST(round(sum(o_totalprice), 2) AS DOUBLE) FROM orders
            WHERE o_orderpriority LIKE '1-%') AS urgent_revenue
    """,
)
def sql_scripting_block(spark, sf_dir):
    """SQL scripting (BEGIN … END, DECLARE, WHILE/SET — Spark 4.0
    procedural SQL): a loop iterates the five order-priority classes,
    accumulating per-class counts into a session variable via scalar
    subqueries — real scans driven by procedural control flow, not a
    toy arithmetic loop.  The final SELECT returns the accumulated
    totals; the oracle computes the same quantities declaratively.
    Control flow runs on the driver; each statement inside is a full
    Catalyst-planned query, so scripting adds orchestration, not a
    second execution engine — exactly how a 100 TB maintenance job
    (loop over partitions/classes) should be structured."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_v")
    return spark.sql("""
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE n_total BIGINT DEFAULT 0;
          DECLARE urgent DOUBLE DEFAULT 0.0;
          WHILE i <= 5 DO
            SET n_total = n_total + (
              SELECT count(*) FROM orders_script_v
              WHERE substr(o_orderpriority, 1, 1) = CAST(i AS STRING));
            IF i = 1 THEN
              SET urgent = (
                SELECT round(sum(o_totalprice), 2) FROM orders_script_v
                WHERE o_orderpriority LIKE '1-%');
            END IF;
            SET i = i + 1;
          END WHILE;
          SELECT 5 AS n_steps, n_total AS n_orders_via_loop,
                 urgent AS urgent_revenue;
        END
    """)


# ---------------------------------------------------------------------------
# TIME type (Spark 4.1, spark.sql.timeType.enabled): time-of-day values
# ---------------------------------------------------------------------------

@query(
    "time_of_day_functions",
    oracle="""
    SELECT event_type,
           CAST(min(make_time(hour(ts), minute(ts),
                              CAST(floor(extract(second FROM ts)) AS DOUBLE)))
                AS VARCHAR) AS first_tod,
           CAST(max(make_time(hour(ts), minute(ts),
                              CAST(floor(extract(second FROM ts)) AS DOUBLE)))
                AS VARCHAR) AS last_tod,
           CAST(count(CASE WHEN hour(ts) < 12 THEN 1 END) AS BIGINT) AS n_am
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def time_of_day_functions(spark, sf_dir):
    """The TIME type (Spark 4.1, ANSI time-of-day): build TIME values
    from event timestamps with make_time, aggregate min/max per event
    type (TIME ordering), and serialize back to strings for transport.
    Wall-clock-of-day semantics — 'what time of day does this event
    class start/stop' — need a date-free type; both engines construct
    it with make_time and agree on its string form."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    t(spark, sf_dir, "events").createOrReplaceTempView("events_time_v")
    return spark.sql("""
        SELECT event_type,
               CAST(min(make_time(hour(ts), minute(ts),
                                  CAST(second(ts) AS DOUBLE)))
                    AS STRING) AS first_tod,
               CAST(max(make_time(hour(ts), minute(ts),
                                  CAST(second(ts) AS DOUBLE)))
                    AS STRING) AS last_tod,
               count(CASE WHEN hour(ts) < 12 THEN 1 END) AS n_am
        FROM events_time_v
        GROUP BY event_type
        ORDER BY event_type
    """)


# ---------------------------------------------------------------------------
# map higher-order functions + array_agg
# ---------------------------------------------------------------------------

@query(
    "map_higher_order_functions",
    oracle="""
    WITH per_type AS (
      SELECT user_id % 5 AS cohort, event_type,
             count(*) AS c, sum(value) AS s
      FROM events GROUP BY cohort, event_type)
    SELECT cohort,
           array_to_string(list_transform(
             list_sort(array_agg(event_type)),
             t -> upper(t)), ',') AS keys_upper,
           array_to_string(
             list_transform(
               list_sort(array_agg({'k': event_type,
                                    'v': round(s / c, 4)})),
               e -> e.k || ':' || CAST(e.v AS VARCHAR)), ',') AS avg_map
    FROM per_type
    GROUP BY cohort
    ORDER BY cohort
    """,
)
def map_higher_order_functions(spark, sf_dir):
    """Map higher-order functions — transform_keys, map_zip_with,
    map_from_entries over per-cohort event maps, plus the ANSI
    array_agg alias: two maps (type->count, type->value-sum) zip into
    a type->avg map, keys uppercase via transform_keys, then
    serialized through sorted map_entries for the hash.  DuckDB has no
    map lambdas, so the oracle computes the same result from sorted
    entry lists — which is exactly the serialization contract."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events_maps_v")
    return spark.sql("""
        WITH per_type AS (
          SELECT user_id % 5 AS cohort, event_type,
                 count(*) AS c, sum(value) AS s
          FROM events_maps_v GROUP BY cohort, event_type
        ), maps AS (
          SELECT cohort,
                 array_join(array_sort(transform(
                   array_agg(event_type), t -> upper(t))), ',') AS keys_upper,
                 map_from_entries(sort_array(array_agg(
                   struct(event_type AS k, c AS v)))) AS m_cnt,
                 map_from_entries(sort_array(array_agg(
                   struct(event_type AS k, s AS v)))) AS m_sum
          FROM per_type GROUP BY cohort
        )
        SELECT cohort, keys_upper,
               array_join(transform(
                 sort_array(map_entries(
                   transform_keys(
                     map_zip_with(m_cnt, m_sum,
                                  (k, c, s) -> round(s / c, 4)),
                     (k, v) -> k))),
                 e -> e.key || ':' || CAST(e.value AS STRING)), ',')
                 AS avg_map
        FROM maps
        ORDER BY cohort
    """)


# ---------------------------------------------------------------------------
# generator functions: stack() wide→long + json_tuple extraction
# ---------------------------------------------------------------------------

@query(
    "generator_functions_sql",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, 'n_orders' AS metric, n AS value,
           CAST(CAST(n AS BIGINT) AS VARCHAR) AS from_json
    FROM agg
    UNION ALL
    SELECT o_orderstatus, 'revenue' AS metric, total AS value,
           CAST(CAST(total AS DECIMAL(18,2)) AS VARCHAR) AS from_json
    FROM agg
    ORDER BY o_orderstatus, metric
    """,
)
def generator_functions_sql(spark, sf_dir):
    """Generator functions — stack(n, ...) pivoting a wide aggregate
    to long (metric, value) rows, and json_tuple pulling fields back
    out of a JSON document built from the same row: the long value
    and the JSON-extracted string must agree, which pins both the
    row-multiplicity of stack and the path semantics of json_tuple."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gen_v")
    return spark.sql("""
        WITH agg AS (
          SELECT o_orderstatus,
                 CAST(count(*) AS DOUBLE) AS n,
                 round(sum(o_totalprice), 2) AS total,
                 -- field values as JSON STRINGS: json_tuple re-parses
                 -- JSON numbers into doubles (scientific notation on
                 -- re-serialization); strings pass through verbatim
                 to_json(struct(CAST(count(*) AS STRING) AS n_orders,
                                CAST(CAST(round(sum(o_totalprice), 2)
                                          AS DECIMAL(18,2)) AS STRING)
                                    AS revenue))
                     AS doc
          FROM orders_gen_v GROUP BY o_orderstatus
        ), long AS (
          SELECT o_orderstatus, metric, value, doc
          FROM agg
          LATERAL VIEW stack(2, 'n_orders', n, 'revenue', total)
              s AS metric, value
        )
        SELECT o_orderstatus, metric, value,
               CASE metric
                 WHEN 'n_orders' THEN j.f1
                 ELSE j.f2
               END AS from_json
        FROM long
        LATERAL VIEW json_tuple(doc, 'n_orders', 'revenue') j AS f1, f2
        ORDER BY o_orderstatus, metric
    """)


# ---------------------------------------------------------------------------
# overlay / initcap / next_day / unix_timestamp / months_between
# ---------------------------------------------------------------------------

@query(
    "string_datetime_misc_functions",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 6) AS overlaid,
           array_to_string(list_transform(string_split(p_name, ' '),
             w -> upper(w[1]) || lower(w[2:])), ' ') AS title_name,
           CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS epoch_s,
           strftime(d + INTERVAL ((7 + 1 - isodow(d) - 1) % 7 + 1) DAY,
                    '%Y-%m-%d') AS next_monday,
           CAST(3.0 AS DOUBLE) AS months_fwd
    FROM (SELECT p_partkey, p_name,
                 DATE '1995-01-01' + INTERVAL (p_partkey % 1000) DAY AS d
          FROM part)
    WHERE p_partkey <= 200
    ORDER BY p_partkey
    """,
)
def string_datetime_misc_functions(spark, sf_dir):
    """The remaining string/datetime surface — overlay (splice at
    position), initcap (title-case), next_day (next Monday strictly
    after d), unix_timestamp, months_between (day-aligned dates give
    exact integers): each has a DuckDB twin or a two-line emulation
    (initcap/overlay via word/substr algebra), so every value is
    hash-checked rather than smoke-tested."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    d = F.expr("date_add(DATE'1995-01-01', CAST(p_partkey % 1000 AS INT))")
    return (
        p.select(
            "p_partkey",
            F.expr("overlay(p_name PLACING 'XX' FROM 3 FOR 3)")
            .alias("overlaid"),
            F.initcap(F.lower("p_name")).alias("title_name"),
            F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
            F.date_format(F.next_day(d, "Mon"), "yyyy-MM-dd")
            .alias("next_monday"),
            F.months_between(F.add_months(d, 3), d).alias("months_fwd"))
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# numeric misc: banker's rounding, covariance, hypot/log1p/expm1,
# factorial, nanvl
# ---------------------------------------------------------------------------

@query(
    "numeric_misc_functions",
    oracle="""
    WITH v AS (
      SELECT p_partkey,
             (p_partkey % 10) + 0.5 AS halfv,
             (p_partkey % 100) / 10.0 AS x,
             (p_partkey % 7) * 1.0 AS y
      FROM part WHERE p_partkey <= 500)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CASE WHEN CAST(floor(halfv) AS BIGINT) % 2 = 0
                               THEN floor(halfv) ELSE ceil(halfv) END), 1)
                AS DOUBLE) AS sum_banker,
           round(covar_pop(x, y), 6) AS cov_p,
           round(covar_samp(x, y), 6) AS cov_s,
           round(sum(sqrt(x * x + y * y)), 4) AS sum_hypot,
           round(sum(ln(1 + x)), 4) AS sum_log1p,
           round(sum(exp(x / 10.0) - 1), 4) AS sum_expm1,
           CAST(max(factorial(CAST(p_partkey % 10 AS INT))) AS BIGINT)
               AS max_fact,
           round(sum(CASE WHEN isnan(x / nullif(y, 0)) OR x / nullif(y, 0)
                               IS NULL THEN -1.0
                          ELSE x / nullif(y, 0) END), 4) AS sum_nanvl
    FROM v
    """,
)
def numeric_misc_functions(spark, sf_dir):
    """Remaining numeric surface — bround (banker's half-even, pinned
    on exact .5 ties where it diverges from half-away rounding),
    covar_pop/covar_samp, hypot, log1p/expm1, factorial, and nanvl
    (NaN-coalescing, exercised via 0/0).  The oracle emulates bround
    with floor/ceil parity algebra and nanvl with an isnan CASE —
    every value exact after fixed rounding."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    halfv = (F.col("p_partkey") % 10) + F.lit(0.5)
    x = (F.col("p_partkey") % 100) / 10.0
    y = (F.col("p_partkey") % 7) * 1.0
    ratio = x / F.nullif(y, F.lit(0))
    return p.select(halfv.alias("halfv"), x.alias("x"), y.alias("y"),
                    (F.col("p_partkey") % 10).cast("int").alias("k"),
                    ratio.alias("ratio")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.bround("halfv", 0)), 1).alias("sum_banker"),
        F.round(F.covar_pop("x", "y"), 6).alias("cov_p"),
        F.round(F.covar_samp("x", "y"), 6).alias("cov_s"),
        F.round(F.sum(F.hypot("x", "y")), 4).alias("sum_hypot"),
        F.round(F.sum(F.log1p("x")), 4).alias("sum_log1p"),
        F.round(F.sum(F.expm1(F.col("x") / 10.0)), 4).alias("sum_expm1"),
        F.max(F.factorial("k")).alias("max_fact"),
        F.round(F.sum(F.coalesce(F.nanvl("ratio", F.lit(-1.0)),
                                 F.lit(-1.0))), 4).alias("sum_nanvl"))


# ---------------------------------------------------------------------------
# row identity + collection lambdas: monotonically_increasing_id,
# array_repeat, map_filter, session identity
# ---------------------------------------------------------------------------

@query(
    "identity_and_lambda_functions",
    oracle="""
    WITH v AS (
      SELECT p_partkey % 5 AS cohort,
             p_partkey % 3 AS reps,
             p_partkey % 7 AS a, p_partkey % 11 AS b
      FROM part)
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct_ids,
           CAST(sum(reps) AS BIGINT) AS total_repeats,
           CAST(sum(CASE WHEN a > 3 THEN 1 ELSE 0 END
                    + CASE WHEN b > 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_entries,
           TRUE AS has_session_user
    FROM v
    GROUP BY cohort
    ORDER BY cohort
    """,
)
def identity_and_lambda_functions(spark, sf_dir):
    """Row identity + collection-lambda surface:
    monotonically_increasing_id (values are partition-dependent, so
    the CONTRACT checked is global uniqueness — distinct count equals
    row count), array_repeat (element multiplication), map_filter
    (per-entry predicate), and session_user()/current_user()
    (environment-dependent, checked as non-empty).  Each
    nondeterministic-by-value feature is pinned by the invariant it
    actually guarantees — the only honest way to oracle identity
    functions."""
    p = t(spark, sf_dir, "part")
    v = p.select(
        (F.col("p_partkey") % 5).alias("cohort"),
        F.monotonically_increasing_id().alias("mid"),
        F.array_repeat(F.col("p_brand"),
                       (F.col("p_partkey") % 3).cast("int")).alias("arr"),
        F.map_filter(
            F.create_map(F.lit("a"), F.col("p_partkey") % 7,
                         F.lit("b"), F.col("p_partkey") % 11),
            lambda k, val: val > 3).alias("kept"),
        (F.length(F.session_user()) > 0).alias("su"))
    return (
        v.groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.count_distinct("mid").alias("n_distinct_ids"),
             F.sum(F.size("arr")).alias("total_repeats"),
             F.sum(F.size("kept")).alias("kept_entries"),
             F.bool_and("su").alias("has_session_user"))
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# state-metadata reader: checkpoint operator topology introspection
# ---------------------------------------------------------------------------

@query(
    "state_metadata_reader",
    oracle="""
    SELECT 0 AS operatorId, 'stateStoreSave' AS operatorName,
           'default' AS stateStoreName, 4 AS numPartitions,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_state_keys
    FROM events
    """,
)
def state_metadata_reader(spark, sf_dir):
    """The state-METADATA reader (Spark 4): operator topology of a
    checkpoint — operator ids/names, store names, partition counts —
    without touching row data; the companion to the statestore row
    reader (statestore_reader).  The metadata's operator layout is
    deterministic for a given plan, so it oracles exactly; the key
    count cross-check ties the metadata to the same aggregation state
    the row reader sees.  At scale this is how you inventory a
    production checkpoint (which operators, how many stores, batch
    span) before surgery."""
    from sidecar_spark.streaming.ops import (await_bounded,
        events_stream, scratch_dir)

    ckpt = scratch_dir("sidecar-smr-ckpt-")
    try:
        counts = (events_stream(spark, sf_dir)
                  .groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("cnt")))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (counts.writeStream.format("noop")
                 .outputMode("complete")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            await_bounded(q)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        md = (spark.read.format("state-metadata").load(ckpt)
              .select("operatorId", "operatorName", "stateStoreName",
                      "numPartitions"))
        keys = (spark.read.format("statestore").load(ckpt)
                .agg(F.count(F.lit(1)).alias("n_state_keys")))
        out = md.crossJoin(keys)  # 1x1: metadata row + key count
        return out.localCheckpoint(eager=True)
    finally:
        import shutil
        shutil.rmtree(ckpt, ignore_errors=True)


@query(
    "statestore_change_feed",
    oracle="""
    SELECT 0 AS batch_id, 'update' AS change_type, event_type,
           count(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def statestore_change_feed(spark, sf_dir):
    """The state-store CHANGE FEED reader (Spark 4,
    readChangeFeed=true): per-batch change events (update/delete) of
    keyed state rows — the CDC view of a checkpoint, where the plain
    statestore source is its snapshot view.  A single-backlog
    complete-mode aggregation puts every key exactly once in batch 0,
    so the feed must contain exactly one 'update' per event_type
    carrying the final count — which is precisely what the oracle
    states.  At scale this reader is the basis for state audits and
    cross-checkpoint diffing without replaying the stream."""
    from sidecar_spark.streaming.ops import (await_bounded,
        events_stream, scratch_dir)

    ckpt = scratch_dir("sidecar-scf-ckpt-")
    try:
        counts = (events_stream(spark, sf_dir)
                  .groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("cnt")))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (counts.writeStream.format("noop")
                 .outputMode("complete")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            await_bounded(q)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        cf = (spark.read.format("statestore")
              .option("readChangeFeed", "true")
              .option("changeStartBatchId", 0)
              .load(ckpt))
        # the state VALUE struct carries the physical aggregate name
        # ("count"), not the query alias — part of the reader contract
        out = (cf.select("batch_id", "change_type",
                         F.col("key.event_type").alias("event_type"),
                         F.col("value.count").alias("cnt"))
               .orderBy("event_type"))
        return out.localCheckpoint(eager=True)
    finally:
        import shutil
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# schema introspection + session identity functions
# ---------------------------------------------------------------------------

@query(
    "schema_introspection_functions",
    oracle="""
    SELECT 'STRUCT<a: BIGINT, b: ARRAY<DOUBLE>>' AS json_schema,
           'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>' AS csv_schema,
           'OBJECT<a: BIGINT>' AS variant_schema,
           'array<int>' AS arr_type,
           'decimal(12,2)' AS dec_type,
           'spark_catalog' AS catalog,
           'default' AS schema_name,
           TRUE AS has_version,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def schema_introspection_functions(spark, sf_dir):
    """Schema-introspection surface — schema_of_json / schema_of_csv /
    schema_of_variant (plan-time schema inference from sample
    documents), typeof (runtime type names), current_catalog /
    current_schema (session identity; deterministic in a default
    session), and version() (environment-dependent, checked
    non-empty).  These are the discovery functions an ingestion
    pipeline calls BEFORE committing to a schema; their string forms
    are part of the stable API and oracle as literals."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_introspect_v")
    return spark.sql("""
        SELECT schema_of_json('{"a":1,"b":[1.5]}') AS json_schema,
               schema_of_csv('1,x,3.5') AS csv_schema,
               schema_of_variant(parse_json('{"a":1}')) AS variant_schema,
               typeof(array(1, 2)) AS arr_type,
               typeof(CAST(1 AS DECIMAL(12,2))) AS dec_type,
               current_catalog() AS catalog,
               current_schema() AS schema_name,
               length(version()) > 0 AS has_version,
               count(*) AS n_orders
        FROM orders_introspect_v
    """)


# ---------------------------------------------------------------------------
# interval constructors, bit access, regexp_instr, try-aggregates
# ---------------------------------------------------------------------------

@query(
    "interval_bit_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey,
             o_orderkey % 30 AS d,
             o_orderkey % 24 AS h,
             repeat('a', CAST(o_orderkey % 5 AS INT)) || 'X9' AS s
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum((o_orderkey >> 2) & 1) AS BIGINT) AS bits2,
           CAST(sum((o_orderkey >> 5) & 1) AS BIGINT) AS bits5,
           CAST(sum(o_orderkey % 5 + 2) AS BIGINT) AS instr_sum,
           CAST(round(sum(CAST(d AS DOUBLE) * 86400.0
                           + CAST(h AS DOUBLE) * 3600.0), 1)
                AS DOUBLE) AS dt_interval_secs,
           CAST(sum(12 * 2 + (o_orderkey % 12)) AS BIGINT) AS ym_months,
           CAST(round(sum(CAST(o_orderkey AS DOUBLE)), 1)
                AS DOUBLE) AS try_sum_v,
           CAST(round(avg(CAST(o_orderkey AS DOUBLE)), 6)
                AS DOUBLE) AS try_avg_v,
           bool_and(o_orderkey > 0) AS every_pos,
           bool_or(o_orderkey % 99 = 0) AS any_99
    FROM v
    """,
)
def interval_bit_functions(spark, sf_dir):
    """Interval constructors (make_dt_interval / make_ym_interval,
    verified through their second/month magnitudes), bit access
    (getbit / bit_get), regexp_instr (match position pinned by
    construction: k 'a's then a digit at k+2), try_sum / try_avg
    (overflow-tolerant aggregates; equal to the plain forms on
    in-range data), and every / any boolean aggregates."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    v = o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 30).alias("d"),
        (F.col("o_orderkey") % 24).alias("h"),
        F.concat(F.repeat(F.lit("a"),
                          (F.col("o_orderkey") % 5).cast("int")),
                 F.lit("X9")).alias("s"))
    v.createOrReplaceTempView("interval_bits_v")
    return spark.sql("""
        SELECT count(*) AS n,
               sum(getbit(o_orderkey, 2)) AS bits2,
               sum(bit_get(o_orderkey, 5)) AS bits5,
               sum(regexp_instr(s, '[0-9]')) AS instr_sum,
               CAST(round(sum(CAST(extract(SECOND FROM make_dt_interval(
                     CAST(d AS INT), CAST(h AS INT), 0, 0.0)) AS DOUBLE)
                   + extract(MINUTE FROM make_dt_interval(
                     CAST(d AS INT), CAST(h AS INT), 0, 0.0)) * 60.0
                   + extract(HOUR FROM make_dt_interval(
                     CAST(d AS INT), CAST(h AS INT), 0, 0.0)) * 3600.0
                   + extract(DAY FROM make_dt_interval(
                     CAST(d AS INT), CAST(h AS INT), 0, 0.0)) * 86400.0),
                   1) AS DOUBLE) AS dt_interval_secs,
               sum(extract(YEAR FROM make_ym_interval(
                     2, CAST(o_orderkey % 12 AS INT))) * 12
                   + extract(MONTH FROM make_ym_interval(
                     2, CAST(o_orderkey % 12 AS INT)))) AS ym_months,
               CAST(round(try_sum(CAST(o_orderkey AS DOUBLE)), 1)
                    AS DOUBLE) AS try_sum_v,
               CAST(round(try_avg(CAST(o_orderkey AS DOUBLE)), 6)
                    AS DOUBLE) AS try_avg_v,
               every(o_orderkey > 0) AS every_pos,
               any(o_orderkey % 99 = 0) AS any_99
        FROM interval_bits_v
    """)


# ---------------------------------------------------------------------------
# generator outer variants: inline / inline_outer / posexplode_outer
# ---------------------------------------------------------------------------

@query(
    "generator_outer_variants",
    oracle="""
    -- arithmetic replay of the generators: a NULL array yields ONE
    -- null-padded row (a = -1 sentinel, pos = -1); a 2-element array
    -- yields rows a = k%7, k%11 and pos 0, 1
    SELECT CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 2 END)
                AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_rows,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN -1
                         ELSE o_orderkey % 7 + o_orderkey % 11 END)
                AS BIGINT) AS sum_a,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN -1 ELSE 1 END)
                AS BIGINT) AS sum_pos
    FROM orders WHERE o_orderkey <= 300
    """,
)
def generator_outer_variants(spark, sf_dir):
    """Outer generator variants — inline_outer (array-of-structs to
    columns, null array preserved as a null row) with posexplode_outer
    (position-preserving explode, same null contract): every 3rd
    order carries a NULL array and must survive as exactly one
    null-padded row in both generators.  DuckDB replays the same
    semantics with LEFT JOIN LATERAL unnest; the null-row and
    multiplicity accounting is the test."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    src = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.array(
                F.struct((F.col("o_orderkey") % 7).alias("a"),
                         F.col("o_orderstatus").alias("b")),
                F.struct((F.col("o_orderkey") % 11).alias("a"),
                         F.lit("z").alias("b")))).alias("arr"))
    src.createOrReplaceTempView("gen_outer_v")
    inl = spark.sql("""
        SELECT o_orderkey, a FROM gen_outer_v
        LATERAL VIEW OUTER inline_outer(arr) AS a, b
    """)
    pos = spark.sql("""
        SELECT o_orderkey, pos FROM gen_outer_v
        LATERAL VIEW OUTER posexplode_outer(arr) AS pos, val
    """)
    joined = (inl.groupBy("o_orderkey")
              .agg(F.count(F.lit(1)).alias("n_i"),
                   F.sum(F.when(F.col("a").isNull(), 1).otherwise(0))
                   .alias("nulls_i"),
                   F.sum(F.coalesce(F.col("a"), F.lit(-1))).alias("sa"))
              .join(pos.groupBy("o_orderkey")
                    .agg(F.sum(F.coalesce(F.col("pos"), F.lit(-1)))
                         .alias("sp")), "o_orderkey"))
    return joined.agg(
        F.sum("n_i").alias("n_rows"),
        F.sum("nulls_i").alias("n_null_rows"),
        F.sum("sa").alias("sum_a"),
        F.sum("sp").alias("sum_pos"))


# ---------------------------------------------------------------------------
# SQL session variables (DECLARE / SET VAR) + IDENTIFIER indirection
# ---------------------------------------------------------------------------

@query(
    "session_variables_sql",
    oracle="""
    WITH th AS (SELECT round(avg(o_totalprice), 2) AS t FROM orders)
    SELECT (SELECT t FROM th) AS threshold,
           CAST((SELECT count(*) FROM orders, th
                 WHERE o_totalprice > t) AS BIGINT) AS n_above,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def session_variables_sql(spark, sf_dir):
    """SQL session variables (Spark 4: DECLARE VARIABLE / SET VAR):
    a threshold computed by one statement is carried in a session
    variable into the next — cross-statement state without temp
    views, plus IDENTIFIER() indirection resolving a table name from
    a variable.  The oracle inlines the same two-step computation as
    CTEs; equal results prove the variable carried the exact value."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sesvar_v")
    spark.sql("DECLARE OR REPLACE VARIABLE sidecar_threshold DOUBLE")
    spark.sql("DECLARE OR REPLACE VARIABLE sidecar_tbl STRING")
    spark.sql("SET VAR sidecar_threshold = (SELECT round(avg(o_totalprice), 2) "
              "FROM orders_sesvar_v)")
    spark.sql("SET VAR sidecar_tbl = 'orders_sesvar_v'")
    return spark.sql("""
        SELECT sidecar_threshold AS threshold,
               (SELECT count(*) FROM IDENTIFIER(sidecar_tbl)
                WHERE o_totalprice > sidecar_threshold) AS n_above,
               count(*) AS n_orders
        FROM IDENTIFIER(sidecar_tbl)
    """)


# ---------------------------------------------------------------------------
# ANALYZE TABLE statistics: the CBO input surface
# ---------------------------------------------------------------------------

@query(
    "analyze_table_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS row_count,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS seg_ndv,
           CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS acctbal_nulls
    FROM customer
    """,
)
def analyze_table_stats(spark, sf_dir):
    """ANALYZE TABLE ... COMPUTE STATISTICS (+ FOR COLUMNS): the
    statistics that feed cost-based join reordering and broadcast
    decisions at 100 TB.  The table is materialized into the session
    catalog, analyzed, and the recorded stats are read back via
    DESCRIBE EXTENDED — the recorded row count and per-column
    distinct/null counts must equal the true values the oracle
    computes (Spark column NDV comes from HLL++ at a precision that
    is exact at this cardinality)."""
    spark.sql("DROP TABLE IF EXISTS sidecar_cust_stats")
    (t(spark, sf_dir, "customer")
     .write.mode("overwrite").saveAsTable("sidecar_cust_stats"))
    spark.sql("ANALYZE TABLE sidecar_cust_stats COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE sidecar_cust_stats COMPUTE STATISTICS "
              "FOR COLUMNS c_mktsegment, c_acctbal")
    rows = spark.sql(
        "DESCRIBE TABLE EXTENDED sidecar_cust_stats").collect()
    stats_line = next(r["data_type"] for r in rows
                      if r["col_name"] == "Statistics")
    row_count = int(stats_line.split(",")[1].strip().split(" ")[0])
    seg = spark.sql("DESCRIBE TABLE EXTENDED sidecar_cust_stats "
                    "c_mktsegment").collect()
    bal = spark.sql("DESCRIBE TABLE EXTENDED sidecar_cust_stats "
                    "c_acctbal").collect()

    def stat(rows_, name):
        return next(r["info_value"] for r in rows_
                    if r["info_name"] == name)

    out = spark.createDataFrame(
        [(row_count, int(stat(seg, "distinct_count")),
          int(stat(bal, "num_nulls")))],
        "row_count bigint, seg_ndv bigint, acctbal_nulls bigint")
    spark.sql("DROP TABLE IF EXISTS sidecar_cust_stats")
    return out.localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# xpath family over constructed XML documents
# ---------------------------------------------------------------------------

@query(
    "xpath_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey, o_orderkey % 7 AS a, o_orderkey % 5 AS n_items
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a) AS BIGINT) AS sum_a,
           CAST(sum(CASE WHEN a > 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_big,
           CAST(sum(n_items) AS BIGINT) AS total_items,
           array_to_string(['s' || CAST(min(o_orderkey) % 7 AS VARCHAR)],
                           ',') AS first_tag
    FROM v
    """,
)
def xpath_functions(spark, sf_dir):
    """The xpath family (xpath_string / xpath_int / xpath_boolean /
    xpath list form) over per-row XML documents constructed from
    order keys — every extraction is pinned by the construction rule
    (value k%7 in <a>, k%5 repeated <item> elements counted via the
    list form).  XML path extraction is the legacy-ingest surface
    (SOAP/feed dumps) a migration pipeline still meets at scale; all
    map-side expressions."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    xml = F.concat(
        F.lit("<r><a>"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("</a><s>s"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("</s>"),
        F.expr("repeat('<item/>', CAST(o_orderkey % 5 AS INT))"),
        F.lit("</r>"))
    v = o.select("o_orderkey", xml.alias("doc"))
    v.createOrReplaceTempView("xpath_v")
    return spark.sql("""
        SELECT count(*) AS n,
               sum(xpath_int(doc, '/r/a')) AS sum_a,
               sum(CASE WHEN xpath_boolean(doc, '/r/a > 3')
                        THEN 1 ELSE 0 END) AS n_big,
               sum(size(xpath(doc, '/r/item'))) AS total_items,
               array_join(xpath(min_by(doc, o_orderkey), '/r/s/text()'),
                          ',') AS first_tag
        FROM xpath_v
    """)


# ---------------------------------------------------------------------------
# binary conversion: to_binary / try_to_binary across encodings
# ---------------------------------------------------------------------------

@query(
    "binary_conversion_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR) AS s
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN from_base64(to_base64(s::BLOB))::VARCHAR = s
                         THEN 1 ELSE 0 END) AS BIGINT) AS b64_roundtrip,
           CAST(sum(length(hex(s::BLOB))) AS BIGINT) AS hex_len,
           CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS null_invalid,
           min(chr(65 + CAST(o_orderkey % 26 AS INT))) AS min_chr
    FROM v
    """,
)
def binary_conversion_functions(spark, sf_dir):
    """to_binary / try_to_binary across encodings: utf-8 and base64
    round trips must be identities, hex widening doubles the length,
    try_to_binary returns NULL (not an error) on invalid hex — the
    error-tolerant twin — and char() maps code points.  Binary
    transport correctness is what keeps multimodal payload columns
    byte-faithful through string channels."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    v = o.select("o_orderkey",
                 F.concat(F.lit("k"), F.col("o_orderkey").cast("string"))
                 .alias("s"))
    v.createOrReplaceTempView("binconv_v")
    return spark.sql("""
        SELECT count(*) AS n,
               sum(CASE WHEN CAST(to_binary(base64(encode(s, 'utf-8')),
                                            'base64') AS STRING) = s
                        THEN 1 ELSE 0 END) AS b64_roundtrip,
               sum(length(hex(encode(s, 'utf-8')))) AS hex_len,
               sum(CASE WHEN o_orderkey % 2 = 0
                        AND try_to_binary('zz-not-hex', 'hex') IS NULL
                        THEN 1 ELSE 0 END) AS null_invalid,
               min(char(65 + o_orderkey % 26)) AS min_chr
        FROM binconv_v
    """)


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE — dynamic SQL (Spark 4.0+)
# ---------------------------------------------------------------------------

@query(
    "execute_immediate_dynamic",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice > 150000
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def execute_immediate_dynamic(spark, sf_dir):
    """EXECUTE IMMEDIATE (Spark 4 dynamic SQL): the statement text
    lives in a session variable and parameters bind via USING — the
    pattern metadata-driven pipelines use to run generated SQL
    (per-tenant filters, config-driven thresholds) without Python
    string splicing.  The parameter marker is bound server-side, so
    the plan is identical to the static form: one scan with the
    pushed predicate, one shuffle for the aggregate.  The oracle is
    the statically written equivalent; matching hashes prove the
    dynamic path binds the parameter exactly."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_dynsql_v")
    spark.sql("DECLARE OR REPLACE VARIABLE sidecar_dyn_sql STRING")
    spark.sql("""
        SET VAR sidecar_dyn_sql =
          'SELECT o_orderpriority,
                  count(*) AS n_orders,
                  round(sum(o_totalprice), 2) AS total
           FROM orders_dynsql_v
           WHERE o_totalprice > ?
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority'
    """)
    return spark.sql("EXECUTE IMMEDIATE sidecar_dyn_sql USING 150000")


# ---------------------------------------------------------------------------
# DataFrame.transpose (Spark 4.0) + lateral column aliases +
# DISTRIBUTE/SORT BY + the SQL UNPIVOT clause
# ---------------------------------------------------------------------------

@query(
    "dataframe_transpose",
    oracle="""
    SELECT 'n_orders' AS key,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
    FROM orders
    UNION ALL
    SELECT 'sum_price',
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2),
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2),
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2)
    FROM orders
    """,
)
def dataframe_transpose(spark, sf_dir):
    """``DataFrame.transpose`` (Spark 4.0): rows become columns with
    the first column supplying the new header.  Strictly a
    driver-bounded operator — the frame being transposed must be
    small (here a 3-row aggregate), because the transposed width is
    the input row count; the correct 100 TB usage is always
    aggregate-then-transpose, never transpose-the-fact-table.  Values
    share one common type (double here) since a transposed column
    mixes what were heterogeneous row values."""
    agg = (t(spark, sf_dir, "orders")
           .groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).cast("double").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
           .orderBy("o_orderstatus"))
    return agg.transpose()


@query(
    "lateral_column_alias",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice), 2) AS total,
           round(round(sum(o_totalprice), 2) * 0.1, 2) AS tax,
           round(round(round(sum(o_totalprice), 2) * 0.1, 2) / 2, 2)
               AS half_tax
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def lateral_column_alias(spark, sf_dir):
    """Lateral column aliases (Spark 3.4+): a SELECT-list alias is
    referenced by LATER expressions in the same SELECT — the
    spreadsheet-style derivation chain that otherwise needs nested
    subqueries.  Catalyst inlines the alias chain into one Project,
    so the plan is identical to writing the expressions out in full
    (which is exactly what the oracle does)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lca_v")
    return spark.sql("""
        SELECT o_orderpriority,
               round(sum(o_totalprice), 2) AS total,
               round(total * 0.1, 2) AS tax,
               round(tax / 2, 2) AS half_tax
        FROM orders_lca_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@query(
    "distribute_sort_by",
    oracle="""
    SELECT c_nationkey, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def distribute_sort_by(spark, sf_dir):
    """DISTRIBUTE BY / SORT BY — Hive-inherited physical-layout SQL:
    DISTRIBUTE BY hashes rows to partitions (an Exchange on exactly
    that key, no global order), SORT BY orders within each partition
    only.  This is the write-side layout tool: a downstream consumer
    aggregating on the distribution key gets its shuffle for free,
    and partition-local runs of the sort key compress better in
    parquet.  The aggregate on top consumes the pre-distributed
    layout without a second exchange; results are layout-invariant,
    which is what the oracle pins."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_dsb_v")
    return spark.sql("""
        WITH laid_out AS (
          SELECT c_nationkey, c_acctbal
          FROM customer_dsb_v
          DISTRIBUTE BY c_nationkey SORT BY c_nationkey, c_acctbal
        )
        SELECT c_nationkey, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM laid_out
        GROUP BY c_nationkey
    """)


@query(
    "sql_unpivot_clause",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             round(sum(o_totalprice), 2) AS sum_price,
             round(avg(o_totalprice), 2) AS avg_price,
             round(max(o_totalprice), 2) AS max_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, val FROM (
      SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS val
      FROM wide
      UNION ALL
      SELECT o_orderstatus, 'avg_price', avg_price FROM wide
      UNION ALL
      SELECT o_orderstatus, 'max_price', max_price FROM wide)
    ORDER BY o_orderstatus, metric
    """,
)
def sql_unpivot_clause(spark, sf_dir):
    """The SQL UNPIVOT clause (vs the DataFrame ``unpivot``/melt API
    used by unpivot_melt): wide→long inside pure SQL.  UNPIVOT
    compiles to the same Expand node as melt — each input row fans
    out to one row per measure column with zero shuffles; the
    ORDER BY at the top is the only exchange in the plan."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_unpv_v")
    return spark.sql("""
        SELECT o_orderstatus, metric, val FROM (
          SELECT o_orderstatus,
                 round(sum(o_totalprice), 2) AS sum_price,
                 round(avg(o_totalprice), 2) AS avg_price,
                 round(max(o_totalprice), 2) AS max_price
          FROM orders_unpv_v GROUP BY o_orderstatus
        )
        UNPIVOT (val FOR metric IN (sum_price, avg_price, max_price))
        ORDER BY o_orderstatus, metric
    """)


# ---------------------------------------------------------------------------
# hyperbolic / reciprocal trig + cube root + shift family
# ---------------------------------------------------------------------------

@query(
    "hyperbolic_math_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey % 5 + 1 AS k, (o_orderkey % 5 + 1) / 10.0 AS x
      FROM orders WHERE o_orderkey <= 200)
    SELECT k,
           round(sum((exp(x) - exp(-x)) / 2), 6) AS s_sinh,
           round(sum((exp(x) + exp(-x)) / 2), 6) AS s_cosh,
           round(sum((exp(x) - exp(-x)) / (exp(x) + exp(-x))), 6) AS s_tanh,
           round(sum(0.5 * ln((1 + x) / (1 - x))), 6) AS s_atanh,
           round(sum(ln(x + sqrt(x * x + 1))), 6) AS s_asinh,
           round(sum(ln((1 + x) + sqrt((1 + x) * (1 + x) - 1))), 6)
             AS s_acosh,
           round(sum(tan(x)), 6) AS s_tan,
           round(sum(cot(x)), 6) AS s_cot,
           round(sum(1.0 / sin(x)), 6) AS s_csc,
           round(sum(1.0 / cos(x)), 6) AS s_sec,
           round(sum(cbrt(x)), 6) AS s_cbrt,
           round(sum(log2(1 + x)), 6) AS s_log2,
           round(sum(pow(x, 3)), 6) AS s_pow3
    FROM v GROUP BY k ORDER BY k
    """,
)
def hyperbolic_math_functions(spark, sf_dir):
    """The hyperbolic / reciprocal-trig corner of the math surface
    (sinh..acosh, tan/cot/csc/sec, cbrt, log2, power) summed per
    residue class — all JVM intrinsics folded map-side; parity pinned
    by double-precision identical libm results rounded to 6 places."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 200)
    v = o.select((F.col("o_orderkey") % 5 + 1).alias("k"),
                 ((F.col("o_orderkey") % 5 + 1) / 10.0).alias("x"))
    x = F.col("x")
    return (
        v.groupBy("k")
        .agg(F.round(F.sum(F.sinh(x)), 6).alias("s_sinh"),
             F.round(F.sum(F.cosh(x)), 6).alias("s_cosh"),
             F.round(F.sum(F.tanh(x)), 6).alias("s_tanh"),
             F.round(F.sum(F.atanh(x)), 6).alias("s_atanh"),
             F.round(F.sum(F.asinh(x)), 6).alias("s_asinh"),
             F.round(F.sum(F.acosh(1 + x)), 6).alias("s_acosh"),
             F.round(F.sum(F.tan(x)), 6).alias("s_tan"),
             F.round(F.sum(F.cot(x)), 6).alias("s_cot"),
             F.round(F.sum(F.csc(x)), 6).alias("s_csc"),
             F.round(F.sum(F.sec(x)), 6).alias("s_sec"),
             F.round(F.sum(F.cbrt(x)), 6).alias("s_cbrt"),
             F.round(F.sum(F.log2(1 + x)), 6).alias("s_log2"),
             F.round(F.sum(F.power(x, 3)), 6).alias("s_pow3"))
        .orderBy("k")
    )


@query(
    "bit_shift_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k, CAST(o_orderkey % 7 AS BIGINT) AS n
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(n << 3) AS BIGINT) AS sum_shl,
           CAST(sum((k * 1024) >> 4) AS BIGINT) AS sum_shr,
           CAST(sum((k * 1024) >> 10) AS BIGINT) AS sum_shru,
           CAST(sum(~n) AS BIGINT) AS sum_not,
           CAST(sum(xor(n, 5)) AS BIGINT) AS sum_xor
    FROM v
    """,
)
def bit_shift_functions(spark, sf_dir):
    """shiftleft / shiftright / shiftrightunsigned / bitwise NOT /
    XOR over non-negative keys (where arithmetic and logical right
    shift agree — the sign-bit divergence is a 2's-complement detail
    pinned elsewhere by the bitwise family).  Pure codegen'd integer
    ops, single map-reduce."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    v = o.select(F.col("o_orderkey").alias("k"),
                 (F.col("o_orderkey") % 7).cast("bigint").alias("n"))
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.shiftleft(F.col("n"), 3)).alias("sum_shl"),
        F.sum(F.shiftright(F.col("k") * 1024, 4)).alias("sum_shr"),
        F.sum(F.shiftrightunsigned(F.col("k") * 1024, 10)).alias("sum_shru"),
        F.sum(F.bitwise_not(F.col("n"))).alias("sum_not"),
        F.sum(F.expr("n ^ 5")).alias("sum_xor"))


# ---------------------------------------------------------------------------
# datetime long tail: part extractors, unix-epoch bridges, make_* ctors
# ---------------------------------------------------------------------------

@query(
    "datetime_longtail_functions",
    oracle="""
    WITH v AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_orderkey AS k
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(date_part('year', d)) AS BIGINT) AS sum_year,
           CAST(sum(dayofyear(d)) AS BIGINT) AS sum_doy,
           CAST(sum(day(d)) AS BIGINT) AS sum_dom,
           CAST(sum(isodow(d) - 1) AS BIGINT) AS sum_weekday,
           min(strftime(d, '%a')) AS min_dayname_abbr,
           max(strftime(d, '%b')) AS max_monthname_abbr,
           CAST(sum(d - DATE '1970-01-01') AS BIGINT) AS sum_unix_date,
           CAST(min(CAST(DATE '1970-01-01' + INTERVAL (19000) DAY AS DATE))
                AS VARCHAR) AS from_unix_date_19000,
           CAST(sum(CAST(epoch(ts) AS BIGINT)) AS BIGINT) AS sum_unix_sec,
           CAST(sum(CAST(epoch_ms(ts) AS BIGINT)) AS BIGINT) AS sum_unix_ms,
           CAST(max(CAST(to_timestamp(86400 * 365) AS TIMESTAMP))
                AS VARCHAR) AS ts_sec,
           CAST(max(epoch_ms(epoch_ms(CAST(86400123 AS BIGINT))))
                AS VARCHAR) AS ts_ms,
           CAST(max(make_date(2024, CAST(k % 12 + 1 AS INT), 15))
                AS VARCHAR) AS max_make_date,
           CAST(min(date_trunc('month', d)) AS VARCHAR) AS min_trunc_month,
           CAST(max(CAST(d - INTERVAL (7) DAY AS DATE)) AS VARCHAR)
             AS max_minus7,
           CAST(max(CAST(d + INTERVAL (30) DAY AS DATE)) AS VARCHAR)
             AS max_plus30
    FROM v
    """,
)
def datetime_longtail_functions(spark, sf_dir):
    """The datetime long tail: date_part extractors (dayofyear /
    dayofmonth / weekday / dayname / monthname), the unix-epoch
    bridge family in both directions (unix_date / date_from_unix_date
    / unix_seconds / unix_millis / timestamp_seconds /
    timestamp_millis), make_date, trunc-to-month, and date_sub /
    dateadd — every one a codegen'd expression; temporal outputs are
    stringified for cross-engine parity (DuckDB timestamps are
    UTC-naive, session zone pinned to UTC)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    v = o.select(F.col("o_orderdate").cast("date").alias("d"),
                 F.col("o_orderdate").cast("timestamp").alias("ts"),
                 F.col("o_orderkey").alias("k"))
    d, ts, k = F.col("d"), F.col("ts"), F.col("k")
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.date_part(F.lit("year"), d)).alias("sum_year"),
        F.sum(F.dayofyear(d)).alias("sum_doy"),
        F.sum(F.dayofmonth(d)).alias("sum_dom"),
        F.sum(F.weekday(d)).alias("sum_weekday"),
        F.min(F.dayname(d)).alias("min_dayname_abbr"),
        F.max(F.monthname(d)).alias("max_monthname_abbr"),
        F.sum(F.unix_date(d)).alias("sum_unix_date"),
        F.min(F.date_from_unix_date(F.lit(19000)).cast("string"))
        .alias("from_unix_date_19000"),
        F.sum(F.unix_seconds(ts)).alias("sum_unix_sec"),
        F.sum(F.unix_millis(ts)).alias("sum_unix_ms"),
        F.max(F.timestamp_seconds(F.lit(86400 * 365)).cast("string"))
        .alias("ts_sec"),
        F.max(F.unix_millis(F.timestamp_millis(F.lit(86400123)))
              .cast("string")).alias("ts_ms"),
        F.max(F.make_date(F.lit(2024), (k % 12 + 1), F.lit(15))
              .cast("string")).alias("max_make_date"),
        F.min(F.trunc(d, "month").cast("string")).alias("min_trunc_month"),
        F.max(F.date_sub(d, 7).cast("string")).alias("max_minus7"),
        F.max(F.dateadd(d, 30).cast("string")).alias("max_plus30"))


# ---------------------------------------------------------------------------
# string long tail: ascii/elt/format_number/ilike/locate/quote/soundex/...
# ---------------------------------------------------------------------------

@query(
    "string_longtail_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             'k' || CAST(o_orderkey AS VARCHAR) AS s,
             o_orderkey % 3 + 1 AS idx
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(ascii(s)) AS BIGINT) AS sum_ascii,
           CAST(sum(bit_length(s)) AS BIGINT) AS sum_bitlen,
           CAST(sum(length(s)) AS BIGINT) AS sum_charlen,
           min(trim('xx' || s || 'xx', 'x')) AS min_btrim,
           max((['alpha', 'beta', 'gamma'])[CAST(idx AS INT)]) AS max_elt,
           CAST(sum(CASE WHEN s ILIKE 'K1%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ilike,
           CAST(sum(strpos(s, '1')) AS BIGINT) AS sum_locate,
           max(rpad(s, 8, '*')) AS max_rpad,
           min(upper(s)) AS min_ucase,
           max(lower('K' || CAST(k AS VARCHAR))) AS max_lcase,
           CAST(sum(CASE WHEN regexp_matches(s, '^k[0-9]+$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_regexp_like,
           max(regexp_extract(s, '[0-9]+')) AS max_regexp_substr,
           min('''' || s || '''') AS min_quote,
           'R163' AS soundex_robert,
           max(unhex(hex(s))::VARCHAR) AS max_unhex_rt,
           min(replace(replace('a%20b%2Fc', '%20', ' '), '%2F', '/'))
             AS url_decoded,
           min(format('{:,}', 1234567)) AS fmt_grouped
    FROM v
    """,
)
def string_longtail_functions(spark, sf_dir):
    """The string long tail: ascii / bit_length / character_length /
    btrim / elt / ilike / locate / rpad / ucase / lcase /
    regexp_like / regexp_substr / quote / soundex / unhex round-trip
    / url_decode / format_number — all codegen'd JVM expressions;
    engine-specific spellings (soundex, url_decode, digit grouping)
    are pinned by constants or replace-chains on the oracle side."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    v = o.select(F.col("o_orderkey").alias("k"),
                 F.concat(F.lit("k"), F.col("o_orderkey").cast("string"))
                 .alias("s"),
                 (F.col("o_orderkey") % 3 + 1).alias("idx"))
    s = F.col("s")
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.ascii(s)).alias("sum_ascii"),
        F.sum(F.bit_length(s)).alias("sum_bitlen"),
        F.sum(F.character_length(s)).alias("sum_charlen"),
        F.min(F.btrim(F.concat(F.lit("xx"), s, F.lit("xx")), F.lit("x")))
        .alias("min_btrim"),
        F.max(F.elt(F.col("idx").cast("int"), F.lit("alpha"),
                    F.lit("beta"), F.lit("gamma"))).alias("max_elt"),
        F.sum(F.when(F.ilike(s, F.lit("K1%")), 1).otherwise(0))
        .alias("n_ilike"),
        F.sum(F.locate("1", s)).alias("sum_locate"),
        F.max(F.rpad(s, 8, "*")).alias("max_rpad"),
        F.min(F.ucase(s)).alias("min_ucase"),
        F.max(F.lcase(F.concat(F.lit("K"), F.col("k").cast("string"))))
        .alias("max_lcase"),
        F.sum(F.when(F.regexp_like(s, F.lit("^k[0-9]+$")), 1).otherwise(0))
        .alias("n_regexp_like"),
        F.max(F.regexp_substr(s, F.lit("[0-9]+"))).alias("max_regexp_substr"),
        F.min(F.expr("quote(s)")).alias("min_quote"),
        F.min(F.soundex(F.lit("Robert"))).alias("soundex_robert"),
        F.max(F.decode(F.unhex(F.hex(s)), "utf-8")).alias("max_unhex_rt"),
        F.min(F.url_decode(F.lit("a%20b%2Fc"))).alias("url_decoded"),
        F.min(F.format_number(F.lit(1234567), 0)).alias("fmt_grouped"))


# ---------------------------------------------------------------------------
# null-safety + try_* arithmetic: ifnull/nvl/nullifzero/equal_null, try_add...
# ---------------------------------------------------------------------------

@query(
    "null_safety_try_arithmetic",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 4 = 0 THEN NULL
                  ELSE o_orderkey % 7 END AS x,
             CAST(o_orderkey % 5 AS BIGINT) AS d
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(ifnull(x, -1)) AS BIGINT) AS sum_ifnull,
           CAST(sum(coalesce(x, 99)) AS BIGINT) AS sum_nvl,
           CAST(sum(CASE WHEN nullif(d, 0) IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullifzero,
           CAST(sum(coalesce(x, 0)) AS BIGINT) AS sum_zeroifnull,
           CAST(sum(CASE WHEN x IS NOT DISTINCT FROM d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_equal_null,
           CAST(sum(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_notnull,
           CAST(sum(k + d) AS BIGINT) AS sum_try_add,
           CAST(sum(k - d) AS BIGINT) AS sum_try_sub,
           CAST(sum(CASE WHEN d = 0 THEN NULL ELSE k % d END) AS BIGINT)
             AS sum_try_mod,
           CAST(sum(k * d) AS BIGINT) AS sum_try_mul,
           CAST(max(CASE WHEN 1 = 1 THEN NULL ELSE 0 END) AS BIGINT)
             AS overflow_add,
           CAST(count(try_cast('2024-02-30' AS DATE)) AS BIGINT)
             AS n_bad_dates,
           CAST(min(CAST(make_timestamp(2024, 3, 1, 12, 30, 0)
                         AS VARCHAR)) AS VARCHAR) AS ts_made
    FROM v
    """,
)
def null_safety_try_arithmetic(spark, sf_dir):
    """Null-safety surface (ifnull / nvl / nullifzero / zeroifnull /
    equal_null / isnotnull) and the error-tolerant try_* arithmetic
    twins: try_add / try_subtract / try_multiply / try_mod return
    NULL instead of raising on overflow and mod-by-zero (the bigint
    MAX+1 probe is pinned NULL), try_to_date rejects the impossible
    calendar day, try_make_timestamp builds the valid one.  ANSI-safe
    pipelines at 100 TB depend on these never killing a stage."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 4 == 0, None)
        .otherwise(F.col("o_orderkey") % 7).alias("x"),
        (F.col("o_orderkey") % 5).cast("bigint").alias("d"))
    k, x, d = F.col("k"), F.col("x"), F.col("d")
    big = F.lit(9223372036854775807).cast("long")
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.ifnull(x, F.lit(-1))).alias("sum_ifnull"),
        F.sum(F.nvl(x, F.lit(99))).alias("sum_nvl"),
        F.sum(F.when(F.nullifzero(d).isNull(), 1).otherwise(0))
        .alias("n_nullifzero"),
        F.sum(F.zeroifnull(x)).alias("sum_zeroifnull"),
        F.sum(F.when(F.equal_null(x, d), 1).otherwise(0))
        .alias("n_equal_null"),
        F.sum(F.when(F.isnotnull(x), 1).otherwise(0)).alias("n_notnull"),
        F.sum(F.try_add(k, d)).alias("sum_try_add"),
        F.sum(F.try_subtract(k, d)).alias("sum_try_sub"),
        F.sum(F.try_mod(k, d)).alias("sum_try_mod"),
        F.sum(F.try_multiply(k, d)).alias("sum_try_mul"),
        F.max(F.try_add(big, F.lit(1))).alias("overflow_add"),
        F.count(F.try_to_date(F.lit("2024-02-30"))).alias("n_bad_dates"),
        F.min(F.try_make_timestamp(
            F.lit(2024), F.lit(3), F.lit(1), F.lit(12), F.lit(30),
            F.lit(0)).cast("string")).alias("ts_made"))


# ---------------------------------------------------------------------------
# aggregate long tail: std/var_pop/sum_distinct/percentile_approx/histogram
# ---------------------------------------------------------------------------

@query(
    "agg_longtail_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey % 50 AS x, o_orderkey % 4 AS b
      FROM orders WHERE o_orderkey <= 2000)
    SELECT round(stddev_samp(x), 6) AS std_samp,
           round(stddev_pop(x), 6) AS std_pop,
           round(var_pop(x), 6) AS v_pop,
           CAST(sum(DISTINCT x) AS BIGINT) AS sum_dist,
           CAST(quantile_disc(x, 0.5) AS BIGINT) AS p50_exact,
           (SELECT string_agg(CAST(b AS VARCHAR) || ':'
                              || CAST(c AS VARCHAR), ',' ORDER BY b)
            FROM (SELECT b, count(*) AS c FROM v GROUP BY b) g)
             AS hist_4bins
    FROM v
    """,
)
def agg_longtail_functions(spark, sf_dir):
    """Aggregate long tail: std (sample) vs stddev_pop vs var_pop,
    sum(DISTINCT), percentile_approx at an accuracy that makes the
    GK sketch exact for this cardinality (pinned against the exact
    discrete quantile), and histogram_numeric collapsing onto the 4
    distinct values — with #bins == #distinct the centroids are the
    values and the heights the exact counts, so the sketch output is
    deterministic and stringified for comparison."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    v = o.select((F.col("o_orderkey") % 50).alias("x"),
                 (F.col("o_orderkey") % 4).alias("b"))
    hist = F.expr("histogram_numeric(b, 4)")
    return v.agg(
        F.round(F.std("x"), 6).alias("std_samp"),
        F.round(F.stddev_pop("x"), 6).alias("std_pop"),
        F.round(F.var_pop("x"), 6).alias("v_pop"),
        F.sum_distinct(F.col("x")).alias("sum_dist"),
        F.percentile_approx("x", 0.5, 100000).alias("p50_exact"),
        F.array_join(
            F.transform(
                F.array_sort(hist),
                lambda s: F.concat(s["x"].cast("bigint").cast("string"),
                                   F.lit(":"),
                                   s["y"].cast("bigint").cast("string"))),
            ",").alias("hist_4bins"))


# ---------------------------------------------------------------------------
# array/map leftovers: flatten/forall/arrays_zip/array_size/map ctors
# ---------------------------------------------------------------------------

@query(
    "array_map_leftover_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             [o_orderkey % 5, o_orderkey % 3] AS a,
             [o_orderkey % 7] AS b
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(len(flatten([a, b]))) AS BIGINT) AS sum_flat_len,
           CAST(sum(CASE WHEN len(list_filter(a, e -> e >= 0)) = len(a)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_forall_nonneg,
           CAST(sum(a[1] * 10 + b[1]) AS BIGINT) AS sum_zip_pairs,
           CAST(sum(len(a) + len(b)) AS BIGINT) AS sum_array_size,
           CAST(sum(CAST((map(['lo', 'hi'],
                              [a[1], a[2]])['hi'])[1] AS BIGINT)) AS BIGINT)
             AS sum_map_from_arrays,
           CAST(sum(CAST((map_concat(map(['x'], [a[1]]),
                                     map(['y'], [b[1]]))['y'])[1] AS BIGINT))
                AS BIGINT) AS sum_map_concat,
           CAST(sum(list_sum(map_values(map(['p', 'q'],
                                            [a[1], b[1]])))) AS BIGINT)
             AS sum_map_values
    FROM v
    """,
)
def array_map_leftover_functions(spark, sf_dir):
    """Array/map constructor leftovers: flatten (nested → flat),
    forall (universal quantifier), arrays_zip (positional pairing,
    probed via the zipped struct fields), array_size,
    map_from_arrays, map_concat, map_values — each a codegen'd
    collection expression; the zip probe folds the paired elements
    into one integer so parity needs no struct serialization."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.array(F.col("o_orderkey") % 5, F.col("o_orderkey") % 3).alias("a"),
        F.array(F.col("o_orderkey") % 7).alias("b"))
    a, b = F.col("a"), F.col("b")
    zipped = F.arrays_zip(a, b)
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.array_size(F.flatten(F.array(a, b)))).alias("sum_flat_len"),
        F.sum(F.when(F.forall(a, lambda e: e >= 0), 1).otherwise(0))
        .alias("n_forall_nonneg"),
        F.sum(zipped[0]["a"] * 10 + zipped[0]["b"]).alias("sum_zip_pairs"),
        F.sum(F.array_size(a) + F.array_size(b)).alias("sum_array_size"),
        F.sum(F.map_from_arrays(
            F.array(F.lit("lo"), F.lit("hi")),
            F.array(a[0], a[1]))["hi"].cast("bigint"))
        .alias("sum_map_from_arrays"),
        F.sum(F.map_concat(
            F.create_map(F.lit("x"), a[0]),
            F.create_map(F.lit("y"), b[0]))["y"].cast("bigint"))
        .alias("sum_map_concat"),
        F.sum(F.aggregate(
            F.map_values(F.create_map(F.lit("p"), a[0], F.lit("q"), b[0])),
            F.lit(0).cast("bigint"), lambda acc, e: acc + e))
        .alias("sum_map_values"))


# ---------------------------------------------------------------------------
# VARIANT long tail: try_parse_json / variant null + typed get / to_variant
# ---------------------------------------------------------------------------

@query(
    "variant_longtail_functions",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN 'not json'
                  WHEN o_orderkey % 7 = 0 THEN 'null'
                  ELSE '{"a": ' || CAST(o_orderkey % 5 AS VARCHAR)
                       || ', "b": [1, ' || CAST(o_orderkey % 3 AS VARCHAR)
                       || ']}' END AS js
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN json_valid(js) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_unparsable,
           CAST(sum(CASE WHEN js = 'null' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_variant_null,
           CAST(sum(CASE WHEN json_valid(js)
                         THEN CAST(json_extract(js, '$.a') AS BIGINT)
                         END) AS BIGINT) AS sum_a,
           CAST(sum(CASE WHEN json_valid(js)
                         THEN CAST(json_extract(js, '$.b[1]') AS BIGINT)
                         END) AS BIGINT) AS sum_b1,
           min(CASE WHEN json_valid(js) AND js <> 'null'
                    THEN 'OBJECT<a: BIGINT, b: ARRAY<BIGINT>>' END)
             AS agg_schema,
           max('{"x":7}') AS variant_obj
    FROM v
    """,
)
def variant_longtail_functions(spark, sf_dir):
    """The VARIANT long tail: try_parse_json returns NULL (not an
    error) on malformed input, is_variant_null distinguishes the JSON
    null value from parse failure, try_variant_get typed extraction
    with JSONPath (object field and array index), to_variant_object
    builds a variant from a struct, and schema_of_variant_agg merges
    the observed schemas across rows.  Semi-structured columns at
    100 TB need exactly this error-tolerant, schema-on-read path."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    js = (F.when(F.col("o_orderkey") % 10 == 0, F.lit("not json"))
          .when(F.col("o_orderkey") % 7 == 0, F.lit("null"))
          .otherwise(F.concat(
              F.lit('{"a": '), (F.col("o_orderkey") % 5).cast("string"),
              F.lit(', "b": [1, '), (F.col("o_orderkey") % 3).cast("string"),
              F.lit("]}"))))
    v = o.select(F.col("o_orderkey").alias("k"), js.alias("js"))
    var = F.try_parse_json(F.col("js"))
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(var.isNull(), 1).otherwise(0)).alias("n_unparsable"),
        F.sum(F.when(F.is_variant_null(var), 1).otherwise(0))
        .alias("n_variant_null"),
        F.sum(F.try_variant_get(var, "$.a", "bigint")).alias("sum_a"),
        F.sum(F.try_variant_get(var, "$.b[1]", "bigint")).alias("sum_b1"),
        F.schema_of_variant_agg(
            F.when(var.isNotNull() & ~F.is_variant_null(var), var))
        .cast("string").alias("agg_schema"),
        F.max(F.to_variant_object(F.struct(F.lit(7).alias("x")))
              .cast("string")).alias("variant_obj"))


# ---------------------------------------------------------------------------
# UTF-8 validation + sentences() tokenizer
# ---------------------------------------------------------------------------

@query(
    "utf8_sentences_functions",
    oracle="""
    WITH v AS (SELECT doc_id, text FROM documents),
    s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words
      FROM v)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_valid_utf8,
           CAST(count(*) AS BIGINT) AS n_make_valid_id,
           CAST(count(*) AS BIGINT) AS n_try_validate,
           CAST((SELECT sum(n_words) FROM s) AS BIGINT) AS total_words,
           1 AS one_sentence_docs_frac_num,
           'Abc' AS decoded_invalid
    FROM v
    """,
)
def utf8_sentences_functions(spark, sf_dir):
    """UTF-8 validation family (is_valid_utf8 / make_valid_utf8 /
    validate_utf8 / try_validate_utf8 — identity on well-formed text,
    pinned by counting) and the sentences() locale tokenizer: corpus
    text has no sentence punctuation, so sentences(text) yields one
    sentence whose word list equals the whitespace split — the word
    totals agree with the split-based count, tying the ICU tokenizer
    to the plain split.  make_valid_utf8 over a raw byte literal is
    pinned by value."""
    d = t(spark, sf_dir, "documents")
    sents = F.sentences(F.col("text"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.is_valid_utf8("text"), 1).otherwise(0))
        .alias("n_valid_utf8"),
        F.sum(F.when(F.make_valid_utf8("text") == F.col("text"), 1)
              .otherwise(0)).alias("n_make_valid_id"),
        F.sum(F.when(F.try_validate_utf8(F.validate_utf8("text"))
                     == F.col("text"), 1).otherwise(0))
        .alias("n_try_validate"),
        F.sum(F.size(sents[0])).alias("total_words"),
        F.min(F.size(sents)).alias("one_sentence_docs_frac_num"),
        F.max(F.make_valid_utf8(F.unhex(F.lit("416263")).cast("string")))
        .alias("decoded_invalid"))


# ---------------------------------------------------------------------------
# TIME-type long tail: to_time / try_to_time / time_trunc / time_diff
# ---------------------------------------------------------------------------

@query(
    "time_type_longtail",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS TIME) AS tod, event_type FROM events
      WHERE event_id <= 2000)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(make_time(CAST(hour(tod) AS BIGINT), 0, 0.0))
                AS VARCHAR) AS min_hour_trunc,
           CAST(sum(datediff('minute', TIME '00:00:00', tod)) AS BIGINT)
             AS sum_minutes_since_midnight,
           CAST(min(TIME '09:30:00') AS VARCHAR) AS parsed_time,
           CAST(count(CASE WHEN NULL IS NULL THEN NULL END) AS BIGINT)
             AS n_bad_parse
    FROM v GROUP BY event_type ORDER BY event_type
    """,
)
def time_type_longtail(spark, sf_dir):
    """TIME-type long tail (Spark 4.1, spark.sql.timeType.enabled):
    cast timestamps to time-of-day, time_trunc to the hour, time_diff
    minutes since midnight as the aggregation key, to_time parsing a
    wall-clock literal and try_to_time rejecting a malformed one —
    date-free scheduling semantics with DuckDB's native TIME as the
    oracle."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    t(spark, sf_dir, "events").createOrReplaceTempView("events_ttl_v")
    return spark.sql("""
        SELECT event_type,
               count(*) AS cnt,
               CAST(min(time_trunc('HOUR',
                        make_time(hour(ts), minute(ts),
                                  CAST(second(ts) AS DOUBLE)))) AS STRING)
                 AS min_hour_trunc,
               sum(time_diff('MINUTE', TIME'00:00:00',
                             make_time(hour(ts), minute(ts),
                                       CAST(second(ts) AS DOUBLE))))
                 AS sum_minutes_since_midnight,
               CAST(min(to_time('09:30:00')) AS STRING) AS parsed_time,
               count(try_to_time('nope')) AS n_bad_parse
        FROM events_ttl_v WHERE event_id <= 2000
        GROUP BY event_type ORDER BY event_type
    """)


# ---------------------------------------------------------------------------
# xpath numeric variants: double/float/number/short over constructed XML
# ---------------------------------------------------------------------------

@query(
    "xpath_numeric_variants",
    oracle="""
    WITH v AS (
      SELECT o_orderkey % 9 AS a, o_orderkey % 100 AS b
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(round(sum(a * 1.5), 6) AS DOUBLE) AS sum_xd,
           round(sum(CAST(CAST(a * 1.5 AS FLOAT) AS DOUBLE)), 6) AS sum_xf,
           CAST(round(sum(a * 1.5), 6) AS DOUBLE) AS sum_xn,
           CAST(sum(b) AS BIGINT) AS sum_xs
    FROM v
    """,
)
def xpath_numeric_variants(spark, sf_dir):
    """The numeric xpath extraction variants — xpath_double /
    xpath_float / xpath_number (alias) / xpath_short — over per-row
    constructed XML, each pinned by the construction rule (a*1.5
    carried as decimal text, b within short range); the float
    variant's single-precision rounding is reproduced by the
    float→double cast chain on the oracle side."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    xml = F.concat(F.lit("<r><d>"),
                   ((F.col("o_orderkey") % 9) * 1.5).cast("string"),
                   F.lit("</d><s>"),
                   (F.col("o_orderkey") % 100).cast("string"),
                   F.lit("</s></r>"))
    v = o.select(xml.alias("doc"))
    v.createOrReplaceTempView("xpath_num_v")
    return spark.sql("""
        SELECT count(*) AS cnt,
               round(sum(xpath_double(doc, '/r/d')), 6) AS sum_xd,
               round(sum(CAST(xpath_float(doc, '/r/d') AS DOUBLE)), 6)
                 AS sum_xf,
               round(sum(xpath_number(doc, '/r/d')), 6) AS sum_xn,
               sum(CAST(xpath_short(doc, '/r/s') AS BIGINT)) AS sum_xs
        FROM xpath_num_v
    """)


# ---------------------------------------------------------------------------
# GEOMETRY/GEOGRAPHY storage type (Spark 4.1, spark.sql.geospatial.enabled)
# ---------------------------------------------------------------------------

#: four fixed WKB point literals (little-endian, type=1): (1,2) (3,4)
#: (5,6) (7,8) — the coordinates are pinned by the hex, so the
#: geom→wkb round trip being the identity is the whole contract
_WKB_POINTS = [
    "0101000000000000000000F03F0000000000000040",
    "010100000000000000000008400000000000001040",
    "010100000000000000000014400000000000001840",
    "01010000000000000000001C400000000000002040",
]


@query(
    "geospatial_wkb_roundtrip",
    oracle=f"""
    WITH v AS (
      SELECT o_orderkey AS k,
             CASE CAST(o_orderkey % 4 AS INT)
               WHEN 0 THEN '{_WKB_POINTS[0]}'
               WHEN 1 THEN '{_WKB_POINTS[1]}'
               WHEN 2 THEN '{_WKB_POINTS[2]}'
               ELSE '{_WKB_POINTS[3]}' END AS wkb_hex
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(*) AS BIGINT) AS n_roundtrip_id,
           CAST(sum(CASE WHEN k % 2 = 0 THEN 4326 ELSE 3857 END) AS BIGINT)
             AS sum_srid,
           min(wkb_hex) AS min_wkb,
           CAST(count(*) AS BIGINT) AS n_geog_roundtrip
    FROM v
    """,
)
def geospatial_wkb_roundtrip(spark, sf_dir):
    """The Spark 4.1 GEOMETRY/GEOGRAPHY storage types
    (spark.sql.geospatial.enabled): st_geomfromwkb / st_asbinary
    must be a lossless round trip (pinned by counting identity rows
    over fixed WKB point literals), st_setsrid / st_srid carry the
    spatial reference id, and st_geogfromwkb round-trips the
    geography variant.  DuckDB needs no spatial extension — the
    contract under test is byte-identity, checked Spark-side and
    reduced to counts."""
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    wkb = (F.when(F.col("o_orderkey") % 4 == 0, F.lit(_WKB_POINTS[0]))
           .when(F.col("o_orderkey") % 4 == 1, F.lit(_WKB_POINTS[1]))
           .when(F.col("o_orderkey") % 4 == 2, F.lit(_WKB_POINTS[2]))
           .otherwise(F.lit(_WKB_POINTS[3])))
    v = o.select(F.col("o_orderkey").alias("k"), wkb.alias("wkb_hex"))
    v.createOrReplaceTempView("geo_v")
    return spark.sql("""
        SELECT count(*) AS cnt,
               sum(CASE WHEN hex(st_asbinary(st_geomfromwkb(unhex(wkb_hex))))
                             = wkb_hex THEN 1 ELSE 0 END) AS n_roundtrip_id,
               sum(st_srid(st_setsrid(st_geomfromwkb(unhex(wkb_hex)),
                                      CASE WHEN k % 2 = 0 THEN 4326
                                           ELSE 3857 END))) AS sum_srid,
               min(wkb_hex) AS min_wkb,
               sum(CASE WHEN hex(st_asbinary(st_geogfromwkb(unhex(wkb_hex))))
                             = wkb_hex THEN 1 ELSE 0 END)
                 AS n_geog_roundtrip
        FROM geo_v
    """)


# ---------------------------------------------------------------------------
# listagg DISTINCT + scalar hll_union merge
# ---------------------------------------------------------------------------

@query(
    "distinct_listagg_hll_union",
    oracle="""
    WITH v AS (
      SELECT o_orderstatus AS st, o_orderpriority AS pr, o_custkey AS c
      FROM orders WHERE o_orderkey <= 2000),
    l AS (
      SELECT st,
             string_agg(DISTINCT pr, '|' ORDER BY pr) AS pr_list,
             count(DISTINCT c) AS exact_c
      FROM v GROUP BY st)
    SELECT st, pr_list, pr_list AS pr_list2,
           CAST(exact_c AS BIGINT) AS exact_c,
           CAST(1 AS BIGINT) AS hll_merge_ok
    FROM l ORDER BY st
    """,
)
def distinct_listagg_hll_union(spark, sf_dir):
    """listagg(DISTINCT .. ) WITHIN GROUP ordered string aggregation
    (and its string_agg_distinct twin pinned equal), plus the scalar
    hll_union: per-(status, half) HLL sketches merged pairwise with
    hll_union must estimate the same distinct-customer count as the
    exact distinct count within HLL++'s error envelope, as is the
    single-pass whole-group sketch (merged and single-pass estimates
    may differ slightly — sparse-mode coalescing differs — but both
    must land within 5%% of truth); reduced to a boolean."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    v = o.select(F.col("o_orderstatus").alias("st"),
                 F.col("o_orderpriority").alias("pr"),
                 F.col("o_custkey").alias("c"),
                 (F.col("o_orderkey") % 2).alias("half"))
    v.createOrReplaceTempView("listagg_v")
    halves = spark.sql("""
        SELECT st, half, hll_sketch_agg(c) AS sk
        FROM listagg_v GROUP BY st, half
    """)
    halves.createOrReplaceTempView("listagg_halves_v")
    merged = spark.sql("""
        WITH whole AS (
          SELECT st, hll_sketch_estimate(hll_sketch_agg(c)) AS whole_c
          FROM listagg_v GROUP BY st)
        SELECT a.st,
               hll_sketch_estimate(hll_union(a.sk, b.sk)) AS merged_c,
               w.whole_c
        FROM listagg_halves_v a
        JOIN listagg_halves_v b
          ON a.st = b.st AND a.half = 0 AND b.half = 1
        JOIN whole w ON w.st = a.st
    """)
    merged.createOrReplaceTempView("listagg_merged_v")
    # NOTE: mixing listagg(DISTINCT) with count(DISTINCT) in ONE
    # aggregate trips a Spark 4.1 planner ClassCastException
    # (AttributeReference -> SortOrder), so the two run as separate
    # aggregations joined on the group key.
    return spark.sql("""
        WITH lists AS (
          SELECT st,
                 listagg(DISTINCT pr, '|')
                   WITHIN GROUP (ORDER BY pr) AS pr_list,
                 string_agg(DISTINCT pr, '|')
                   WITHIN GROUP (ORDER BY pr) AS pr_list2
          FROM listagg_v GROUP BY st),
        exacts AS (
          SELECT st, count(DISTINCT c) AS exact_c
          FROM listagg_v GROUP BY st)
        SELECT l.st, l.pr_list, l.pr_list2, e.exact_c,
               CASE WHEN abs(m.merged_c - e.exact_c) <= 0.05 * e.exact_c
                         AND abs(m.whole_c - e.exact_c) <= 0.05 * e.exact_c
                    THEN 1 ELSE 0 END AS hll_merge_ok
        FROM lists l
        JOIN exacts e ON l.st = e.st
        JOIN listagg_merged_v m ON l.st = m.st
        ORDER BY l.st
    """)


# ---------------------------------------------------------------------------
# KLL typed sketch variants: bigint/float/double agg, merge, quantile, rank
# ---------------------------------------------------------------------------

@query(
    "kll_typed_sketch_variants",
    oracle="""
    WITH v AS (
      SELECT CAST(o_orderkey % 100 AS BIGINT) AS x,
             CAST(o_orderkey % 2 AS INT) AS half
      FROM orders WHERE o_orderkey <= 150)
    SELECT CAST(count(*) AS BIGINT) AS n_big,
           CAST(count(*) AS BIGINT) AS n_float,
           CAST(quantile_disc(x, 0.5) AS BIGINT) AS p50_big,
           round(CAST(quantile_disc(x, 0.5) AS DOUBLE), 6)
             AS p50_float,
           round(CAST((SELECT count(*) FROM v i WHERE i.x <= 50) AS DOUBLE)
                 / count(*), 6) AS rank_50_big,
           CAST(1 AS BIGINT) AS p90_merge_consistent_big,
           CAST(1 AS BIGINT) AS p90_merge_consistent_float,
           CAST(count(*) AS BIGINT) AS n_merged_double
    FROM v
    """,
)
def kll_typed_sketch_variants(spark, sf_dir):
    """The typed KLL sketch matrix: kll_sketch_agg_{bigint,float} /
    kll_sketch_get_{n,quantile,rank}_* / kll_merge_agg_* /
    kll_sketch_merge_* — built per half, merged both ways (pairwise
    scalar merge and merge-agg), then queried.  KLL compaction is
    RANDOMIZED, so the probe keeps n below the sketch capacity
    (k=200): no compaction runs, the sketch stores every value, and
    quantiles/ranks are exact and deterministic — the median pins
    against the exact discrete quantile, rank against the inclusive
    CDF (KLL rank is P(X<=v)), and the merged sketches' p90 must
    equal the single-pass sketch's (lossless merge below k).  Sketch
    state is O(k log n) per group — the shape that lets percentile
    state distribute over 1000 executors."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 150)
    o.select((F.col("o_orderkey") % 100).cast("bigint").alias("x"),
             (F.col("o_orderkey") % 2).cast("int").alias("half")
             ).createOrReplaceTempView("kll_v")
    spark.sql("""
        SELECT half,
               kll_sketch_agg_bigint(x) AS skb,
               kll_sketch_agg_float(CAST(x AS FLOAT)) AS skf,
               kll_sketch_agg_double(CAST(x AS DOUBLE)) AS skd
        FROM kll_v GROUP BY half
    """).createOrReplaceTempView("kll_halves_v")
    return spark.sql("""
        WITH whole AS (
          SELECT kll_sketch_agg_bigint(x) AS skb,
                 kll_sketch_agg_float(CAST(x AS FLOAT)) AS skf
          FROM kll_v),
        pair_merge AS (
          SELECT kll_sketch_merge_bigint(a.skb, b.skb) AS mb,
                 kll_sketch_merge_float(a.skf, b.skf) AS mf,
                 kll_sketch_merge_double(a.skd, b.skd) AS md
          FROM kll_halves_v a JOIN kll_halves_v b
            ON a.half = 0 AND b.half = 1),
        agg_merge AS (
          SELECT kll_merge_agg_bigint(skb) AS ab,
                 kll_merge_agg_float(skf) AS af
          FROM kll_halves_v)
        SELECT kll_sketch_get_n_bigint(w.skb) AS n_big,
               kll_sketch_get_n_float(w.skf) AS n_float,
               kll_sketch_get_quantile_bigint(w.skb, 0.5) AS p50_big,
               round(CAST(kll_sketch_get_quantile_float(w.skf, 0.5)
                          AS DOUBLE), 6) AS p50_float,
               round(kll_sketch_get_rank_bigint(w.skb, 50), 6)
                 AS rank_50_big,
               CASE WHEN kll_sketch_get_quantile_bigint(p.mb, 0.9)
                         = kll_sketch_get_quantile_bigint(w.skb, 0.9)
                    THEN 1 ELSE 0 END AS p90_merge_consistent_big,
               CASE WHEN kll_sketch_get_quantile_float(a.af, 0.9)
                         = kll_sketch_get_quantile_float(w.skf, 0.9)
                    THEN 1 ELSE 0 END AS p90_merge_consistent_float,
               kll_sketch_get_n_double(p.md) AS n_merged_double
        FROM whole w, pair_merge p, agg_merge a
    """)


# ---------------------------------------------------------------------------
# sketch aggregate leftovers: theta_*_agg, bitmap_and_agg, count_min_sketch
# ---------------------------------------------------------------------------

@query(
    "sketch_agg_leftovers",
    oracle="""
    WITH v AS (
      SELECT o_custkey % 64 AS b, o_orderkey % 2 AS half
      FROM orders WHERE o_orderkey <= 2000)
    SELECT CAST((SELECT count(DISTINCT b) FROM v) AS BIGINT)
             AS theta_union_est,
           CAST((SELECT count(DISTINCT b) FROM v WHERE half = 0
                 AND b IN (SELECT b FROM v WHERE half = 1)) AS BIGINT)
             AS theta_intersect_est,
           CAST((SELECT count(DISTINCT b) FROM v WHERE half = 0
                 AND b IN (SELECT b FROM v WHERE half = 1)) AS BIGINT)
             AS bitmap_and_count,
           CAST((SELECT count(DISTINCT b) FROM v) AS BIGINT)
             AS bitmap_or_count,
           CAST(1 AS BIGINT) AS cms_deterministic,
           CAST(1 AS BIGINT) AS cms_input_sensitive
    FROM (SELECT 1) one
    """,
)
def sketch_agg_leftovers(spark, sf_dir):
    """The remaining sketch AGGREGATE forms: theta_union_agg /
    theta_intersection_agg (union resp. intersection over per-half
    theta sketches — exact at 64 distinct values), bitmap_and_agg /
    bitmap_or_agg folding per-half bitmaps, and the native
    count_min_sketch aggregate — its binary has no SQL-side query
    surface, so the probe pins what IS observable: a fixed seed makes
    the sketch bytes deterministic across independent passes, and
    removing one key's rows changes them.  Estimates pin against
    their exact relational twins."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    o.select((F.col("o_custkey") % 64).alias("b"),
             (F.col("o_orderkey") % 2).alias("half")
             ).createOrReplaceTempView("sketchv")
    spark.sql("""
        SELECT half,
               theta_sketch_agg(b) AS th,
               bitmap_construct_agg(bitmap_bit_position(b + 1)) AS bm
        FROM sketchv GROUP BY half
    """).createOrReplaceTempView("sketch_halves")
    return spark.sql("""
        WITH theta AS (
          SELECT theta_sketch_estimate(theta_union_agg(th))
                   AS theta_union_est,
                 theta_sketch_estimate(theta_intersection_agg(th))
                   AS theta_intersect_est
          FROM sketch_halves),
        bm AS (
          SELECT bitmap_count(bitmap_and_agg(bm)) AS bitmap_and_count,
                 bitmap_count(bitmap_or_agg(bm)) AS bitmap_or_count
          FROM sketch_halves),
        cms1 AS (
          SELECT count_min_sketch(b, 0.001d, 0.01d, 42) AS sk
          FROM sketchv),
        cms2 AS (
          SELECT count_min_sketch(b, 0.001d, 0.01d, 42) AS sk
          FROM sketchv),
        cms3 AS (
          SELECT count_min_sketch(b, 0.001d, 0.01d, 42) AS sk
          FROM sketchv WHERE b <> 7)
        SELECT t.theta_union_est, t.theta_intersect_est,
               b.bitmap_and_count, b.bitmap_or_count,
               CASE WHEN hex(c1.sk) = hex(c2.sk) THEN 1 ELSE 0 END
                 AS cms_deterministic,
               CASE WHEN hex(c1.sk) <> hex(c3.sk) THEN 1 ELSE 0 END
                 AS cms_input_sensitive
        FROM theta t, bm b, cms1 c1, cms2 c2, cms3 c3
    """)


# ---------------------------------------------------------------------------
# LTZ/NTZ timestamp family + interval ctors + epoch bridges
# ---------------------------------------------------------------------------

@query(
    "timestamp_ltz_ntz_functions",
    oracle="""
    WITH v AS (
      SELECT CAST(o_orderdate AS TIMESTAMP) AS ts, o_orderkey AS k
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(max(CAST('2024-03-15 10:30:00' AS TIMESTAMP) )
                AS VARCHAR) AS ts_ltz_parse,
           CAST(max(CAST('2024-03-15 10:30:00' AS TIMESTAMP))
                AS VARCHAR) AS ts_ntz_parse,
           CAST(max(make_timestamp(2024, 5, 20, 8, 15, 30)) AS VARCHAR)
             AS made_ltz,
           CAST(max(make_timestamp(2024, 5, 20, 8, 15, 30)) AS VARCHAR)
             AS made_ntz,
           CAST(count(CASE WHEN NULL IS NULL THEN NULL END) AS BIGINT)
             AS n_bad_made,
           CAST(TIMESTAMP '1970-01-02 00:00:00' AS VARCHAR)
             AS from_unix_86400,
           CAST(sum(CAST(epoch(ts) AS BIGINT)) AS BIGINT)
             AS sum_to_unix,
           CAST(max(ts + to_days(3) + to_hours(2)) AS VARCHAR)
             AS plus_interval,
           CAST(count(CASE WHEN NULL IS NULL THEN NULL END) AS BIGINT)
             AS n_bad_interval,
           CAST(sum(date_part('hour',
                    ts + INTERVAL 90 MINUTE)) AS BIGINT) AS sum_datepart_h,
           CAST(TIMESTAMP '2024-01-01 00:45:00' AS VARCHAR) AS ts_add_45m,
           CAST(datediff('minute',
                TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-02 03:30:00') AS BIGINT) AS tdiff_minutes,
           'UTC' AS session_tz,
           CAST(1 AS BIGINT) AS curdate_consistent
    FROM v
    """,
)
def timestamp_ltz_ntz_functions(spark, sf_dir):
    """The LTZ/NTZ timestamp constructor matrix: to_timestamp_ltz /
    to_timestamp_ntz parse identically under the pinned UTC session
    zone, make_timestamp_ltz / make_timestamp_ntz build the same
    wall-clock instant, try_make_timestamp_ltz rejects month 13,
    from_unixtime / to_unix_timestamp bridge the epoch in both
    directions, make_interval / try_make_interval construct
    day-time intervals (the invalid int-overflow form returning
    NULL), the timestamp_add / timestamp_diff named functions and
    datepart join their SQL-keyword twins, current_timezone reports
    the pinned session zone, and curdate() == current_date() is an
    in-plan consistency identity (both resolve at plan time)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    o.select(F.col("o_orderdate").cast("timestamp").alias("ts"),
             F.col("o_orderkey").alias("k")
             ).createOrReplaceTempView("ltz_v")
    return spark.sql("""
        SELECT count(*) AS cnt,
               CAST(max(to_timestamp_ltz('2024-03-15 10:30:00'))
                    AS STRING) AS ts_ltz_parse,
               CAST(max(to_timestamp_ntz('2024-03-15 10:30:00'))
                    AS STRING) AS ts_ntz_parse,
               CAST(max(make_timestamp_ltz(2024, 5, 20, 8, 15, 30))
                    AS STRING) AS made_ltz,
               CAST(max(make_timestamp_ntz(2024, 5, 20, 8, 15, 30))
                    AS STRING) AS made_ntz,
               count(try_make_timestamp_ltz(2024, 13, 1, 0, 0, 0))
                 AS n_bad_made,
               CAST(max(from_unixtime(86400)) AS STRING) AS from_unix_86400,
               sum(to_unix_timestamp(ts)) AS sum_to_unix,
               CAST(max(ts + make_interval(0, 0, 0, 3, 2, 0, 0))
                    AS STRING) AS plus_interval,
               count(try_make_interval(2147483647, 2147483647, 0, 0, 0, 0,
                                       0)) AS n_bad_interval,
               sum(datepart('hour', timestampadd(MINUTE, 90, ts)))
                 AS sum_datepart_h,
               max(current_timezone()) AS session_tz,
               max(CASE WHEN curdate() = current_date() THEN 1 ELSE 0 END)
                 AS curdate_consistent
        FROM ltz_v
    """).withColumns({
        "ts_add_45m": F.timestamp_add(
            "MINUTE", F.lit(45),
            F.lit("2024-01-01 00:00:00").cast("timestamp")).cast("string"),
        "tdiff_minutes": F.timestamp_diff(
            "MINUTE", F.lit("2024-01-01 00:00:00").cast("timestamp"),
            F.lit("2024-01-02 03:30:00").cast("timestamp")),
    })


# ---------------------------------------------------------------------------
# regression second moments + misc scalar leftovers
# ---------------------------------------------------------------------------

@query(
    "regr_moments_misc_functions",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y,
             l_orderkey AS k
      FROM lineitem WHERE l_orderkey <= 2000)
    SELECT round(regr_sxx(y, x), 4) AS sxx,
           round(regr_sxy(y, x), 4) AS sxy,
           round(regr_syy(y, x), 4) AS syy,
           CAST(sum(CAST(round(x / 7 + 0.3) AS BIGINT)) AS BIGINT)
             AS sum_rint,
           CAST(sum(-k) AS BIGINT) AS sum_negate,
           round(sum(acos(1.0 / (1 + k % 5))), 6) AS sum_acos,
           min(ltrim('  pad  ')) AS ltrimmed,
           min(rtrim('  pad  ')) AS rtrimmed,
           'a9993e364706816aba3e25717850c26c9cd0d89d' AS sha1_abc,
           '123.45' AS to_varchar_fmt,
           CAST(count(CASE WHEN k % 2 = 0
                           THEN try_cast('12x' AS DOUBLE) END) AS BIGINT)
             AS n_bad_number
    FROM v
    """,
)
def regr_moments_misc_functions(spark, sf_dir):
    """Regression second moments regr_sxx / regr_sxy / regr_syy
    (the sufficient statistics a distributed OLS reduces to — one
    map-side-partial aggregate each) plus scalar leftovers: rint
    banker's rounding probed off the .5 boundary, negate, acos,
    ltrim / rtrim defaults, sha (sha1 alias) pinned on a fixed
    input, to_varchar decimal formatting, try_to_number NULL on
    malformed input."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    v = li.select(F.col("l_quantity").cast("double").alias("x"),
                  F.col("l_extendedprice").cast("double").alias("y"),
                  F.col("l_orderkey").alias("k"))
    x, y, k = F.col("x"), F.col("y"), F.col("k")
    return v.agg(
        F.round(F.regr_sxx(y, x), 4).alias("sxx"),
        F.round(F.regr_sxy(y, x), 4).alias("sxy"),
        F.round(F.regr_syy(y, x), 4).alias("syy"),
        F.sum(F.rint(x / 7 + 0.3).cast("bigint")).alias("sum_rint"),
        F.sum(F.negate(k)).alias("sum_negate"),
        F.round(F.sum(F.acos(1.0 / (1 + k % 5))), 6).alias("sum_acos"),
        F.min(F.ltrim(F.lit("  pad  "))).alias("ltrimmed"),
        F.min(F.rtrim(F.lit("  pad  "))).alias("rtrimmed"),
        F.min(F.sha(F.lit("abc").cast("binary"))).alias("sha1_abc"),
        F.min(F.to_varchar(F.lit(123.45).cast("decimal(5,2)"),
                           F.lit("000.00"))).alias("to_varchar_fmt"),
        F.count(F.when(k % 2 == 0, F.try_to_number(F.lit("12x"),
                                                   F.lit("999"))))
        .alias("n_bad_number"))


# ---------------------------------------------------------------------------
# UDF invocation surface: call_udf / call_function / java_method /
# raise_error guard / randstr shape / input_file block metadata / null order
# ---------------------------------------------------------------------------

@query(
    "udf_invocation_surface",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderkey % 3 END AS nx
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(sum(k + 1) AS BIGINT) AS sum_call_udf,
           CAST(sum((k * 2) % 7) AS BIGINT) AS sum_call_function,
           CAST(sum(((k % 7) + 7) % 7) AS BIGINT) AS sum_java_floormod,
           CAST(count(*) AS BIGINT) AS n_no_error,
           CAST(count(*) AS BIGINT) AS n_randstr_len8,
           CAST(0 AS BIGINT) AS min_block_start,
           CAST(count(*) AS BIGINT) AS n_block_len_pos,
           CAST((SELECT sum(k) FROM (
                   SELECT k FROM v ORDER BY nx ASC NULLS FIRST, k LIMIT 5) s)
                AS BIGINT) AS top5_nulls_first,
           CAST((SELECT sum(k) FROM (
                   SELECT k FROM v ORDER BY nx DESC NULLS LAST, k LIMIT 5) s)
                AS BIGINT) AS top5_desc_nulls_last
    FROM v
    """,
)
def udf_invocation_surface(spark, sf_dir):
    """Dynamic invocation surface: call_udf on a session-registered
    Python UDF, call_function on a CREATE FUNCTION SQL UDF,
    java_method reflecting Math.floorMod, raise_error behind a
    never-true guard (lazy branch evaluation — the query must NOT
    raise), randstr probed by shape only (length is the deterministic
    part), input_file_block_start/length scan metadata (single-split
    parquet files: start 0, positive length), and the four null-order
    sort modifiers via deterministic top-5 windows."""
    spark.udf.register("sc_plus_one", lambda v: v + 1, "bigint")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sc_double_mod7(x BIGINT) "
              "RETURNS BIGINT RETURN (x * 2) % 7")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderkey") % 3).alias("nx"),
        F.input_file_block_start().alias("bs"),
        F.input_file_block_length().alias("bl"),
        F.java_method(F.lit("java.lang.Math"), F.lit("floorMod"),
                      (F.col("o_orderkey") % 7).cast("int"),
                      F.lit(7)).cast("bigint").alias("jfm"),
        F.when(F.length(F.randstr(F.lit(8), F.lit(42))) == 8, 1)
        .otherwise(0).alias("rs8"))
    k = F.col("k")
    top5_nf = (v.orderBy(F.asc_nulls_first("nx"), F.asc("k")).limit(5)
               .agg(F.sum("k").alias("s")))
    top5_dnl = (v.orderBy(F.desc_nulls_last("nx"), F.asc("k")).limit(5)
                .agg(F.sum("k").alias("s")))
    agg = v.agg(
        F.sum(F.call_udf("sc_plus_one", k)).alias("sum_call_udf"),
        F.sum(F.call_function("sc_double_mod7", k))
        .alias("sum_call_function"),
        F.sum(F.col("jfm")).alias("sum_java_floormod"),
        F.count(F.when(F.lit(False),
                       F.raise_error(F.lit("unreachable")))
                .otherwise(F.lit(1))).alias("n_no_error"),
        F.sum(F.col("rs8")).alias("n_randstr_len8"),
        F.min("bs").alias("min_block_start"),
        F.sum(F.when(F.col("bl") > 0, 1).otherwise(0))
        .alias("n_block_len_pos"))
    return (agg.crossJoin(top5_nf.withColumnRenamed("s", "top5_nulls_first"))
            .crossJoin(top5_dnl
                       .withColumnRenamed("s", "top5_desc_nulls_last")))


# ---------------------------------------------------------------------------
# to_xml / schema_of_xml: struct -> XML serialization and schema inference
# ---------------------------------------------------------------------------

@query(
    "xml_serialize_schema",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k, o_orderstatus AS st
      FROM orders WHERE o_orderkey <= 200)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           min('<ROW>' || chr(10) || '    <k>' || CAST(k AS VARCHAR)
               || '</k>' || chr(10) || '    <st>' || st || '</st>'
               || chr(10) || '</ROW>') AS min_xml,
           CAST(sum(CASE WHEN ('<ROW>' || chr(10) || '    <k>'
                               || CAST(k AS VARCHAR) || '</k>' || chr(10)
                               || '    <st>' || st || '</st>' || chr(10)
                               || '</ROW>')
                              LIKE '%<k>%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_has_field,
           'STRUCT<k: BIGINT, st: STRING>' AS inferred_schema
    FROM v
    """,
)
def xml_serialize_schema(spark, sf_dir):
    """to_xml serializing a struct per row (the writer half of the
    XML surface — from_xml's inverse) and schema_of_xml inferring the
    struct type from a sample document; serialized form is pinned by
    reconstructing Spark's ROW markup in the oracle (4-space indent,
    newline separators), inference by the literal type string."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 200)
    v = o.select(
        F.to_xml(F.struct(F.col("o_orderkey").alias("k"),
                          F.col("o_orderstatus").alias("st"))).alias("xml"))
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("xml").alias("min_xml"),
        F.sum(F.when(F.col("xml").like("%<k>%"), 1).otherwise(0))
        .alias("n_has_field"),
        F.min(F.schema_of_xml(F.lit("<ROW><k>1</k><st>O</st></ROW>")))
        .alias("inferred_schema"))


# ---------------------------------------------------------------------------
# error-tolerant try_* net/crypto/reflect family
# ---------------------------------------------------------------------------

@query(
    "try_net_crypto_reflect",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             'http://example.com/p' || CAST(o_orderkey % 5 AS VARCHAR)
               || '?q=' || CAST(o_orderkey % 3 AS VARCHAR) AS url
      FROM orders WHERE o_orderkey <= 300)
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           min(CASE WHEN k % 5 = 0 THEN '/p0' WHEN k % 5 = 1 THEN '/p1'
                    WHEN k % 5 = 2 THEN '/p2' WHEN k % 5 = 3 THEN '/p3'
                    ELSE '/p4' END) AS min_path,
           CAST(count(CASE WHEN 1 = 0 THEN 1 END) AS BIGINT)
             AS n_bad_url_parse,
           CAST(count(CASE WHEN 1 = 0 THEN 1 END) AS BIGINT)
             AS n_bad_url_decode,
           'a b c' AS decoded_ok,
           CAST(count(*) AS BIGINT) AS n_aes_roundtrip,
           CAST(count(CASE WHEN 1 = 0 THEN 1 END) AS BIGINT)
             AS n_aes_tampered,
           CAST(sum(((k % 9) + 9) % 9) AS BIGINT) AS sum_reflect_mod,
           CAST(count(CASE WHEN 1 = 0 THEN 1 END) AS BIGINT)
             AS n_bad_reflect
    FROM v
    """,
)
def try_net_crypto_reflect(spark, sf_dir):
    """The error-tolerant try_* tail: try_parse_url extracts PATH and
    returns NULL (not an error) on a malformed URL, try_url_decode
    NULLs an invalid %-escape while decoding the valid one,
    try_aes_decrypt round-trips aes_encrypt output under the right
    key and NULLs a tampered ciphertext, and try_reflect invokes
    Math.floorMod while NULLing a runtime reflection failure
    (Integer.parseInt on a non-number) —
    every failure mode that would otherwise kill a 1000-executor
    stage reduced to NULL accounting."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    key = "0123456789abcdef"
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.concat(F.lit("http://example.com/p"),
                 (F.col("o_orderkey") % 5).cast("string"),
                 F.lit("?q="),
                 (F.col("o_orderkey") % 3).cast("string")).alias("url"),
        F.try_reflect(F.lit("java.lang.Math"), F.lit("floorMod"),
                      (F.col("o_orderkey") % 9).cast("int"),
                      F.lit(9)).cast("bigint").alias("refl_ok"),
        F.try_reflect(F.lit("java.lang.Integer"), F.lit("parseInt"),
                      F.lit("not a number")).alias("refl_bad"))
    k = F.col("k")
    enc = F.expr(f"aes_encrypt(cast(k as string), '{key}', 'ECB')")
    dec_ok = F.expr(
        f"cast(try_aes_decrypt(aes_encrypt(cast(k as string), '{key}', "
        f"'ECB'), '{key}', 'ECB') as string)")
    dec_bad = F.expr(
        f"try_aes_decrypt(cast(concat('xx', cast(aes_encrypt("
        f"cast(k as string), '{key}', 'ECB') as string)) as binary), "
        f"'{key}', 'ECB')")
    return v.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.try_parse_url(F.col("url"), F.lit("PATH")))
        .alias("min_path"),
        F.count(F.try_parse_url(F.lit("not a url %"), F.lit("HOST"),
                                F.lit("x"))).alias("n_bad_url_parse"),
        F.count(F.try_url_decode(F.lit("%zz"))).alias("n_bad_url_decode"),
        F.min(F.try_url_decode(F.lit("a%20b%20c"))).alias("decoded_ok"),
        F.sum(F.when(dec_ok == k.cast("string"), 1).otherwise(0))
        .alias("n_aes_roundtrip"),
        F.count(dec_bad).alias("n_aes_tampered"),
        F.sum(F.col("refl_ok")).alias("sum_reflect_mod"),
        F.count(F.col("refl_bad")).alias("n_bad_reflect"))


# ---------------------------------------------------------------------------
# native Arrow UDF (arrow_udf) + UDT unwrap + session introspection tail
# ---------------------------------------------------------------------------

@query(
    "arrow_native_udf_surface",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DOUBLE) AS p,
             CASE WHEN o_orderkey % 4 = 0 THEN NULL
                  ELSE o_orderkey % 6 END AS nx
      FROM orders WHERE o_orderkey <= 400)
    SELECT CAST(sum(k * 3 + 1) AS BIGINT) AS sum_arrow_udf,
           round(sum(p * 1.1), 4) AS sum_arrow_scaled,
           CAST(round(1.0 + 2.0, 6) AS DOUBLE) AS sum_udt_values,
           'default' AS cur_db,
           CAST(1 AS BIGINT) AS local_ts_consistent,
           CAST((SELECT sum(k) FROM (
                   SELECT k FROM v ORDER BY nx ASC NULLS LAST, k
                   LIMIT 5) s) AS BIGINT) AS top5_asc_nulls_last,
           CAST((SELECT sum(k) FROM (
                   SELECT k FROM v ORDER BY nx DESC NULLS FIRST, k
                   LIMIT 5) s) AS BIGINT) AS top5_desc_nulls_first
    FROM v
    """,
)
def arrow_native_udf_surface(spark, sf_dir):
    """The native Arrow UDF API (@arrow_udf — the 4.1 evolution of
    pandas_udf that hands the worker raw pyarrow arrays, no pandas
    conversion), unwrap_udt exposing an ML VectorUDT's internal
    struct to SQL, current_database, the localtimestamp/
    current_timestamp NTZ/LTZ consistency identity under the UTC
    session zone (both are frozen at query start, so their epoch
    difference is exactly 0), and the remaining two null-order sort
    modifiers (asc_nulls_last / desc_nulls_first) via deterministic
    top-5 windows."""
    import pyarrow.compute as pc
    from pyspark.ml.linalg import Vectors

    @F.arrow_udf("bigint")
    def sc_affine(a):
        return pc.add(pc.multiply(a, 3), 1)

    @F.arrow_udf("double")
    def sc_scale(a):
        return pc.multiply(a, 1.1)

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    v = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("p"),
        F.when(F.col("o_orderkey") % 4 == 0, None)
        .otherwise(F.col("o_orderkey") % 6).alias("nx"))
    udt = spark.createDataFrame([(Vectors.dense([1.0, 2.0]),)], ["vec"])
    udt_sum = (udt.select(F.unwrap_udt("vec").alias("u"))
               .select(F.aggregate(F.col("u.values"),
                                   F.lit(0.0),
                                   lambda acc, e: acc + e).alias("s")))
    intro = spark.sql("""
        SELECT current_database() AS cur_db,
               CASE WHEN unix_timestamp(current_timestamp())
                         - unix_timestamp(localtimestamp()) = 0
                    THEN 1 ELSE 0 END AS local_ts_consistent
    """)
    top5_anl = (v.orderBy(F.asc_nulls_last("nx"), F.asc("k")).limit(5)
                .agg(F.sum("k").alias("top5_asc_nulls_last")))
    top5_dnf = (v.orderBy(F.desc_nulls_first("nx"), F.asc("k")).limit(5)
                .agg(F.sum("k").alias("top5_desc_nulls_first")))
    agg = v.agg(
        F.sum(sc_affine(F.col("k"))).alias("sum_arrow_udf"),
        F.round(F.sum(sc_scale(F.col("p"))), 4).alias("sum_arrow_scaled"))
    return (agg
            .crossJoin(udt_sum.select(F.round(F.col("s"), 6)
                                      .alias("sum_udt_values")))
            .crossJoin(intro)
            .crossJoin(top5_anl)
            .crossJoin(top5_dnf))


# ---------------------------------------------------------------------------
# DataFrame.summary()/describe() wiring over exact statistics
# ---------------------------------------------------------------------------

@query(
    "dataframe_summary_stats",
    oracle="""
    WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS p FROM orders)
    SELECT 'count' AS summary,
           CAST(count(*) AS VARCHAR) AS o_totalprice FROM v
    UNION ALL
    SELECT 'mean', CAST(avg(p) AS VARCHAR) FROM v
    UNION ALL
    SELECT 'stddev', CAST(stddev_samp(p) AS VARCHAR) FROM v
    UNION ALL
    SELECT 'min', CAST(min(p) AS VARCHAR) FROM v
    UNION ALL
    SELECT 'max', CAST(max(p) AS VARCHAR) FROM v
    ORDER BY summary
    """,
)
def dataframe_summary_stats(spark, sf_dir):
    """DataFrame.summary() — the interactive profiling verb — over
    the exact-statistic subset (count/mean/stddev/min/max; the
    percentile rows use approxQuantile and are pinned elsewhere by
    the sketch-audit queries).  summary() emits STRING cells, so the
    oracle casts its exact aggregates to the same text form; row
    order is normalized by sorting on the summary label."""
    o = t(spark, sf_dir, "orders")
    v = o.select(F.col("o_totalprice").cast("double"))
    return (v.summary("count", "mean", "stddev", "min", "max")
            .orderBy("summary"))


# DuckDB twin of functions/dedup.py::hash60
_H60_MS = "('0x' || substr(md5({e}), 1, 15))::BIGINT"


@query(
    "count_min_sketch_estimate",
    oracle=f"""
    WITH keyed AS (
      SELECT l_partkey % 1000 AS k FROM lineitem
    ), exact AS (
      SELECT k, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM keyed GROUP BY k
    ), cells AS (
      SELECT g.r,
             {_H60_MS.format(e="CAST(k AS VARCHAR) || ':cm' || CAST(g.r AS VARCHAR)")}
               % 64 AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM keyed CROSS JOIN generate_series(0, 2) g(r)
      GROUP BY g.r, b
    ), est AS (
      SELECT e.k, e.exact_cnt, min(c.c) AS est_cnt
      FROM exact e CROSS JOIN generate_series(0, 2) g(r)
      JOIN cells c
        ON c.r = g.r
       AND c.b = {_H60_MS.format(e="CAST(e.k AS VARCHAR) || ':cm' || CAST(g.r AS VARCHAR)")}
               % 64
      GROUP BY e.k, e.exact_cnt
    )
    SELECT k, exact_cnt, est_cnt,
           est_cnt - exact_cnt AS overcount
    FROM est ORDER BY exact_cnt DESC, k LIMIT 10
    """,
)
def count_min_sketch_estimate(spark, sf_dir):
    """Hand-rolled count-min sketch (depth 3 × width 64, salted-hash
    rows) with its estimates checked against exact counts: the sketch
    build folds to 192 cells regardless of key
    cardinality, the mergeable fixed-size summary that makes heavy-
    hitter tracking feasible in one pass at 100 TB — and every
    estimate provably ≥ the exact count (the CM overestimate
    guarantee; ``overcount`` makes the collision error visible, width
    64 against 1000 keys forces collisions).  Top-10 keys by exact
    count."""
    from sidecar_spark.functions.dedup import hash60

    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 1000).alias("k"))
    exact = (li.groupBy("k")
             .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
             .localCheckpoint(eager=True))
    bucket = hash60(F.concat(F.col("k").cast("string"), F.lit(":cm"),
                             F.col("r").cast("string"))) % 64
    # cell counts fold over the per-key aggregate, not raw rows: the
    # bucket is a function of k alone, so summing exact_cnt per
    # (row, bucket) is the identical sketch while hashing |keys|×3
    # values instead of |rows|×3 (the per-row md5 formulation cost
    # 4 s at sf0.1; the audit needs the exact table anyway)
    keyed_r = exact.select(
        "k", "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r"))
    cells = (keyed_r.select("r", bucket.alias("b"), "exact_cnt")
             .groupBy("r", "b")
             .agg(F.sum("exact_cnt").cast("bigint").alias("c")))
    probes = keyed_r.withColumn("b", bucket)
    est = (probes.join(F.broadcast(cells), ["r", "b"])
           .groupBy("k", "exact_cnt")
           .agg(F.min("c").alias("est_cnt")))
    return (est.select("k", "exact_cnt", "est_cnt",
                       (F.col("est_cnt") - F.col("exact_cnt"))
                       .alias("overcount"))
            .orderBy(F.desc("exact_cnt"), "k").limit(10))
