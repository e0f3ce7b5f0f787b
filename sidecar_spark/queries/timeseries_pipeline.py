"""Time-series / product-analytics battery over the events table:
EWMA smoothing, ordered funnel, cohort retention, column profiling,
and histogram binning.

Scale notes: every query here is a scan + window-or-groupBy plan —
one shuffle on an explicit key (user_id / cohort / bin), no
collect-side logic, no UDFs. Window functions partition by user_id
(the natural key at 100 TB: millions of users × bounded events each);
profiling and histograms are single-pass aggregations with map-side
partials.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sidecar_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# EWMA smoothing (finite-memory K-lag form)
# ---------------------------------------------------------------------------

_EWMA_K = 8
_EWMA_ALPHA = 0.5
# weight for lag j: alpha^j (exact binary decimals — identical literals
# land in both engines' SQL)
_EWMA_W = [(_EWMA_ALPHA ** j) for j in range(_EWMA_K)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w, 0) * {w!r}"
        for j, w in enumerate(_EWMA_W))
    den = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0 ELSE {w!r} END)"
        for j, w in enumerate(_EWMA_W))
    return f"""
    SELECT user_id, event_id,
           round(({num}) / ({den}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("events_ewma", oracle=_ewma_oracle())
def events_ewma(spark, sf_dir):
    """Per-user EWMA of `value` (alpha=0.5) in the finite-memory K-lag
    form: ewma_t = Σ_j α^j·x_{t-j} / Σ_j α^j over the last K=8 events.
    The K explicit lags make the weights row-independent, so the whole
    thing is one window pass (the recursive form needs per-row
    exponent rescaling that overflows doubles on long histories).
    One shuffle on user_id; state per row is K lags — constant."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j, wt in enumerate(_EWMA_W):
        lag = F.lag("value", j).over(w)
        term = F.coalesce(lag, F.lit(0)) * F.lit(wt)
        dterm = F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return e.select("user_id", "event_id",
                    F.round(num / den, 6).alias("ewma"))


# ---------------------------------------------------------------------------
# ordered funnel: signup → click → purchase
# ---------------------------------------------------------------------------

@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
    UNION ALL SELECT '2_click', count(*) FROM s2
    UNION ALL SELECT '3_purchase', count(*) FROM s3
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel: users who signed up, then clicked
    AFTER the signup, then purchased AFTER that click. Each stage is a
    groupBy(user_id).min(ts) joined to the next event class with a
    strictly-later predicate — per-stage state is one timestamp per
    user, and every join key is user_id (co-partitioned chain: AQE
    reuses the hash partitioning across the three stages)."""
    e = t(spark, sf_dir, "events")
    s1 = (e.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (e.where(F.col("event_type") == "click")
          .join(s1, "user_id").where(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (e.where(F.col("event_type") == "purchase")
          .join(s2, "user_id").where(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    return (
        s1.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit("1_signup").alias("stage"), "n_users")
        .unionAll(s2.agg(F.count(F.lit(1)).alias("n_users"))
                  .select(F.lit("2_click").alias("stage"), "n_users"))
        .unionAll(s3.agg(F.count(F.lit(1)).alias("n_users"))
                  .select(F.lit("3_purchase").alias("stage"), "n_users"))
    )


# ---------------------------------------------------------------------------
# cohort retention (weekly)
# ---------------------------------------------------------------------------

@query(
    "events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_wk
      FROM events)
    SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(floor(datediff('day', cohort_wk, act_wk) / 7) AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY cohort_wk, week_offset
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention: cohort = ISO week of a user's first
    event; one row per (cohort, week offset) with distinct active
    users. Both inputs shuffle once on user_id (the join key), then
    once on the small (cohort, offset) key — the standard two-shuffle
    retention shape at any scale."""
    e = t(spark, sf_dir, "events")
    firsts = (e.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort_wk")))
    activity = e.select("user_id", F.date_trunc("week", "ts").alias("act_wk")) \
        .distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff("act_wk", "cohort_wk") / 7).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# column profiling (data-quality pass)
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_orderkey", "CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"),
    ("o_custkey", "CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"),
    ("o_totalprice",
     "CAST(CAST(round(min({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)",
     "CAST(CAST(round(max({c}), 2) AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "CAST(min({c}) AS VARCHAR)", "CAST(max({c}) AS VARCHAR)"),
    ("o_orderpriority", "min({c})", "max({c})"),
]


def _profile_oracle() -> str:
    parts = []
    for c, mn, mx in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS column_name, "
            f"count(*) - count({c}) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{mn.format(c=c)} AS min_value, "
            f"{mx.format(c=c)} AS max_value FROM orders")
    return " UNION ALL ".join(parts)


@query("orders_profile", oracle=_profile_oracle())
def orders_profile(spark, sf_dir):
    """Column-profile pass over orders (nulls / distincts / min / max
    per column, uniform string output) — the data-quality audit every
    ingest pipeline runs. Each column profiles as
    groupBy(value).count → tiny final agg: the distinct count is the
    grouped row count, null count is the null group's n, min/max fold
    over the (already unique) values. The value-keyed shuffle carries
    combiner-collapsed (value, partial_count) pairs — 3× faster here
    and strictly less shuffle than the multi-DISTINCT Expand plan
    (which replicates every row per profiled column); the cost is one
    column-pruned scan per column, which the union's branches run
    concurrently in a single job."""
    from functools import reduce

    o = t(spark, sf_dir, "orders")

    def branch(c, mn_sql, mx_sql):
        g = o.groupBy(c).agg(F.count(F.lit(1)).alias("n"))
        # same cast chains as the oracle; Spark spells VARCHAR as STRING
        return g.agg(
            F.lit(c).alias("column_name"),
            F.coalesce(F.sum(F.when(F.col(c).isNull(), F.col("n"))),
                       F.lit(0)).alias("n_nulls"),
            F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0))
            .alias("n_distinct"),
            F.expr(mn_sql.format(c=c).replace("VARCHAR", "STRING"))
            .alias("min_value"),
            F.expr(mx_sql.format(c=c).replace("VARCHAR", "STRING"))
            .alias("max_value"),
        )

    return reduce(lambda a, b: a.unionAll(b),
                  [branch(c, mn, mx) for c, mn, mx in _PROFILE_COLS])


# ---------------------------------------------------------------------------
# histogram binning
# ---------------------------------------------------------------------------

_BIN = 25000


@query(
    "orders_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / {_BIN}) AS BIGINT) * {_BIN} AS bin_lo,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY bin_lo
    """,
)
def orders_histogram(spark, sf_dir):
    """Fixed-width histogram of order totals (bin = {_BIN}): floor-div
    bucketing entirely map-side, then one tiny-key aggregation — the
    degenerate-cardinality groupBy that partial aggregation collapses
    before the shuffle at any scale."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy((F.floor(F.col("o_totalprice") / _BIN) * _BIN)
                  .alias("bin_lo"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


# ---------------------------------------------------------------------------
# gap-filled resampling
# ---------------------------------------------------------------------------

@query(
    "events_gapfill",
    oracle="""
    WITH RECURSIVE hours(hr) AS (
      SELECT (SELECT date_trunc('hour', min(ts)) FROM events)
      UNION ALL
      SELECT hr + INTERVAL 1 HOUR FROM hours
      WHERE hr < (SELECT date_trunc('hour', max(ts)) FROM events)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS hr, event_type,
             count(*) AS n, round(sum(value), 2) AS sv
      FROM events GROUP BY hr, event_type)
    SELECT strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS window_start,
           ty.event_type,
           coalesce(a.n, 0) AS n_events,
           coalesce(a.sv, 0.0) AS sum_value
    FROM hours h CROSS JOIN types ty
    LEFT JOIN agg a ON a.hr = h.hr AND a.event_type = ty.event_type
    """,
)
def events_gapfill(spark, sf_dir):
    """Gap-filled hourly resampling: the dense (hour × event_type) axis
    is generated with `sequence` from the scalar min/max bounds (no
    collect — the bounds row stays a DataFrame) and left-joined to the
    hourly aggregate, zero-filling empty buckets. The axis side is
    tiny at any scale (time × type cardinality), so the join
    broadcasts; the heavy side collapses in the aggregation first —
    the canonical time-series densification shape."""
    e = t(spark, sf_dir, "events")
    bounds = e.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                   F.date_trunc("hour", F.max("ts")).alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("hr"))
    types = e.select("event_type").distinct()
    agg = (e.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sv")))
    axis = hours.crossJoin(types)
    return (
        axis.join(agg, ["hr", "event_type"], "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 interval build (change-data capture shape)
# ---------------------------------------------------------------------------

@query(
    "events_scd2",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                  THEN 0 ELSE 1 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked)
    SELECT user_id, event_type,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(min(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY min(ts)),
                             '%Y-%m-%d %H:%M:%S'), 'open') AS valid_to
    FROM runs
    GROUP BY user_id, event_type, run_id
    """,
)
def events_scd2(spark, sf_dir):
    """SCD-type-2 interval build from an event log: collapse each
    user's consecutive same-type runs into (valid_from, valid_to]
    intervals, the last one open. Two window passes + one groupBy, all
    partitioned by user_id — one shuffle total (Spark reuses the
    user_id hash partitioning across the windows and the aggregation)."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id", "event_type", "ts",
        F.when(F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
               0).otherwise(1).alias("chg"),
        F.col("event_id"),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    grouped = (runs.groupBy("user_id", "event_type", "run_id")
               .agg(F.min("ts").alias("vf")))
    nxt = W.partitionBy("user_id").orderBy("vf")
    return grouped.select(
        "user_id", "event_type",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("vf").over(nxt), "yyyy-MM-dd HH:mm:ss"),
            F.lit("open")).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# event-transition matrix (Markov counts)
# ---------------------------------------------------------------------------

@query(
    "events_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, count(*) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition counts over each user's event
    sequence (lead + groupBy): one shuffle on user_id for the window,
    one on the 25-cell transition key — the path-analysis /
    next-action-model building block."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("event_type",
                   F.lead("event_type").over(w).alias("next_type"))
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "snapshot_state_diff",
    oracle="""
    WITH v1 AS (
      SELECT user_id, event_type AS state FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-10 00:00:00')
      WHERE rn = 1),
    v2 AS (
      SELECT user_id, event_type AS state FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00')
      WHERE rn = 1)
    SELECT CASE WHEN v1.user_id IS NULL THEN 'added'
                WHEN v1.state <> v2.state THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           v2.state AS v2_state,
           count(*) AS n_users
    FROM v2 LEFT JOIN v1 USING (user_id)
    GROUP BY change_class, v2_state
    """,
)
def snapshot_state_diff(spark, sf_dir):
    """CDC-style snapshot diff: each user's "state" is their latest
    event type as of a cutoff; diff two snapshot dates and classify
    every user as added / changed / unchanged — the change-data audit
    between two ingestion snapshots (the read-side complement of
    merge_upsert, and the batch analog of a CDC feed).

    Scale shape: both snapshots come from ONE pass shape (filter +
    per-user latest via window); the diff is a join on user_id — at
    100 TB this co-partitions if both snapshots share the same
    key layout, and AQE handles the residual skew. The deterministic
    (ts, event_id) tie-break makes "latest" reproducible."""
    e = t(spark, sf_dir, "events")

    def snapshot(cutoff: str):
        w = (W.partitionBy("user_id")
             .orderBy(F.desc("ts"), F.desc("event_id")))
        return (
            e.where(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )
    v1 = snapshot("2024-01-10 00:00:00").withColumnRenamed("state", "s1")
    v2 = snapshot("2024-01-20 00:00:00").withColumnRenamed("state", "s2")
    change = (
        F.when(F.col("s1").isNull(), "added")
        .when(F.col("s1") != F.col("s2"), "changed")
        .otherwise("unchanged")
    )
    return (
        v2.join(v1, "user_id", "left_outer")
        .select(change.alias("change_class"), F.col("s2").alias("v2_state"))
        .groupBy("change_class", "v2_state")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, value, event_type,
             epoch_us(ts) + CASE WHEN event_type = 'error'
                                 THEN 5 * 60 * 1000000
                                 ELSE 30 * 60 * 1000000 END AS end_us
      FROM events
    ), marks AS (
      SELECT *, CASE WHEN max(end_us) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     >= epoch_us(ts)
                 THEN 0 ELSE 1 END AS new_s
      FROM ev
    ), sess AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           round(sum(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_dynamic_gap(spark, sf_dir):
    """session_window with a DYNAMIC per-event gap (a Column, not a
    constant): error events extend their session only 5 minutes while
    normal activity keeps the 30-minute timeout — the
    behavior-dependent sessionization real clickstreams need.  Spark
    merges each event's [ts, ts+gap) interval per key in one pass of
    the native session operator; the oracle rebuilds the identical
    merge with a running max-of-ends sweep (an event joins the
    session while the max prior end reaches its timestamp).  Same
    single-shuffle profile as fixed-gap sessionization."""
    from sidecar_spark.queries.registry import t as _t

    e = _t(spark, sf_dir, "events")
    gap = (F.when(F.col("event_type") == "error", "5 minutes")
           .otherwise("30 minutes"))
    return (
        e.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count(F.when(F.col("event_type") == "error", 1))
             .alias("n_errors"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id",
                F.date_format("session_window.start",
                              "yyyy-MM-dd HH:mm:ss")
                .alias("session_start"),
                "n_events", "n_errors", "session_value")
    )


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                  THEN 0 ELSE 1 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ), dim AS (
      SELECT user_id, event_type AS state, min(ts) AS valid_from,
             coalesce(lead(min(ts)) OVER (PARTITION BY user_id
                                          ORDER BY min(ts)),
                      TIMESTAMP '9999-12-31') AS valid_to
      FROM runs GROUP BY user_id, event_type, run_id
    ), probes AS (
      SELECT user_id, event_id, ts FROM events WHERE event_id % 37 = 0
    )
    SELECT p.user_id, p.event_id, d.state,
           strftime(d.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from
    FROM probes p JOIN dim d
      ON p.user_id = d.user_id
     AND p.ts >= d.valid_from AND p.ts < d.valid_to
    ORDER BY p.user_id, p.event_id
    """,
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time (AS OF) dimension lookup: probe rows join the
    SCD2 interval table on key + [valid_from, valid_to) containment —
    the canonical warehouse pattern for 'what was the state WHEN this
    fact happened'.  The interval dim is built in the same job (the
    events_scd2 operator), and the join is an equi-join on user_id
    with a range residual: Spark hash-partitions on the key and
    evaluates the interval predicate post-match, so no
    nested-loop — the 100 TB shape as long as per-key version
    chains stay bounded.  Probes at ts exactly on a boundary take the
    NEW version ([from, to) semantics) — pinned by both engines."""
    from pyspark.sql import Window as W
    from sidecar_spark.queries.registry import t as _t

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
               0).otherwise(1).alias("chg"))
    runs = marked.select(
        "user_id", "event_type", "ts",
        F.sum("chg").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"))
    per_run = (
        runs.groupBy("user_id", "event_type", "run_id")
        .agg(F.min("ts").alias("valid_from")))
    dim = per_run.select(
        "user_id", F.col("event_type").alias("state"), "valid_from",
        F.coalesce(
            F.lead("valid_from").over(
                W.partitionBy("user_id").orderBy("valid_from")),
            F.lit("9999-12-31").cast("timestamp")).alias("valid_to"))
    probes = e.where(F.col("event_id") % 37 == 0).select(
        "user_id", "event_id", "ts")
    return (
        probes.alias("p")
        .join(dim.alias("d"),
              (F.col("p.user_id") == F.col("d.user_id"))
              & (F.col("p.ts") >= F.col("d.valid_from"))
              & (F.col("p.ts") < F.col("d.valid_to")))
        .select(F.col("p.user_id").alias("user_id"), "event_id", "state",
                F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
                .alias("valid_from"))
        .orderBy("user_id", "event_id")
    )


@query(
    "equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (quantile buckets via ntile, total
    tie-broken order): every bucket holds the same row count and the
    [lo, hi] edges ARE the empirical octiles — the complement of the
    equi-width histogram (orders_histogram) and the shape optimizers
    use for selectivity.  Global ntile needs a total sort; at scale
    the same edges come from approx_percentile in one pass
    (approx_quantile_audit) — this entry pins the exact contract."""
    from pyspark.sql import Window as W
    from sidecar_spark.queries.registry import t as _t

    o = _t(spark, sf_dir, "orders")
    ranked = o.select(
        "o_totalprice",
        F.ntile(8).over(W.orderBy("o_totalprice", "o_orderkey"))
        .alias("bucket"))
    return (
        ranked.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("o_totalprice"), 2).alias("lo"),
             F.round(F.max("o_totalprice"), 2).alias("hi"))
        .orderBy("bucket")
    )


@query(
    "timestamp_diff_add_functions",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(date_diff('minute', o_orderdate, o_orderdate + INTERVAL 36 HOUR)) AS BIGINT) AS sum_min_diff,
           count(CASE WHEN o_orderdate + INTERVAL 90 MINUTE
                           > o_orderdate + INTERVAL 1 HOUR
                      THEN 1 END) AS n_after,
           strftime(min(o_orderdate + INTERVAL 15 MINUTE),
                    '%Y-%m-%d %H:%M:%S') AS first_shifted
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def timestamp_diff_add_functions(spark, sf_dir):
    """timestampdiff / timestampadd SQL surface (unit-aware temporal
    arithmetic): minute-granular differences and additions, matching
    DuckDB's date_diff / INTERVAL arithmetic.  Pure codegen
    expressions folded into the grouping pass."""
    from sidecar_spark.queries.registry import t as _t

    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_tsd_v")
    return spark.sql("""
        SELECT o_orderpriority,
               sum(timestampdiff(MINUTE, o_orderdate,
                                 timestampadd(HOUR, 36, o_orderdate)))
                   AS sum_min_diff,
               count(CASE WHEN timestampadd(MINUTE, 90, o_orderdate)
                               > timestampadd(HOUR, 1, o_orderdate)
                          THEN 1 END) AS n_after,
               date_format(min(timestampadd(MINUTE, 15, o_orderdate)),
                           'yyyy-MM-dd HH:mm:ss') AS first_shifted
        FROM orders_tsd_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@query(
    "mad_outlier_audit",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS m
      FROM orders GROUP BY o_orderpriority
    ), dev AS (
      SELECT o.o_orderpriority, o.o_totalprice, med.m,
             abs(o.o_totalprice - med.m) AS ad
      FROM orders o JOIN med USING (o_orderpriority)
    ), mad AS (
      SELECT o_orderpriority, median(ad) AS mad_v
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           round(any_value(d.m), 4) AS med,
           round(any_value(mad.mad_v), 4) AS mad,
           count(CASE WHEN d.ad > 3 * 1.4826 * mad.mad_v THEN 1 END)
               AS n_outliers,
           count(*) AS n
    FROM dev d JOIN mad USING (o_orderpriority)
    GROUP BY d.o_orderpriority
    ORDER BY d.o_orderpriority
    """,
)
def mad_outlier_audit(spark, sf_dir):
    """Robust outlier detection via MAD (median absolute deviation):
    flag rows beyond 3 scaled MADs from the group median — the
    outlier rule that, unlike z-scores, is not itself corrupted by
    the outliers.  Two exact-median passes joined back on the
    (5-row) group key — both medians broadcast, so the fact table is
    scanned twice and shuffled never.  any_value is safe here: m and
    mad_v are functionally determined by the group key."""
    from sidecar_spark.queries.registry import t as _t

    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("m"))
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", "o_totalprice", "m",
        F.abs(F.col("o_totalprice") - F.col("m")).alias("ad"))
    mad = dev.groupBy("o_orderpriority").agg(F.median("ad").alias("mad_v"))
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.round(F.any_value("m"), 4).alias("med"),
             F.round(F.any_value("mad_v"), 4).alias("mad"),
             F.count(F.when(
                 F.col("ad") > 3 * 1.4826 * F.col("mad_v"), 1))
             .alias("n_outliers"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "entropy_profile",
    oracle="""
    WITH counts AS (
      SELECT user_id % 10 AS cohort, event_type, count(*) AS c
      FROM events GROUP BY user_id % 10, event_type
    ), tot AS (
      SELECT cohort, sum(c) AS n FROM counts GROUP BY cohort
    )
    SELECT counts.cohort,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy,
           count(*) AS n_types
    FROM counts JOIN tot USING (cohort)
    GROUP BY counts.cohort
    ORDER BY counts.cohort
    """,
)
def entropy_profile(spark, sf_dir):
    """Shannon entropy of the event-type distribution per user cohort
    — the diversity metric data-quality monitors track (collapsing
    entropy = a producer started emitting one event type).  Two tiny
    aggregates over the same grouped counts; everything after the
    first groupBy is broadcast-size."""
    from sidecar_spark.queries.registry import t as _t

    e = _t(spark, sf_dir, "events")
    counts = (e.groupBy((F.col("user_id") % 10).alias("cohort"),
                        "event_type")
              .agg(F.count(F.lit(1)).alias("c")))
    tot = counts.groupBy("cohort").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        counts.join(F.broadcast(tot), "cohort")
        .groupBy("cohort")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
             F.count(F.lit(1)).alias("n_types"))
        .orderBy("cohort")
    )


@query(
    "distribution_drift_audit",
    oracle="""
    WITH bucketed AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                  THEN 'ref' ELSE 'cur' END AS era,
             least(9, greatest(0,
               CAST(floor((o_totalprice - 1000) / 20000) AS BIGINT)))
                 AS bucket,
             count(*) AS c
      FROM orders
      GROUP BY era, bucket
    ), pivoted AS (
      SELECT bucket,
             sum(CASE WHEN era = 'ref' THEN c ELSE 0 END) * 1.0 /
               (SELECT sum(c) FROM bucketed WHERE era = 'ref') AS p,
             sum(CASE WHEN era = 'cur' THEN c ELSE 0 END) * 1.0 /
               (SELECT sum(c) FROM bucketed WHERE era = 'cur') AS q
      FROM bucketed GROUP BY bucket
    ), cdf AS (
      SELECT bucket, p, q,
             sum(p) OVER (ORDER BY bucket) AS cp,
             sum(q) OVER (ORDER BY bucket) AS cq
      FROM pivoted
    )
    SELECT round(max(abs(cp - cq)), 6) AS ks_stat,
           round(sum(CASE WHEN p > 0 AND q > 0
                          THEN (p - q) * ln(p / q) ELSE 0 END), 6)
               AS psi,
           count(*) AS n_buckets
    FROM cdf
    """,
)
def distribution_drift_audit(spark, sf_dir):
    """Distribution-drift monitoring between a reference era and the
    current era of the price distribution: bucketed KS statistic
    (max CDF gap) and PSI (population stability index) in one pass
    over a 10-bucket profile — the standard 'did the data shift
    under my model' gate of an ML-ops pipeline.  The fact scan
    reduces immediately to (era × bucket) counts; every later step
    is constant-size."""
    from pyspark.sql import Window as W
    from sidecar_spark.queries.registry import t as _t

    o = _t(spark, sf_dir, "orders")
    era = F.when(F.col("o_orderdate")
                 < F.lit("1996-01-01").cast("timestamp"), "ref")\
        .otherwise("cur")
    bucket = F.least(
        F.lit(9), F.greatest(
            F.lit(0),
            F.floor((F.col("o_totalprice") - 1000) / 20000))).cast("long")
    counts = (o.select(era.alias("era"), bucket.alias("bucket"))
              .groupBy("era", "bucket").agg(F.count(F.lit(1)).alias("c")))
    tot = counts.groupBy().pivot("era", ["ref", "cur"]).sum("c")
    ref_n = tot.collect()[0]
    pivoted = (
        counts.groupBy("bucket")
        .agg((F.sum(F.when(F.col("era") == "ref", F.col("c"))
                    .otherwise(0)) / F.lit(ref_n["ref"])).alias("p"),
             (F.sum(F.when(F.col("era") == "cur", F.col("c"))
                    .otherwise(0)) / F.lit(ref_n["cur"])).alias("q")))
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdf = pivoted.select(
        "bucket", "p", "q",
        F.sum("p").over(w).alias("cp"), F.sum("q").over(w).alias("cq"))
    return cdf.agg(
        F.round(F.max(F.abs(F.col("cp") - F.col("cq"))), 6)
        .alias("ks_stat"),
        F.round(F.sum(F.when((F.col("p") > 0) & (F.col("q") > 0),
                             (F.col("p") - F.col("q"))
                             * F.log(F.col("p") / F.col("q")))
                      .otherwise(0.0)), 6).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"))


@query(
    "haversine_nearest",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             -60.0 + (c_custkey % 1200) * 0.1 AS lat,
             -180.0 + ((c_custkey * 7) % 3600) * 0.1 AS lon
      FROM customer
    ), d AS (
      SELECT c_custkey,
             round(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat - 40.7) / 2), 2)
               + cos(radians(40.7)) * cos(radians(lat))
                 * pow(sin(radians(lon - (-74.0)) / 2), 2))), 3) AS km
      FROM pts
    )
    SELECT c_custkey, km, rk FROM (
      SELECT c_custkey, km,
             row_number() OVER (ORDER BY km, c_custkey) AS rk
      FROM d)
    WHERE rk <= 10
    """,
)
def haversine_nearest(spark, sf_dir):
    """Haversine great-circle distance as pure column math (the trig
    family composed into a real operator): deterministic synthetic
    coordinates per customer, distance to a fixed point, top-10
    nearest.  No UDF, no geo library — at scale this is a map +
    TakeOrderedAndProject; a geo JOIN adds a geohash-prefix equi-join
    for candidate pruning (the LSH-bucket pattern applied to
    space)."""
    from pyspark.sql import Window as W
    from sidecar_spark.queries.registry import t as _t

    c = _t(spark, sf_dir, "customer")
    lat = -60.0 + (F.col("c_custkey") % 1200) * 0.1
    lon = -180.0 + ((F.col("c_custkey") * 7) % 3600) * 0.1
    km = F.round(
        2 * 6371.0 * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(lat - 40.7) / 2), 2)
            + F.cos(F.radians(F.lit(40.7))) * F.cos(F.radians(lat))
            * F.pow(F.sin(F.radians(lon - (-74.0)) / 2), 2))), 3)
    d = c.select("c_custkey", km.alias("km"))
    rk = F.row_number().over(W.orderBy("km", "c_custkey"))
    return d.select("c_custkey", "km", rk.alias("rk")).where(
        F.col("rk") <= 10)


@query(
    "cyclical_time_features",
    oracle="""
    SELECT event_type,
           round(avg(sin(2 * pi() * CAST(strftime(ts, '%H') AS BIGINT)
                         / 24.0)), 6) AS hour_sin,
           round(avg(cos(2 * pi() * CAST(strftime(ts, '%H') AS BIGINT)
                         / 24.0)), 6) AS hour_cos,
           round(avg(sin(2 * pi() * dayofweek(ts) / 7.0)), 6) AS dow_sin
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def cyclical_time_features(spark, sf_dir):
    """Cyclical feature encoding: hour-of-day and day-of-week mapped
    onto the unit circle (sin/cos pairs) so midnight neighbors 23:00
    instead of being 23 units away — the standard temporal feature
    prep for models.  Spark dayofweek is 1-based (Sunday=1) vs
    DuckDB's 0-based, so the encoding normalizes before the 2π scale;
    pure map-side math folded into the aggregate."""
    from sidecar_spark.queries.registry import t as _t
    import math

    e = _t(spark, sf_dir, "events")
    two_pi = 2 * math.pi
    hour_angle = two_pi * F.hour("ts") / 24.0
    dow_angle = two_pi * (F.dayofweek("ts") - 1) / 7.0
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(F.sin(hour_angle)), 6).alias("hour_sin"),
             F.round(F.avg(F.cos(hour_angle)), 6).alias("hour_cos"),
             F.round(F.avg(F.sin(dow_angle)), 6).alias("dow_sin"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Autocorrelation of the per-minute event-count series
# ---------------------------------------------------------------------------

@query(
    "events_autocorrelation",
    oracle="""
    WITH m AS (
      SELECT date_trunc('minute', ts) AS minute, count(*) AS cnt
      FROM events GROUP BY 1),
    lagged AS (
      SELECT cnt,
             lag(cnt, 1) OVER (ORDER BY minute) AS l1,
             lag(cnt, 2) OVER (ORDER BY minute) AS l2,
             lag(cnt, 3) OVER (ORDER BY minute) AS l3
      FROM m)
    SELECT CAST(count(*) AS BIGINT) AS n_minutes,
           round(corr(cnt, l1), 6) AS acf1,
           round(corr(cnt, l2), 6) AS acf2,
           round(corr(cnt, l3), 6) AS acf3
    FROM lagged
    """,
)
def events_autocorrelation(spark, sf_dir):
    """Autocorrelation of the per-minute arrival-count series at lags
    1-3 — the seasonality probe run before choosing a forecast model.
    Two stages: a groupBy on the truncated minute (map-side partials),
    then lag windows over the *aggregated* series — thousands of rows
    regardless of raw volume, so the single-partition window is cheap
    by construction and the raw 100 TB never passes through a global
    sort.  Pearson corr against the lagged copies on both engines."""
    e = t(spark, sf_dir, "events")
    m = (e.groupBy(F.date_trunc("minute", "ts").alias("minute"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    w = W.orderBy("minute")
    lagged = m.select(
        "cnt",
        F.lag("cnt", 1).over(w).alias("l1"),
        F.lag("cnt", 2).over(w).alias("l2"),
        F.lag("cnt", 3).over(w).alias("l3"))
    return lagged.agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.round(F.corr("cnt", "l1"), 6).alias("acf1"),
        F.round(F.corr("cnt", "l2"), 6).alias("acf2"),
        F.round(F.corr("cnt", "l3"), 6).alias("acf3"))


# ---------------------------------------------------------------------------
# Seasonal decomposition: hour-of-day seasonal index + residual variance
# ---------------------------------------------------------------------------

@query(
    "events_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, hour(ts) AS hod,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    seasonal AS (
      SELECT hod, avg(cnt) AS s FROM hourly GROUP BY hod),
    g AS (SELECT avg(cnt) AS gmean FROM hourly),
    dec AS (
      SELECT h.hod, h.cnt, s.s, g.gmean,
             h.cnt - s.s AS resid
      FROM hourly h JOIN seasonal s ON h.hod = s.hod CROSS JOIN g)
    SELECT hod,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(avg(s), 6) AS seasonal_index,
           round(avg(s) / max(gmean), 6) AS seasonal_ratio,
           round(var_pop(resid), 6) AS resid_var
    FROM dec GROUP BY hod ORDER BY hod
    """,
)
def events_seasonal_decompose(spark, sf_dir):
    """Classical seasonal decomposition of the hourly arrival series:
    aggregate to hourly counts (first shuffle — the raw volume never
    reappears), compute the hour-of-day seasonal index (second, 24-row
    aggregate), and the de-seasonalized residual variance per hour
    slot — the decomposition behind capacity planning and anomaly
    thresholds.  Both engines run the identical two-level average, so
    the index, its ratio to the grand mean, and the residual variance
    pin exactly."""
    e = t(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"),
                        F.hour("ts").alias("hod"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    seasonal = hourly.groupBy("hod").agg(F.avg("cnt").alias("s"))
    g = hourly.agg(F.avg("cnt").alias("gmean"))
    dec = (hourly.join(seasonal, "hod").crossJoin(F.broadcast(g))
           .withColumn("resid", F.col("cnt") - F.col("s")))
    return (dec.groupBy("hod")
            .agg(F.count(F.lit(1)).alias("n_hours"),
                 F.round(F.avg("s"), 6).alias("seasonal_index"),
                 F.round(F.avg("s") / F.max("gmean"), 6)
                 .alias("seasonal_ratio"),
                 F.round(F.var_pop("resid"), 6).alias("resid_var"))
            .orderBy("hod"))


# ---------------------------------------------------------------------------
# Benford first-digit audit over order totals
# ---------------------------------------------------------------------------

@query(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT o.digit,
           CAST(o.n AS BIGINT) AS n,
           round(CAST(o.n AS DOUBLE) / t.total, 6) AS observed_p,
           round(log10(1 + CAST(1 AS DOUBLE) / o.digit), 6) AS benford_p,
           round(t.total * pow(CAST(o.n AS DOUBLE) / t.total
                               - log10(1 + CAST(1 AS DOUBLE) / o.digit), 2)
                 / log10(1 + CAST(1 AS DOUBLE) / o.digit), 6) AS chi2_term
    FROM obs o CROSS JOIN tot t
    ORDER BY o.digit
    """,
)
def benford_first_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals — the fraud /
    synthetic-data smell test: observed leading-digit frequencies
    against log10(1+1/d) with the per-digit chi-square contribution.
    One scan + a 9-row aggregate; the digit extraction is a string
    head over the integer part, identical in both engines."""
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    # explicit floor: DuckDB's DOUBLE->BIGINT cast rounds half-even
    # while Spark's truncates — floor() first makes both exact
    d = o.select(F.substring(F.floor(F.col("o_totalprice")).cast("bigint")
                             .cast("string"), 1, 1).cast("bigint")
                 .alias("digit"))
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p = F.col("n") * 1.0 / F.col("total")
    bp = F.log10(1.0 + 1.0 / F.col("digit"))
    return (obs.crossJoin(F.broadcast(tot))
            .select("digit",
                    F.col("n"),
                    F.round(p, 6).alias("observed_p"),
                    F.round(bp, 6).alias("benford_p"),
                    F.round(F.col("total") * F.pow(p - bp, 2) / bp, 6)
                    .alias("chi2_term"))
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# chi-square independence: event_type x value-bucket contingency
# ---------------------------------------------------------------------------

@query(
    "chi_square_independence",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(least(floor(value / 25.0), 3) AS BIGINT) AS vb
      FROM events),
    cell AS (SELECT event_type, vb, count(*) AS o
             FROM v GROUP BY event_type, vb),
    rowm AS (SELECT event_type, sum(o) AS rn FROM cell GROUP BY event_type),
    colm AS (SELECT vb, sum(o) AS cn FROM cell GROUP BY vb),
    tot AS (SELECT sum(o) AS n FROM cell)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) FROM rowm) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM colm) AS BIGINT) AS n_cols,
           CAST(((SELECT count(*) FROM rowm) - 1)
                * ((SELECT count(*) FROM colm) - 1) AS BIGINT) AS dof,
           round(sum(pow(c.o - r.rn * m.cn * 1.0 / t.n, 2)
                     / (r.rn * m.cn * 1.0 / t.n)), 6) AS chi2
    FROM cell c
    JOIN rowm r ON c.event_type = r.event_type
    JOIN colm m ON c.vb = m.vb
    CROSS JOIN tot t
    """,
)
def chi_square_independence(spark, sf_dir):
    """Pearson chi-square independence test between event type and
    the bucketed value — the categorical-drift / feature-dependence
    audit.  Contingency cells, margins and the statistic are all
    aggregates over aggregates: the raw table is touched once, every
    later stage operates on the (types x buckets) grid, and the
    margins broadcast-join back onto the cells."""
    e = t(spark, sf_dir, "events")
    v = e.select("event_type",
                 F.least(F.floor(F.col("value") / 25.0), F.lit(3))
                 .cast("bigint").alias("vb"))
    cell = v.groupBy("event_type", "vb").agg(F.count(F.lit(1)).alias("o"))
    rowm = cell.groupBy("event_type").agg(F.sum("o").alias("rn"))
    colm = cell.groupBy("vb").agg(F.sum("o").alias("cn"))
    tot = cell.agg(F.sum("o").alias("n"))
    nr = rowm.count()
    nc = colm.count()
    exp = F.col("rn") * F.col("cn") * 1.0 / F.col("n")
    return (cell.join(F.broadcast(rowm), "event_type")
            .join(F.broadcast(colm), "vb")
            .crossJoin(F.broadcast(tot))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.lit(nr).cast("bigint").alias("n_rows"),
                 F.lit(nc).cast("bigint").alias("n_cols"),
                 F.lit((nr - 1) * (nc - 1)).cast("bigint").alias("dof"),
                 F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 6)
                 .alias("chi2")))


# ---------------------------------------------------------------------------
# Welch two-sample t statistic between event types
# ---------------------------------------------------------------------------

@query(
    "welch_t_test",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n, avg(value) AS m,
             var_samp(value) AS s2
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type),
    a AS (SELECT * FROM g WHERE event_type = 'click'),
    b AS (SELECT * FROM g WHERE event_type = 'view')
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6)
             AS t_stat,
           round(pow(a.s2 / a.n + b.s2 / b.n, 2)
                 / (pow(a.s2 / a.n, 2) / (a.n - 1)
                    + pow(b.s2 / b.n, 2) / (b.n - 1)), 6) AS welch_dof
    FROM a, b
    """,
)
def welch_t_test(spark, sf_dir):
    """Welch's unequal-variance two-sample t statistic (with the
    Welch-Satterthwaite degrees of freedom) comparing the value
    distribution of two event classes — the A/B-experiment readout.
    Each group reduces to (n, mean, s^2) map-side; the statistic is
    scalar arithmetic on the two 1-row aggregates."""
    e = (t(spark, sf_dir, "events")
         .where(F.col("event_type").isin("click", "view")))
    g = (e.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"),
              F.var_samp("value").alias("s2")))
    a = g.where(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"),
        F.col("s2").alias("s2_a"))
    b = g.where(F.col("event_type") == "view").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"),
        F.col("s2").alias("s2_b"))
    se2 = F.col("s2_a") / F.col("n_a") + F.col("s2_b") / F.col("n_b")
    return (a.crossJoin(b)
            .select("n_a", "n_b",
                    F.round(F.col("m_a") - F.col("m_b"), 6)
                    .alias("mean_diff"),
                    F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 6)
                    .alias("t_stat"),
                    F.round(F.pow(se2, 2)
                            / (F.pow(F.col("s2_a") / F.col("n_a"), 2)
                               / (F.col("n_a") - 1)
                               + F.pow(F.col("s2_b") / F.col("n_b"), 2)
                               / (F.col("n_b") - 1)), 6)
                    .alias("welch_dof")))


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) between two event classes
# ---------------------------------------------------------------------------

@query(
    "mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('click', 'view')),
    r AS (
      SELECT event_type,
             rank() OVER (ORDER BY value) AS rk,
             count(*) OVER (PARTITION BY value) AS ties
      FROM s),
    avg_r AS (
      SELECT event_type, rk + (ties - 1) / 2.0 AS arank FROM r),
    agg AS (
      SELECT event_type, count(*) AS n, sum(arank) AS rsum
      FROM avg_r GROUP BY event_type),
    a AS (SELECT * FROM agg WHERE event_type = 'click'),
    b AS (SELECT * FROM agg WHERE event_type = 'view')
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.rsum, 2) AS ranksum_a,
           round(a.rsum - a.n * (a.n + 1) / 2.0, 2) AS u_a,
           round(a.n * CAST(b.n AS DOUBLE)
                 - (a.rsum - a.n * (a.n + 1) / 2.0), 2) AS u_b,
           round((a.rsum - a.n * (a.n + 1) / 2.0)
                 / (a.n * CAST(b.n AS DOUBLE)), 6) AS auc_estimate
    FROM a, b
    """,
)
def mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test between two event classes — the
    nonparametric A/B readout (its normalized U is exactly the AUC
    of 'does a click outrank a view').  Midranks for ties come from
    rank() plus the tie-count window, both over the global value
    order: ONE sort-shuffle of the two-class subset, then a 2-row
    aggregate; no per-pair work, so 100 TB never sees the quadratic
    comparison the naive AUC runs."""
    s = (t(spark, sf_dir, "events")
         .where(F.col("event_type").isin("click", "view"))
         .select("event_type", "value"))
    w_rank = W.orderBy("value")
    w_ties = W.partitionBy("value")
    r = s.select(
        "event_type",
        (F.rank().over(w_rank)
         + (F.count(F.lit(1)).over(w_ties) - 1) / 2.0).alias("arank"))
    agg = (r.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("arank").alias("rsum")))
    a = agg.where(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("rsum").alias("rsum_a"))
    b = agg.where(F.col("event_type") == "view").select(
        F.col("n").alias("n_b"))
    u_a = F.col("rsum_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    return (a.crossJoin(b)
            .select("n_a", "n_b",
                    F.round(F.col("rsum_a"), 2).alias("ranksum_a"),
                    F.round(u_a, 2).alias("u_a"),
                    F.round(F.col("n_a") * F.col("n_b").cast("double")
                            - u_a, 2).alias("u_b"),
                    F.round(u_a / (F.col("n_a")
                                   * F.col("n_b").cast("double")), 6)
                    .alias("auc_estimate")))


# ---------------------------------------------------------------------------
# Lorenz deciles: revenue concentration across customers
# ---------------------------------------------------------------------------

@query(
    "revenue_decile_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey),
    tiled AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM cust),
    d AS (
      SELECT decile, count(*) AS n_cust, sum(rev) AS rev
      FROM tiled GROUP BY decile),
    tot AS (SELECT sum(rev) AS total FROM d)
    SELECT decile,
           CAST(n_cust AS BIGINT) AS n_cust,
           round(rev, 2) AS decile_rev,
           round(rev / t.total, 6) AS rev_share,
           round(sum(rev) OVER (ORDER BY decile) / t.total, 6)
             AS cum_share
    FROM d CROSS JOIN tot t
    ORDER BY decile
    """,
)
def revenue_decile_concentration(spark, sf_dir):
    """Lorenz-curve revenue concentration: per-customer revenue,
    ntile(10) deciles over the (rev, key) total order, and each
    decile's share plus the cumulative share — the concentration
    readout behind Gini (the battery's pandas-UDAF Gini is the
    same curve integrated).  One aggregate + one sort-shuffle of
    the customer-level rollup (already 1/40th of raw), then 10-row
    arithmetic."""
    o = t(spark, sf_dir, "orders")
    cust = (o.groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("rev")))
    tiled = cust.select(
        "rev", F.ntile(10).over(W.orderBy("rev", "o_custkey"))
        .alias("decile"))
    d = (tiled.groupBy("decile")
         .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("rev").alias("rev")))
    tot = d.agg(F.sum("rev").alias("total"))
    return (d.crossJoin(F.broadcast(tot))
            .select("decile", "n_cust",
                    F.round(F.col("rev"), 2).alias("decile_rev"),
                    F.round(F.col("rev") / F.col("total"), 6)
                    .alias("rev_share"),
                    F.round(F.sum("rev").over(W.orderBy("decile"))
                            / F.col("total"), 6).alias("cum_share"))
            .orderBy("decile"))


@query(
    "winsorize_outliers",
    oracle="""
    WITH bounds AS (
      SELECT quantile_disc(o_totalprice, 0.01) AS lo,
             quantile_disc(o_totalprice, 0.99) AS hi
      FROM orders
    ), clipped AS (
      SELECT o_orderpriority,
             o_totalprice AS x,
             least(greatest(o_totalprice, lo), hi) AS xw
      FROM orders CROSS JOIN bounds
    )
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN x <> xw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped,
           round(avg(x), 2) AS mean_raw,
           round(avg(xw), 2) AS mean_winsorized,
           round(stddev_pop(x), 2) AS sd_raw,
           round(stddev_pop(xw), 2) AS sd_winsorized
    FROM clipped GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def winsorize_outliers(spark, sf_dir):
    """Winsorization — clip a numeric feature at its exact p1/p99 and
    report the moment shift per group, the standard outlier treatment
    before fitting anything scale-sensitive.  The bounds come from
    ONE exact-percentile aggregate (discrete quantile, so both
    engines pick an actual data value — no interpolation drift) and
    enter the clip as a broadcast scalar; the clip itself is pure map
    math.  At 100 TB swap the exact percentile for approx_percentile
    and nothing else changes."""
    o = t(spark, sf_dir, "orders")
    b = o.agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY o_totalprice)")
        .alias("lo"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)")
        .alias("hi")).first()
    lo, hi = float(b["lo"]), float(b["hi"])
    xw = F.least(F.greatest(F.col("o_totalprice"), F.lit(lo)), F.lit(hi))
    return (o.select("o_orderpriority",
                     F.col("o_totalprice").alias("x"), xw.alias("xw"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("x") != F.col("xw"), 1).otherwise(0))
                 .cast("bigint").alias("n_clipped"),
                 F.round(F.avg("x"), 2).alias("mean_raw"),
                 F.round(F.avg("xw"), 2).alias("mean_winsorized"),
                 F.round(F.stddev_pop("x"), 2).alias("sd_raw"),
                 F.round(F.stddev_pop("xw"), 2).alias("sd_winsorized"))
            .orderBy("o_orderpriority"))


# --- CUPED variance reduction ------------------------------------------------


@query(
    "cuped_variance_reduction",
    oracle="""
    WITH horizon AS (
      SELECT (floor(epoch(min(ts)))::BIGINT
              + floor(epoch(max(ts)))::BIGINT) // 2 AS cut FROM events),
    per_user AS (
      SELECT user_id, user_id % 2 AS treated,
             sum(CASE WHEN floor(epoch(ts))::BIGINT < cut
                      THEN value ELSE 0 END) AS pre,
             sum(CASE WHEN floor(epoch(ts))::BIGINT >= cut
                      THEN value ELSE 0 END) AS post
      FROM events CROSS JOIN horizon GROUP BY user_id
    ), theta AS (
      SELECT covar_samp(pre, post) / var_samp(pre) AS th,
             avg(pre) AS pre_mean
      FROM per_user
    ), adj AS (
      SELECT treated, post, post - th * (pre - pre_mean) AS cuped
      FROM per_user CROSS JOIN theta)
    SELECT round((SELECT th FROM theta), 6) AS theta,
           round(avg(post) FILTER (WHERE treated = 1)
                 - avg(post) FILTER (WHERE treated = 0), 5) AS raw_diff,
           round(avg(cuped) FILTER (WHERE treated = 1)
                 - avg(cuped) FILTER (WHERE treated = 0), 5) AS cuped_diff,
           round(1 - var_samp(cuped) / var_samp(post), 6)
             AS var_reduction
    FROM adj
    """,
)
def cuped_variance_reduction(spark, sf_dir):
    """CUPED (Deng et al. 2013) — the industry-standard experiment
    variance-reduction: regress each user's post-period metric on
    their PRE-period metric (theta = cov/var), subtract the
    predictable part, and compare the treatment/control difference
    on the adjusted metric.  Treatment is user_id parity; the
    pre/post cut is the window midpoint.

    100 TB plan: one groupBy(user) collapses the event stream to a
    (pre, post) pair per user; theta is a ONE-ROW aggregate of the
    user table broadcast back; everything after runs on users, not
    events."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(((F.unix_timestamp(F.min("ts"))
                   + F.unix_timestamp(F.max("ts"))) / 2)
                 .cast("bigint").alias("cut")).first()["cut"]
    sec = F.unix_timestamp("ts")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("treated"),
        F.sum(F.when(sec < cut, F.col("value"))
              .otherwise(0.0)).alias("pre"),
        F.sum(F.when(sec >= cut, F.col("value"))
              .otherwise(0.0)).alias("post"))
    th = per_user.agg(
        (F.covar_samp("pre", "post") / F.var_samp("pre")).alias("th"),
        F.avg("pre").alias("pre_mean"))
    adj = per_user.join(F.broadcast(th)).select(
        "treated", "post",
        (F.col("post") - F.col("th") * (F.col("pre") - F.col("pre_mean")))
        .alias("cuped"), "th")
    t1, t0 = F.col("treated") == 1, F.col("treated") == 0
    return adj.agg(
        F.round(F.first("th"), 6).alias("theta"),
        F.round(F.avg(F.when(t1, F.col("post")))
                - F.avg(F.when(t0, F.col("post"))), 5).alias("raw_diff"),
        F.round(F.avg(F.when(t1, F.col("cuped")))
                - F.avg(F.when(t0, F.col("cuped"))), 5).alias("cuped_diff"),
        F.round(1 - F.var_samp("cuped") / F.var_samp("post"), 6)
        .alias("var_reduction"))


# --- difference-in-differences -----------------------------------------------


@query(
    "difference_in_differences",
    oracle="""
    WITH horizon AS (
      SELECT (floor(epoch(min(ts)))::BIGINT
              + floor(epoch(max(ts)))::BIGINT) // 2 AS cut FROM events),
    cells AS (
      SELECT user_id % 2 AS treated,
             CASE WHEN floor(epoch(ts))::BIGINT >= cut
                  THEN 1 ELSE 0 END AS post,
             value
      FROM events CROSS JOIN horizon)
    SELECT count(*) AS n_events,
           round(avg(value) FILTER (WHERE treated = 1 AND post = 1), 5)
             AS t_post,
           round(avg(value) FILTER (WHERE treated = 1 AND post = 0), 5)
             AS t_pre,
           round(avg(value) FILTER (WHERE treated = 0 AND post = 1), 5)
             AS c_post,
           round(avg(value) FILTER (WHERE treated = 0 AND post = 0), 5)
             AS c_pre,
           round((avg(value) FILTER (WHERE treated = 1 AND post = 1)
                  - avg(value) FILTER (WHERE treated = 1 AND post = 0))
                 - (avg(value) FILTER (WHERE treated = 0 AND post = 1)
                    - avg(value) FILTER (WHERE treated = 0 AND post = 0)),
                 5) AS did
    FROM cells
    """,
)
def difference_in_differences(spark, sf_dir):
    """Difference-in-differences: the 2x2 (treated x pre/post) panel
    estimate (T_post - T_pre) - (C_post - C_pre) — the workhorse
    causal readout when treatment wasn't randomized.  Treatment is
    user parity, the period cut is the window midpoint.

    ONE aggregate pass with conditional averages — all four cells
    come out of the same map-side-combined scan."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(((F.unix_timestamp(F.min("ts"))
                   + F.unix_timestamp(F.max("ts"))) / 2)
                 .cast("bigint").alias("cut")).first()["cut"]
    cells = ev.select(
        (F.col("user_id") % 2).alias("treated"),
        F.when(F.unix_timestamp("ts") >= cut, 1).otherwise(0)
        .alias("post"),
        "value")

    def cell(tr, po):
        return F.avg(F.when((F.col("treated") == tr)
                            & (F.col("post") == po), F.col("value")))

    return cells.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(cell(1, 1), 5).alias("t_post"),
        F.round(cell(1, 0), 5).alias("t_pre"),
        F.round(cell(0, 1), 5).alias("c_post"),
        F.round(cell(0, 0), 5).alias("c_pre"),
        F.round((cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)), 5)
        .alias("did"))


# --- Holt linear-trend forecast ----------------------------------------------


@query(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT row_number() OVER (ORDER BY d) AS i, cnt FROM (
        SELECT date_trunc('day', ts) AS d, count(*)::DOUBLE AS cnt
        FROM events GROUP BY 1)
    ), n AS (SELECT max(i) AS mx FROM daily),
    holt AS (
      SELECT 1 AS i,
             (SELECT cnt FROM daily WHERE i = 1) AS l,
             (SELECT cnt FROM daily WHERE i = 2)
               - (SELECT cnt FROM daily WHERE i = 1) AS b
      UNION ALL
      SELECT h.i + 1,
             0.5 * d.cnt + 0.5 * (h.l + h.b),
             0.3 * ((0.5 * d.cnt + 0.5 * (h.l + h.b)) - h.l)
               + 0.7 * h.b
      FROM holt h JOIN daily d ON d.i = h.i + 1
      WHERE h.i < (SELECT mx FROM n)
    ), fit AS (
      SELECT l, b FROM holt WHERE i = (SELECT mx FROM n))
    SELECT h.h AS horizon,
           round(l + h.h * b, 6) AS yhat,
           round(l, 6) AS level, round(b, 6) AS trend
    FROM fit CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) h
    ORDER BY horizon
    """,
)
def holt_linear_forecast(spark, sf_dir):
    """Holt double-exponential smoothing (alpha=0.5, beta=0.3) of the
    daily event-arrival series, forecasting 3 days ahead — the
    level+trend capacity forecast one step up from the windowed EWMA
    (`events_ewma`).

    The recursion is inherently sequential, but only over the DAILY
    axis: the cluster-side work is one groupBy(day) that collapses
    the raw stream to ~30 rows; the smoothing loop then runs on the
    collected day vector (bounded, driver-size — the same contract
    as the dense time axis elsewhere in this module).  The oracle
    replays the identical recursion as a recursive CTE."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
             .orderBy("d").collect())
    y = [r["cnt"] for r in daily]
    lev, tr = y[0], y[1] - y[0]
    for v in y[1:]:
        new_l = 0.5 * v + 0.5 * (lev + tr)
        tr = 0.3 * (new_l - lev) + 0.7 * tr
        lev = new_l
    rows = [(h, round(lev + h * tr, 6), round(lev, 6), round(tr, 6))
            for h in (1, 2, 3)]
    return spark.createDataFrame(
        rows, "horizon int, yhat double, level double, trend double"
    ).orderBy("horizon")


# --- 1-D Wasserstein distance ------------------------------------------------


@query(
    "wasserstein_distance_1d",
    oracle="""
    WITH a AS (SELECT value FROM events WHERE event_type = 'click'),
    b AS (SELECT value FROM events WHERE event_type = 'view'),
    na AS (SELECT count(*) AS n FROM a),
    nb AS (SELECT count(*) AS n FROM b),
    merged AS (
      SELECT value, sum(ca) AS ca, sum(cb) AS cb FROM (
        SELECT value, count(*) AS ca, 0 AS cb FROM a GROUP BY value
        UNION ALL
        SELECT value, 0, count(*) FROM b GROUP BY value)
      GROUP BY value
    ), cdf AS (
      SELECT value,
             sum(ca) OVER (ORDER BY value) * 1.0 / (SELECT n FROM na)
               AS fa,
             sum(cb) OVER (ORDER BY value) * 1.0 / (SELECT n FROM nb)
               AS fb,
             lead(value) OVER (ORDER BY value) AS nxt
      FROM merged)
    SELECT (SELECT n FROM na) AS n_a, (SELECT n FROM nb) AS n_b,
           round(sum(abs(fa - fb) * (nxt - value)), 6) AS w1,
           round(max(abs(fa - fb)), 6) AS ks
    FROM cdf WHERE nxt IS NOT NULL
    """,
)
def wasserstein_distance_1d(spark, sf_dir):
    """Exact 1-D Wasserstein (earth-mover) distance between the
    click and view value distributions — the integral of |CDF_a -
    CDF_b| over the merged support, the distribution-shift metric
    that (unlike KS, also reported) weighs HOW FAR mass moved, not
    just the largest gap.  The standard drift gate between a
    training snapshot and fresh data.

    100 TB plan: one groupBy(value) collapses both sides to the
    distinct-value support; the CDFs and the trapezoid sum are one
    ordered window over that support (bounded by value cardinality,
    not row count); totals are 1-row broadcasts."""
    ev = t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("value")
    b = ev.where(F.col("event_type") == "view").select("value")
    n_a, n_b = a.count(), b.count()
    merged = (a.groupBy("value").agg(F.count(F.lit(1)).alias("ca"),
                                     F.lit(0).alias("cb"))
              .unionByName(
                  b.groupBy("value").agg(F.lit(0).alias("ca"),
                                         F.count(F.lit(1)).alias("cb")))
              .groupBy("value").agg(F.sum("ca").alias("ca"),
                                    F.sum("cb").alias("cb")))
    wc = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    cdf = merged.select(
        "value",
        (F.sum("ca").over(wc) * 1.0 / n_a).alias("fa"),
        (F.sum("cb").over(wc) * 1.0 / n_b).alias("fb"),
        F.lead("value").over(W.orderBy("value")).alias("nxt"))
    gap = F.abs(F.col("fa") - F.col("fb"))
    return (cdf.where(F.col("nxt").isNotNull())
            .agg(F.lit(n_a).cast("bigint").alias("n_a"),
                 F.lit(n_b).cast("bigint").alias("n_b"),
                 F.round(F.sum(gap * (F.col("nxt") - F.col("value"))), 6)
                 .alias("w1"),
                 F.round(F.max(gap), 6).alias("ks")))
