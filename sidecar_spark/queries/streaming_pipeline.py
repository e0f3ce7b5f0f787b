"""Streaming query battery: each entry executes a Structured Streaming
plan over the events table as a bounded backlog (availableNow trigger,
memory sink) and returns the final result — the same incremental
execution (state store, watermarks, append semantics) a live stream
uses, made deterministic so DuckDB batch SQL can oracle it.

Append-mode oracles encode the watermark contract explicitly: only
windows whose end ≤ (max event time − delay) are finalized and
emitted. That the SQL below reproduces Spark's output IS the test of
the watermark semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sidecar_spark.queries.registry import query
from sidecar_spark.streaming import (
    events_stream,
    run_to_memory_sink,
    sessionized_stream,
    stateful_user_stats,
    stream_distinct_keys,
    windowed_counts,
)

# final watermark for a 10-minute delay over the whole backlog
_WM = "(SELECT max(ts) - INTERVAL 10 MINUTE FROM events)"


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour windows, complete output: every window of the
    backlog (complete mode keeps all window state)."""
    s = windowed_counts(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_tumbling_window", "complete")


@query(
    "stream_window_watermark",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= {_WM}
    """,
)
def stream_window_watermark(spark, sf_dir):
    """Tumbling windows in APPEND mode with a 10-minute watermark: only
    finalized windows (window end ≤ final watermark) are emitted — the
    oracle's HAVING clause states exactly that contract."""
    s = windowed_counts(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_window_watermark", "append")


@query(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup(spark, sf_dir):
    """Streaming deduplication on (user_id, event_type) — watermarked
    dropDuplicates; the emitted key set equals batch DISTINCT."""
    s = stream_distinct_keys(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_dedup", "append")


@query(
    "stream_session_window",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    HAVING max(ts) + INTERVAL 30 MINUTE <= {_WM}
    """,
)
def stream_session_window(spark, sf_dir):
    """Native session_window sessionization (30-minute gap) in append
    mode: sessions whose close (last event + gap) precedes the final
    watermark. The oracle rebuilds the same sessions with batch window
    functions and applies the same finalization predicate."""
    s = sessionized_stream(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_session_window", "append")


@query(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals. Over a single-batch backlog the final emission per
    user equals the batch aggregate — which is what the oracle checks.
    (Multi-batch live streams emit one update per batch; the memory
    sink would then hold the update log.)"""
    s = stateful_user_stats(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_stateful_user_stats", "append")


@query(
    "stream_static_join",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY date_trunc('hour', ts), c_mktsegment
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= {_WM}
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static enrichment: streaming events broadcast-joined to
    the static customer dimension, then watermarked tumbling windows
    per market segment in append mode — the oracle is the equivalent
    batch join+window with the same finalization predicate."""
    from sidecar_spark.queries.registry import t as _t
    from sidecar_spark.streaming import enriched_windowed_value

    dim = _t(spark, sf_dir, "customer")
    s = enriched_windowed_value(events_stream(spark, sf_dir), dim)
    return run_to_memory_sink(s, "stream_static_join", "append")


@query(
    "stream_stream_interval_join",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    """,
)
def stream_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (purchases × preceding clicks per
    user, both sides watermarked, event-time-bounded state). The inner
    join emits exactly the batch interval-join result — the oracle is
    that batch join."""
    from sidecar_spark.streaming import interval_joined_streams

    s = interval_joined_streams(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_stream_interval_join", "append")


@query(
    "stream_stream_left_join",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), wm AS (
      -- Spark's global watermark under the default 'min' multiple-
      -- watermark policy: min over BOTH stream sides' max event time
      -- (each tracked in ms precision), minus the 30-minute delay
      SELECT make_timestamp((epoch_ms(least(
               (SELECT max(p_ts) FROM purchases),
               (SELECT max(c_ts) FROM clicks))) - 30 * 60 * 1000) * 1000)
             AS w)
    SELECT p.user_id, p.purchase_id, c.click_id
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE AND c.c_ts <= p.p_ts
    UNION ALL
    SELECT p.user_id, p.purchase_id, NULL AS click_id
    FROM purchases p CROSS JOIN wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM clicks c
                      WHERE c.user_id = p.user_id
                        AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
                        AND c.c_ts <= p.p_ts)
    """,
)
def stream_stream_left_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join — the append-mode
    null-emission contract: matches emit immediately; null-padded
    purchases emit only once the global watermark passes their
    timestamp, so unmatched purchases in the final watermark window
    are withheld. Under the default 'min' multiple-watermark policy
    the global watermark is min(max p_ts, max c_ts) − delay, with max
    event time tracked in MILLISECOND precision — the oracle's wm CTE
    reproduces that exactly (verified against the query's per-batch
    progress: final wm = ms_floor(max purchase ts) − 30 min)."""
    from sidecar_spark.streaming import left_joined_streams

    s = left_joined_streams(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_stream_left_join", "append")


@query(
    "stream_foreach_batch_sink",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= {_WM}
    """,
)
def stream_foreach_batch_sink(spark, sf_dir):
    """foreachBatch parquet sink with idempotent per-batchId overwrite —
    the exactly-once custom-sink pattern (streaming/ops.py::
    run_foreach_batch_parquet). Same watermarked append-mode windows
    as stream_window_watermark, but delivered through the production
    sink path: checkpointed batch ids + idempotent writes means a
    replayed micro-batch overwrites itself instead of duplicating.
    The oracle is identical to the memory-sink variant — THAT is the
    point: sink choice must not change the emitted result set."""
    import shutil
    import tempfile as _tf

    from sidecar_spark.streaming import (events_stream,
                                         run_foreach_batch_parquet,
                                         windowed_counts)
    from sidecar_spark.streaming.ops import scratch_dir

    out = scratch_dir("sidecar-fbsink-")
    try:
        s = windowed_counts(events_stream(spark, sf_dir))
        result = run_foreach_batch_parquet(s, "stream_foreach_batch_sink", out)
        return result.select(
            "window_start", "event_type", "n_events", "sum_value"
        ).localCheckpoint(eager=True)  # detach from the tmp dir before cleanup
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "stream_update_mode",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_update_mode(spark, sf_dir):
    """UPDATE output mode — the third output contract next to
    complete and append: each micro-batch emits only the groups it
    touched. Over the single-batch availableNow backlog every group
    is touched exactly once, so the emitted set equals the full
    aggregate with NO watermark cutoff (unlike append, which
    withholds unfinalized windows) — precisely the distinction the
    oracle pair (this vs stream_window_watermark) pins down."""
    from sidecar_spark.streaming import events_stream, run_to_memory_sink, windowed_counts

    s = windowed_counts(events_stream(spark, sf_dir))
    return run_to_memory_sink(s, "stream_update_mode", "update")


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark (Spark 3.5+): dedup state is
    evicted once a key's FIRST-SEEN time falls behind the watermark —
    bounded state for at-least-once upstreams that may redeliver
    within a delay budget, vs plain dropDuplicates whose exact-forever
    guarantee needs unbounded state (or drops late keys entirely
    when watermarked). Over the bounded backlog both emit the same
    key SET (the oracle), but only the WithinWatermark variant is
    deployable against 100 TB/day redelivery streams."""
    from sidecar_spark.streaming import events_stream, run_to_memory_sink

    e = events_stream(spark, sf_dir)
    s = (e.withWatermark("ts", "10 minutes")
         .dropDuplicatesWithinWatermark(["user_id", "event_type"])
         .select("user_id", "event_type"))
    return run_to_memory_sink(s, "stream_dedup_within_watermark", "append")


@query(
    "stream_chained_join_window",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id AS c_user, ts AS c_ts FROM events
      WHERE event_type = 'click'
    ), wm AS (
      -- global watermark: ms-floored min of both sides' max event
      -- time, minus the 30-minute delay (same contract as
      -- stream_stream_left_join)
      SELECT make_timestamp((epoch_ms(least(
               (SELECT max(ts) FROM purchases),
               (SELECT max(c_ts) FROM clicks))) - 30 * 60 * 1000) * 1000)
             AS w
    ), j AS (
      SELECT p.ts, p.value
      FROM purchases p JOIN clicks c
        ON p.user_id = c.c_user
       AND c.c_ts >= p.ts - INTERVAL 10 MINUTE AND c.c_ts <= p.ts
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           count(*) AS n_pairs, round(sum(value), 2) AS sum_value
    FROM j
    GROUP BY date_trunc('hour', ts)
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    """,
)
def stream_chained_join_window(spark, sf_dir):
    """TWO chained stateful operators in one streaming query (Spark
    3.4+): stream-stream interval join feeding a tumbling-window
    aggregation — one checkpoint, no intermediate sink (pre-3.4 this
    took two queries and a storage hop). Executed as two availableNow
    passes over one checkpoint (streaming/ops.py::
    run_append_two_pass): the second pass's no-data micro-batch
    flushes windows finalized by the first pass's watermark — which a
    live stream's continuous micro-batches do implicitly. Emission
    cutoff = global watermark minus the join's event-time slack on
    the aggregated column (watermark propagation); THIS join
    constrains purchase ts ≥ click ts, so the slack is zero and the
    cutoff is the global watermark itself — the oracle's HAVING
    encodes that, and tests/test_spark_ops.py pins the nonzero-slack
    case with a synthetic stream."""
    from sidecar_spark.streaming import (chained_join_windowed,
                                         events_stream,
                                         run_append_two_pass)

    return run_append_two_pass(
        spark,
        lambda: chained_join_windowed(events_stream(spark, sf_dir)),
        "stream_chained_join_window")


@query(
    "stream_rocksdb_state",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= {_WM}
    """,
)
def stream_rocksdb_state(spark, sf_dir):
    """The stream_window_watermark plan on the RocksDB state store
    provider (with changelog checkpointing): state lives off-heap in
    RocksDB instances per partition instead of the default in-memory
    HDFS-backed map — the production choice once keyed state outgrows
    executor heap (100 TB/day streams hold GBs–TBs of window state).
    Identical oracle to the default-provider entry IS the test:
    provider choice must never change emitted results, only the
    state-capacity envelope."""
    from sidecar_spark.streaming import (events_stream, run_to_memory_sink,
                                         windowed_counts)

    prov = "spark.sql.streaming.stateStore.providerClass"
    chg = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prov,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    spark.conf.set(chg, "true")
    try:
        s = windowed_counts(events_stream(spark, sf_dir))
        return run_to_memory_sink(s, "stream_rocksdb_state", "append")
    finally:
        spark.conf.unset(prov)
        spark.conf.unset(chg)


@query(
    "stream_multi_watermark_max_policy",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), wm AS (
      -- 'max' multiple-watermark policy: the LATER of the two sides'
      -- ms-floored max event times, minus the 30-minute delay
      SELECT make_timestamp((epoch_ms(greatest(
               (SELECT max(p_ts) FROM purchases),
               (SELECT max(c_ts) FROM clicks))) - 30 * 60 * 1000) * 1000)
             AS w)
    SELECT p.user_id, p.purchase_id, c.click_id
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE AND c.c_ts <= p.p_ts
    UNION ALL
    SELECT p.user_id, p.purchase_id, NULL AS click_id
    FROM purchases p CROSS JOIN wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM clicks c
                      WHERE c.user_id = p.user_id
                        AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
                        AND c.c_ts <= p.p_ts)
    """,
)
def stream_multi_watermark_max_policy(spark, sf_dir):
    """The stream-stream LEFT OUTER join under
    ``multipleWatermarkPolicy=max``: with several watermarked inputs
    the global watermark takes the FASTEST side (max) instead of the
    default slowest (min) — trading possible late-row drops on the
    laggard side for earlier state eviction and earlier null
    emission.  The oracle is the min-policy oracle with
    least→greatest swapped; the emitted-row DIFFERENCE between this
    entry and stream_stream_left_join is exactly the policy
    semantics, pinned by both hashes."""
    from sidecar_spark.streaming import left_joined_streams, run_to_memory_sink

    pol = "spark.sql.streaming.multipleWatermarkPolicy"
    prev = spark.conf.get(pol, "min")
    spark.conf.set(pol, "max")
    try:
        s = left_joined_streams(events_stream(spark, sf_dir))
        return run_to_memory_sink(
            s, "stream_multi_watermark_max_policy", "append")
    finally:
        spark.conf.set(pol, prev)


@query(
    "stream_complete_topk",
    oracle="""
    SELECT event_type, user_bucket, n_events FROM (
      SELECT event_type, user_id % 20 AS user_bucket,
             count(*) AS n_events,
             row_number() OVER (ORDER BY count(*) DESC,
                                event_type, user_id % 20) AS rk
      FROM events
      GROUP BY event_type, user_id % 20)
    WHERE rk <= 10
    ORDER BY n_events DESC, event_type, user_bucket
    """,
)
def stream_complete_topk(spark, sf_dir):
    """Global ORDER BY + LIMIT on a streaming aggregate — legal ONLY
    in complete output mode (append/update cannot sort an unbounded
    result; Spark rejects it at analysis).  Complete mode re-emits
    the full sorted top-10 every batch, which is exactly why it only
    scales for small aggregate states like this leaderboard — the
    docstring contract the entry pins next to the append-mode
    entries."""
    from sidecar_spark.streaming import events_stream, run_to_memory_sink

    e = events_stream(spark, sf_dir)
    agg = (e.groupBy("event_type",
                     (F.col("user_id") % 20).alias("user_bucket"))
           .agg(F.count(F.lit(1)).alias("n_events"))
           .orderBy(F.desc("n_events"), "event_type", "user_bucket")
           .limit(10))
    return run_to_memory_sink(agg, "stream_complete_topk", "complete")


@query(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_transform_with_state(spark, sf_dir):
    """Arbitrary stateful processing via the Spark 4 StatefulProcessor
    API (``transformWithStateInPandas``): per-user state composed of a
    ValueState (running count + value sum) and a MapState (the set of
    event types seen), updated per Arrow batch — the successor surface
    to applyInPandasWithState, with typed composable state cells on
    the RocksDB provider (required by the API), off-heap at 100 TB
    state scale. Emissions are cumulative per batch; the final answer
    per user takes the lexicographic max over (n_events, ...) — counts
    strictly increase, so the last emission wins regardless of how the
    availableNow backlog was split into micro-batches.

    Environment seam (same policy as the multimodal decoders,
    functions/multimodal.py:1-12): the TWS state-server protocol
    requires ``google.protobuf``, absent from this container — when
    protobuf is importable the StatefulProcessor path runs; otherwise
    the SAME per-user state machine runs on applyInPandasWithState
    (ValueState → state tuple, MapState → accumulated distinct-type
    array). Either path must satisfy the one oracle."""
    from sidecar_spark.streaming.ops import transform_with_state_user_acc

    emitted = transform_with_state_user_acc(
        spark, events_stream(spark, sf_dir), "stream_transform_with_state")
    last = F.max(F.struct("n_events", "n_types", "total_value")).alias("s")
    return (emitted.groupBy("user_id").agg(last)
            .select("user_id", F.col("s.n_events").alias("n_events"),
                    F.col("s.n_types").alias("n_types"),
                    F.round("s.total_value", 4).alias("total_value")))


@query(
    "stream_stream_full_outer_join",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), wm AS (
      SELECT make_timestamp((epoch_ms(least(
               (SELECT max(p_ts) FROM purchases),
               (SELECT max(c_ts) FROM clicks))) - 30 * 60 * 1000) * 1000)
             AS w)
    SELECT p.user_id, p.purchase_id, c.click_id
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE AND c.c_ts <= p.p_ts
    UNION ALL
    SELECT p.user_id, p.purchase_id, NULL AS click_id
    FROM purchases p CROSS JOIN wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM clicks c
                      WHERE c.user_id = p.user_id
                        AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
                        AND c.c_ts <= p.p_ts)
    UNION ALL
    SELECT c.user_id, NULL AS purchase_id, c.click_id
    FROM clicks c CROSS JOIN wm
    WHERE c.c_ts + INTERVAL 10 MINUTE < wm.w
      AND NOT EXISTS (SELECT 1 FROM purchases p
                      WHERE p.user_id = c.user_id
                        AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
                        AND c.c_ts <= p.p_ts)
    """,
)
def stream_stream_full_outer_join(spark, sf_dir):
    """Stream-stream FULL OUTER interval join — the completion of the
    join matrix (inner / left / full): matches emit immediately; a
    null-padded PURCHASE emits once the watermark passes its ts (no
    older click can match), and a null-padded CLICK emits once the
    watermark passes ts + lookback (no purchase in [c_ts, c_ts+10min]
    can still arrive) — the two eviction cutoffs are asymmetric
    because the interval condition is, and the oracle's two UNION
    branches encode each one explicitly."""
    from sidecar_spark.streaming import events_stream, run_to_memory_sink

    e = events_stream(spark, sf_dir)
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts")).withWatermark("p_ts", "30 minutes")
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts")).withWatermark("c_ts", "30 minutes")
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "full_outer",
    ).select(F.coalesce("user_id", "c_user").alias("user_id"),
             "purchase_id", "click_id")
    return run_to_memory_sink(j, "stream_stream_full_outer_join", "append")


@query(
    "stream_cdc_apply",
    oracle="""
    WITH changes AS (
      SELECT user_id % 500 AS k, event_id, ts, round(value, 2) AS value,
             CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
      FROM events
    ), latest AS (
      SELECT k, op, value,
             row_number() OVER (PARTITION BY k
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes)
    SELECT k, value FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY k
    """,
)
def stream_cdc_apply(spark, sf_dir):
    """CDC apply — the Debezium-shaped pattern: a keyed change stream
    (upserts + deletes, ordered by (ts, event_id)) applied through
    foreachBatch into a materialized state table with last-writer-wins
    semantics; deletes remove the key.  Each micro-batch does a
    read-merge-overwrite of the state parquet — deterministic and
    replay-idempotent, which is the exactly-once recipe for a MERGE
    target.  The oracle computes the same final state declaratively
    (latest row per key where op != 'D').  At scale the state table is
    a partitioned MERGE target (Delta/Iceberg); the per-batch merge
    below is the same logical plan."""
    import shutil

    from sidecar_spark.streaming import events_stream
    from sidecar_spark.streaming.ops import await_bounded, scratch_dir

    work = scratch_dir("sidecar-cdc-")
    state_dir, ckpt = f"{work}/state", f"{work}/ckpt"
    changes = events_stream(spark, sf_dir).select(
        (F.col("user_id") % 500).alias("k"), "event_id", "ts",
        F.round("value", 2).alias("value"),
        F.when(F.col("event_id") % 10 == 0, "D").otherwise("U").alias("op"))

    def apply_batch(batch_df, batch_id):
        b = batch_df.sparkSession
        try:
            cur = b.read.parquet(state_dir)
        except Exception:  # first batch: empty state
            cur = batch_df.sparkSession.createDataFrame(
                [], "k bigint, event_id bigint, ts timestamp, "
                    "value double, op string")
        from pyspark.sql.window import Window
        merged = cur.unionByName(batch_df)
        w = Window.partitionBy("k").orderBy(F.desc("ts"),
                                            F.desc("event_id"))
        latest = (merged.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1).drop("rn"))
        # overwrite via staging dir: the source is the dir being replaced
        tmp = state_dir + ".next"
        latest.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(tmp, state_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (changes.writeStream.foreachBatch(apply_batch)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        await_bounded(q)
        out = (spark.read.parquet(state_dir)
               .where(F.col("op") != "D")
               .select("k", "value").orderBy("k"))
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_timeout_sessionize",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM gaps
    ), agg AS (
      SELECT user_id, session_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             count(*) AS n_events,
             round(sum(value), 2) AS session_value,
             max(ts) AS last_ts,
             max(session_id) OVER (PARTITION BY user_id) AS last_session
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, n_events, session_value
    FROM agg
    WHERE session_id < last_session        -- closed by a newer event
       OR last_ts + INTERVAL 30 MINUTE < {_WM}  -- flushed by the timer
    """,
)
def stream_timeout_sessionize(spark, sf_dir):
    """Custom sessionization on the state-store TIMER path
    (applyInPandasWithState + EventTimeTimeout): a session emits when
    a newer event from the same user closes it by exceeding the
    30-minute gap, or when the event-time timer parked at
    last_event + gap fires as the watermark passes it (the no-data
    micro-batch).  This differs from the native session_window entry
    (stream_session_window) precisely in the emission trigger — timer
    vs watermark-held window — and the oracle's two-branch WHERE
    encodes that contract.  State per user is one open session tuple;
    timers bound its lifetime, so state size tracks active users, not
    stream length."""
    from sidecar_spark.streaming import events_stream, run_to_memory_sink
    from sidecar_spark.streaming.ops import timeout_sessionized

    s = timeout_sessionized(events_stream(spark, sf_dir))
    # Python-heavy stateful op: width = parallel Python workers, and
    # the timer batch invokes the function once per parked user —
    # size the stateful shuffle to the dispatch cost, not the floor
    return run_to_memory_sink(s, "stream_timeout_sessionize", "append",
                              state_partitions=16)


@query(
    "stream_curation_gate",
    oracle="""
    SELECT lang,
           count(DISTINCT md5(trim(regexp_replace(lower(text),
                                                  '\\s+', ' ', 'g'))))
             AS n_unique_docs
    FROM documents
    WHERE length(text) >= 100
      AND length(regexp_replace(text, '[^0-9]', '', 'g'))
            <= 0.2 * length(text)
    GROUP BY lang ORDER BY lang
    """,
)
def stream_curation_gate(spark, sf_dir):
    """STREAMING ingest curation — the quality-gate + exact-dedup
    funnel run as documents arrive rather than in a batch sweep:
    quality predicates filter the stream, ``dropDuplicates`` on
    (lang, content-hash) keeps first-seen documents only, and a
    running per-language unique-document count is maintained in
    complete mode.  Keying the dedup by (lang, hash) makes the emitted
    counts deterministic (which physical duplicate survives is
    timing-dependent; the key set is not).  A live deployment bounds
    the dedup state with dropDuplicatesWithinWatermark on ingest
    time; the bounded backlog here exercises the identical state-store
    machinery."""
    from sidecar_spark.streaming import run_to_memory_sink, table_stream

    s = table_stream(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    gated = (
        s.where((F.length("text") >= 100)
                & (digits <= 0.2 * F.length("text")))
        .select("lang", F.md5(norm).alias("h"))
        .dropDuplicates(["lang", "h"])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_unique_docs")))
    return (run_to_memory_sink(gated, "stream_curation_gate", "complete")
            .orderBy("lang"))


from sidecar_spark.functions import dedup as D
from sidecar_spark.functions.common import spread
from sidecar_spark.queries import dedup_pipeline as _DP


@query(
    "stream_near_dup_flag",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_DP._SHINGLES} AS sh,
             doc_id % 10 < 8 AS is_existing
      FROM documents
    ), hashed AS (
      SELECT doc_id, is_existing, {_DP._HS} AS hs FROM base
    ), sigs AS (
      SELECT doc_id, is_existing, {_DP._sig16_sql()} AS sig FROM hashed
    ), banded AS (
      SELECT doc_id, is_existing, b AS band_idx,
             md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
      FROM sigs CROSS JOIN generate_series(0, 3) AS g(b)
    ), flagged AS (
      SELECT DISTINCT n.doc_id
      FROM banded n JOIN banded e
        ON n.band_idx = e.band_idx AND n.band_hash = e.band_hash
      WHERE NOT n.is_existing AND e.is_existing
    )
    SELECT (SELECT count(*) FROM base WHERE NOT is_existing)
             AS n_incoming,
           (SELECT count(*) FROM flagged) AS n_flagged,
           (SELECT count(*) FROM base WHERE NOT is_existing)
             - (SELECT count(*) FROM flagged) AS n_novel
    """,
)
def stream_near_dup_flag(spark, sf_dir):
    """Streaming NEAR-dup screening against a static corpus — the
    online half of ``incremental_dedup_batch``: incoming documents
    (20% by id) stream through MinHash banding; a stream-static
    broadcast join against the existing corpus's persisted band table
    flags every arrival sharing ≥1 LSH band (candidate near-dups —
    the exact-Jaccard verify belongs to the batch pass, as in any
    two-tier online/offline dedup).  dropDuplicates collapses
    multi-band matches per doc before the complete-mode count, the
    same state machinery as every streaming dedup here."""
    from sidecar_spark.queries.registry import t as _t
    from sidecar_spark.streaming import run_to_memory_sink, table_stream

    d = _t(spark, sf_dir, "documents")

    def bands(df):
        return df.selectExpr(
            "doc_id",
            f"posexplode({D.band_hashes_sql('sig', 4, 4)}) "
            "AS (band_idx, band_hash)")

    def sigs(df):
        return df.selectExpr(
            "doc_id",
            f"{D.shingle_hashes_sql(D.shingles_sql('text', 3))} AS hs",
        ).selectExpr("doc_id",
                     f"{D.minhash_signature_sql('hs', 16)} AS sig")

    existing = bands(sigs(spread(d).where(F.col("doc_id") % 10 < 8))) \
        .select(F.col("band_idx").alias("e_idx"),
                F.col("band_hash").alias("e_hash")).distinct()
    n_incoming = d.where(~(F.col("doc_id") % 10 < 8)).count()
    s = (table_stream(spark, sf_dir, "documents")
         .where(~(F.col("doc_id") % 10 < 8)))
    flagged = (
        bands(sigs(s))
        .join(F.broadcast(existing),
              (F.col("band_idx") == F.col("e_idx"))
              & (F.col("band_hash") == F.col("e_hash")), "left_semi")
        .dropDuplicates(["doc_id"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_flagged")))
    out = run_to_memory_sink(flagged, "stream_near_dup_flag", "complete")
    return out.select(
        F.lit(n_incoming).alias("n_incoming"),
        "n_flagged",
        (F.lit(n_incoming) - F.col("n_flagged")).alias("n_novel"))
