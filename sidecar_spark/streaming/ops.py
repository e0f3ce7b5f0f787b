"""Structured Streaming operator implementations.

Design notes for scale:

* Streams are declared with ``readStream`` over a file source (the
  testdata parquet); in production the same plans run unchanged on
  Kafka/Kinesis sources — only the ``load`` call differs.
* Event-time correctness comes from ``withWatermark``: state for
  windows older than (max event time − delay) is evicted, bounding
  state size regardless of stream length — the 100 TB/day concern.
* ``availableNow`` triggers process the backlog as a bounded stream
  with the SAME incremental execution as a live stream (state store,
  watermark advancement, append semantics), which is what makes the
  results reproducible enough to oracle-check against batch SQL.
* Custom stateful logic uses ``applyInPandasWithState`` (Arrow-batched
  per-group state machine) — the Spark-native replacement for an
  imperative per-key operator.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def scratch_dir(prefix: str) -> str:
    """mkdtemp for THROWAWAY streaming checkpoints/sinks, preferring a
    RAM-backed filesystem (/dev/shm) over disk.

    An HDFS-backed state store fsyncs a delta file per store instance
    per micro-batch commit; on a disk-backed /tmp those fsyncs dominate
    a bounded-backlog run's wall clock. The checkpoints written here
    are ephemeral by contract (memory sinks, single-run demos), so RAM
    placement loses nothing — a production deployment points
    checkpointLocation at durable shared storage instead, exactly as a
    real cluster would."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK) else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


#: Default upper bound for any bounded-backlog streaming run.  Every
#: availableNow query in the battery finishes in seconds; a run that is
#: still alive after this long is wedged (e.g. a py4j callback-server
#: failure can leave a foreachBatch query permanently stuck), and an
#: unbounded ``awaitTermination()`` would then hang the whole battery.
STREAM_TIMEOUT_SEC = float(os.environ.get("SIDECAR_STREAM_TIMEOUT", "120"))


def _load_factor() -> float:
    """Timeout multiplier under CPU contention: a second Spark session
    on the same box can slow a CORRECT bounded stream past the guard,
    and a timeout that aborts a correct query is indistinguishable
    from a wrong answer in the correctness record (round-3 finding:
    3 load-induced transients).  Scale by 1-min loadavg per core,
    clamped to [1, 4] so a genuinely wedged query still fails in
    bounded time."""
    try:
        load = os.getloadavg()[0] / max(1, os.cpu_count() or 1)
    except (OSError, AttributeError):
        return 1.0
    return min(4.0, max(1.0, load))


def await_bounded(q, timeout_sec: float | None = None) -> None:
    """``q.awaitTermination`` with a hard upper bound.

    On timeout the query is stopped (itself bounded — ``stop()`` can
    block on the same wedged callback) and a ``TimeoutError`` is
    raised, so one stuck streaming query fails loudly instead of
    freezing every query after it.  A query that terminated with an
    error still raises its ``StreamingQueryException`` as usual.
    The DEFAULT bound stretches with measured CPU load
    (``_load_factor``) so contention slows the guard before it aborts
    correct work; an EXPLICIT ``timeout_sec`` is honored exactly — a
    caller asking for a tight bound wants wedge detection at that
    bound, not a silently 4x-stretched one."""
    timeout = (STREAM_TIMEOUT_SEC * _load_factor()
               if timeout_sec is None else timeout_sec)
    finished = q.awaitTermination(timeout)
    if finished:
        return
    import threading
    stopper = threading.Thread(target=q.stop, daemon=True)
    stopper.start()
    stopper.join(15)
    raise TimeoutError(
        f"streaming query {q.name or q.id} did not terminate within "
        f"{timeout}s; stopped (stop() "
        f"{'completed' if not stopper.is_alive() else 'still pending'})")


_SCHEMA_CACHE: dict = {}


def table_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """``readStream`` over any testdata table (the file stream source
    requires a DIRECTORY; expose the single table file through a
    symlinked stream dir — testdata is read-only).

    The source schema is memoized per (path, mtime): every streaming
    query in the battery paid a ~100 ms driver-side parquet footer
    read just to redeclare the same schema (the mtime key keeps the
    cache honest if the file is replaced)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    key = (path, os.stat(path).st_mtime_ns)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    stream_dir = os.path.join(
        tempfile.gettempdir(),
        "sidecar-streamsrc-" + path.strip("/").replace("/", "_"))
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, f"{table}.parquet")
    if not os.path.lexists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass  # a concurrent process won the race — same target
    elif not os.path.exists(link):
        # dangling link (its target moved): heal it
        os.remove(link)
        os.symlink(path, link)
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(stream_dir)
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table.

    The parquet has shipped as TIMESTAMP(NANOS) (long nanos via
    ``legacy.parquet.nanosAsLong``) or plain timestamp[us]
    (TIMESTAMP_NTZ) — normalize either to session-zone TIMESTAMP,
    matching the batch loader (queries/registry.py:t)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = table_stream(spark, sf_dir, "events")
    schema = stream.schema
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_to_memory_sink(stream_df: DataFrame, name: str,
                       output_mode: str,
                       state_partitions: int = 2) -> DataFrame:
    """Execute a streaming plan to completion with an availableNow
    trigger into an in-memory table; return the result as a DataFrame.

    This is the bounded-backlog execution mode: identical incremental
    semantics to a live stream, deterministic end state. Checkpoints go
    to a throwaway dir (the memory sink is itself ephemeral).

    The stateful-shuffle width is pinned to ``state_partitions`` for
    the duration of the run: each state-store instance pays
    checkpoint/commit overhead per microbatch, so a bounded backlog
    wants few, well-filled stores (a live deployment sizes this to
    keyspace/throughput instead — it is fixed per checkpoint)."""
    spark = stream_df.sparkSession
    ckpt = scratch_dir(f"sidecar-stream-{name}-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        # the memory sink owns the rows once the query terminates; the
        # checkpoint is dead weight (and RAM, when scratch_dir chose shm)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation: the canonical streaming
    windowed count/sum. In append mode only windows entirely below the
    final watermark are emitted (= finalized windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_distinct_keys(events: DataFrame,
                         keys: Iterable[str] = ("user_id", "event_type"),
                         watermark: str = "10 minutes") -> DataFrame:
    """Streaming deduplication on a key set. dropDuplicates keeps
    per-key state; the watermark bounds it for live streams. Only the
    keys are emitted (which physical row survives is timing-dependent;
    the key set is deterministic)."""
    keys = list(keys)
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicates(keys)
        .select(*keys)
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization via the native session_window: windows
    merge while events arrive within ``gap``; a session closes when the
    watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            "n_events", "session_value",
        )
    )


_USER_STATS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _user_stats_fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState):
    """Per-user running (count, sum) state machine. Emits the updated
    totals once per batch in which the user appears."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [round(total, 2)],
    })


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running event count and value sum. The replacement for an
    imperative keyed-state operator; state lives in the state store,
    partitioned by user — scales with distinct keys, not stream
    length."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=_USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_joined_streams(events: DataFrame,
                            watermark: str = "30 minutes",
                            lookback: str = "10 minutes") -> DataFrame:
    """Stream-stream interval join: purchases matched to the same
    user's clicks in the preceding ``lookback`` window.

    Both sides carry a watermark and the join predicate bounds event
    time on BOTH sides, so Spark can size and evict the join state
    (unbounded stream-stream joins are rejected in append mode). The
    state kept per side is watermark+lookback of events — the knob
    that keeps a 100 TB/day stream joinable."""
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select("user_id", "purchase_id", "click_id")
    )


def enriched_windowed_value(events: DataFrame, dim: DataFrame,
                            window: str = "1 hour",
                            watermark: str = "10 minutes") -> DataFrame:
    """Stream-static join + windowed aggregation: each event is
    enriched with its user's market segment from a STATIC dimension
    (broadcast — no state, re-snapshotted per micro-batch in a live
    deployment), then aggregated in watermarked tumbling windows per
    segment. The canonical streaming-enrichment shape: joins against
    slowly-changing dims stay stateless; only the window agg keeps
    state."""
    enriched = events.join(
        F.broadcast(dim.select(F.col("c_custkey").alias("user_id"),
                               "c_mktsegment")),
        "user_id")
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "c_mktsegment", "n_events", "sum_value",
        )
    )


def left_joined_streams(events: DataFrame,
                        watermark: str = "30 minutes",
                        lookback: str = "10 minutes") -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, with
    its same-user clicks in the preceding ``lookback`` window, or a
    null click if none arrive.

    The outer semantics are the streaming-specific part: a null-padded
    purchase can only emit once the CLICK-side watermark guarantees no
    matching click can still arrive (click ts must be ≤ purchase ts,
    so eviction triggers when the click watermark passes the purchase
    ts). Unmatched purchases younger than the final watermark stay in
    state and never emit — the append-mode oracle encodes exactly that
    cutoff."""
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "left_outer")
        .select("user_id", "purchase_id", "click_id")
    )


def run_foreach_batch_parquet(stream_df: DataFrame, name: str,
                              out_dir: str,
                              state_partitions: int = 2,
                              checkpoint: str | None = None) -> DataFrame:
    """Execute a streaming plan with a ``foreachBatch`` parquet sink and
    return the sink contents.

    foreachBatch is the production sink escape hatch (JDBC upserts,
    MERGE targets, multi-sink fan-out); exactly-once comes from
    IDEMPOTENT writes keyed by batchId — each micro-batch overwrites
    its own ``batch=<id>`` partition directory, so a replayed batch
    (failure between write and checkpoint commit) lands in the same
    place instead of duplicating. The checkpoint + deterministic
    batch replay + idempotent write is the documented Spark recipe."""
    spark = stream_df.sparkSession
    own_ckpt = checkpoint is None
    ckpt = checkpoint or scratch_dir(f"sidecar-stream-{name}-ckpt-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    try:
        q = (
            stream_df.writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if own_ckpt:
            # a scratch checkpoint is single-run by contract: leaving
            # it leaks RAM-backed /dev/shm space on every invocation
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.option("basePath", out_dir).parquet(out_dir)


def chained_join_windowed(events: DataFrame) -> DataFrame:
    """Two chained stateful operators in ONE streaming query (Spark
    3.4+ multi-stateful support): a stream-stream interval join
    (purchases × preceding clicks per user, both sides watermarked
    30 min) feeding a 1-hour tumbling-window aggregation in append
    mode.  Pre-3.4 this required materializing the join to storage
    and running a second query; chained, the join's matched rows flow
    straight into windowed state with a propagated watermark —
    one checkpoint, one state lifecycle, no intermediate sink."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .withWatermark("ts", "30 minutes"))
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "30 minutes"))
    joined = purchases.join(
        clicks,
        F.expr("user_id = c_user AND "
               "c_ts >= ts - INTERVAL 10 MINUTES AND c_ts <= ts"))
    return (
        joined.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "n_pairs", "sum_value")
    )


def run_append_two_pass(spark: SparkSession, build, name: str,
                        state_partitions: int = 2) -> DataFrame:
    """Run an append-mode streaming plan TWICE over one checkpoint with
    an accumulating foreachBatch parquet sink, returning everything
    emitted across both runs.

    Chained stateful operators finalize downstream state one watermark
    propagation behind the data: the run that ingests the backlog
    advances the watermark, and the next run's no-data micro-batch
    (same checkpoint) flushes the now-final windows.  Live streams get
    this for free from their continuous micro-batches; bounded
    availableNow backlogs need the second pass.  ``build`` must
    construct a fresh stream DataFrame per call (streaming plans are
    single-use)."""
    ckpt = scratch_dir(f"sidecar-{name}-ckpt-")
    out = scratch_dir(f"sidecar-{name}-out-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        for _ in range(2):
            q = (
                build().writeStream
                .foreachBatch(lambda df, bid: df.write.mode("append")
                              .parquet(out))
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            await_bounded(q)
        result = spark.read.parquet(out)
        # materialize before the tmp dirs are reclaimed
        return result.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime can work: its
    driver/executor state-server protocol is protobuf-based, so the
    API hard-fails at query start without ``google.protobuf``
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    import importlib.util
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


_TWS_OUT_SCHEMA = ("user_id bigint, n_events bigint, "
                   "n_types bigint, total_value double")


def _tws_fallback_fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
                     state: GroupState):
    """applyInPandasWithState twin of the StatefulProcessor below:
    ValueState → (n, total) tuple, MapState → sorted distinct-type
    array carried in the same state tuple."""
    n, total, types = state.get if state.exists else (0, 0.0, [])
    seen = set(types)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        seen.update(str(t) for t in pdf["event_type"].unique())
    state.update((n, total, sorted(seen)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "n_types": [len(seen)], "total_value": [total]})


def transform_with_state_user_acc(spark: SparkSession, events: DataFrame,
                                  name: str) -> DataFrame:
    """Per-user running (count, value-sum, distinct-type-count) state
    machine on the Spark 4 StatefulProcessor API when the runtime
    supports it, else on applyInPandasWithState with identical
    semantics (see stream_transform_with_state for the seam contract).
    Returns the per-batch cumulative emissions."""
    e = events.select("user_id", "event_type", "value")
    if not tws_available():
        out = e.groupBy("user_id").applyInPandasWithState(
            _tws_fallback_fn,
            outputStructType=_TWS_OUT_SCHEMA,
            stateStructType="n bigint, total double, types array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout)
        return run_to_memory_sink(out, name, "append")

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _UserAcc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", "n bigint, total double")
            self._types = handle.getMapState("types", "t string",
                                             "one smallint")

        def handleInputRows(self, key, rows, timer_values):
            n, total = (self._acc.get() if self._acc.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for tpe in pdf["event_type"].unique():
                    self._types.updateValue((str(tpe),), (1,))
            self._acc.update((n, total))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "n_types": [n_types], "total_value": [total]})

        def close(self) -> None:
            pass

    prov = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prov, "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        out = e.groupBy("user_id").transformWithStateInPandas(
            _UserAcc(), outputStructType=_TWS_OUT_SCHEMA,
            outputMode="append", timeMode="None")
        return run_to_memory_sink(out, name, "append")
    finally:
        spark.conf.unset(prov)


_TIMEOUT_SESS_SCHEMA = ("user_id long, session_start string, "
                        "n_events long, session_value double")
_TIMEOUT_SESS_STATE = ("start_us long, last_us long, n long, total double")
_SESS_GAP_US = 30 * 60 * 1_000_000


def _timeout_sessionize_fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
                           state: GroupState):
    """Timer-driven sessionizer (EventTimeTimeout): batches split into
    gap-separated sessions; every session CLOSED BY DATA (a newer
    event from the same user past the gap) emits immediately, and the
    trailing open session is parked in state with an event-time timer
    at last_ts + gap — the no-data micro-batch that advances the
    watermark past that timer fires the timeout branch, which flushes
    the held session.  This is the hand-rolled twin of the native
    session_window operator, exercising the state-timeout API."""
    def frame(rows):
        # ONE DataFrame per invocation: per-yield Arrow batches are the
        # dominant cost when groups are small and numerous
        return pd.DataFrame({
            "user_id": [key[0]] * len(rows),
            "session_start": [pd.Timestamp(s0, unit="us")
                              .strftime("%Y-%m-%d %H:%M:%S")
                              for s0, _n, _t in rows],
            "n_events": [n for _s, n, _t in rows],
            "session_value": [round(t, 2) for _s, _n, t in rows],
        })

    if state.hasTimedOut:
        start_us, _last, n, total = state.get
        state.remove()
        yield frame([(start_us, n, total)])
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    cur = state.get if state.exists else None
    closed = []
    for ts_us, value in zip(rows["ts_us"], rows["value"]):
        ts_us, value = int(ts_us), float(value)
        if cur is None:
            cur = (ts_us, ts_us, 1, value)
        elif ts_us - cur[1] > _SESS_GAP_US:
            closed.append((cur[0], cur[2], cur[3]))  # closed by data
            cur = (ts_us, ts_us, 1, value)
        else:
            cur = (cur[0], ts_us, cur[2] + 1, cur[3] + value)
    if cur is not None:
        state.update(cur)
        # park the open session: timer at last event + gap (ms)
        state.setTimeoutTimestamp((cur[1] + _SESS_GAP_US) // 1000)
    if closed:
        yield frame(closed)


def timeout_sessionized(events: DataFrame,
                        watermark: str = "10 minutes") -> DataFrame:
    """applyInPandasWithState with EventTimeTimeout — the custom
    sessionization that relies on the state-store TIMER path (vs the
    native session_window operator, which holds windows purely on the
    watermark)."""
    e = (events.withWatermark("ts", watermark)
         .select("user_id", "value", "ts",
                 (F.unix_micros("ts")).alias("ts_us")))
    return e.groupBy("user_id").applyInPandasWithState(
        _timeout_sessionize_fn,
        outputStructType=_TIMEOUT_SESS_SCHEMA,
        stateStructType=_TIMEOUT_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
