"""Battery-hang guard: every streaming run must be bounded.

Round-2 verdict ("What's wrong #1"): one transient py4j callback
failure wedged a foreachBatch query forever, and the unbounded
``awaitTermination()`` of the NEXT query then hung the whole battery.
These tests prove the ``await_bounded`` guard (a) times a wedged query
out loudly, and (b) leaves the session healthy for the next streaming
query.
"""

import time

import pytest
from pyspark.sql import functions as F

from sidecar_spark.streaming.ops import (
    await_bounded,
    events_stream,
    run_to_memory_sink,
    scratch_dir,
)


def _events(spark, sf_dir):
    return events_stream(spark, sf_dir).select("event_type", "ts", "value")


def test_wedged_foreach_batch_times_out_and_battery_proceeds(spark, sf_dir):
    """A foreachBatch that never returns must raise TimeoutError within
    the bound instead of hanging, and the session must still execute a
    subsequent streaming query normally."""
    ckpt = scratch_dir("sidecar-wedge-ckpt-")

    def wedge(batch_df, batch_id):  # noqa: ARG001 - signature fixed by Spark
        time.sleep(600)

    q = (
        _events(spark, sf_dir).writeStream.foreachBatch(wedge)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="did not terminate"):
        await_bounded(q, timeout_sec=5)
    # bounded: 5s wait + <=15s stop grace, nowhere near the 600s wedge
    assert time.monotonic() - t0 < 60

    # the battery proceeds: a fresh streaming query on the same session
    out = run_to_memory_sink(
        _events(spark, sf_dir).groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt")),
        "after_wedge", "complete")
    assert out.count() > 0


def test_erroring_foreach_batch_raises_promptly(spark, sf_dir):
    """An exception inside foreachBatch surfaces as the query's own
    StreamingQueryException through await_bounded (not a timeout)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    ckpt = scratch_dir("sidecar-err-ckpt-")

    def boom(batch_df, batch_id):  # noqa: ARG001
        raise RuntimeError("deliberate batch failure")

    q = (
        _events(spark, sf_dir).writeStream.foreachBatch(boom)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        await_bounded(q, timeout_sec=60)


def test_explicit_timeout_not_load_stretched(monkeypatch):
    """An explicitly passed timeout must be honored EXACTLY — the
    load factor applies only to the STREAM_TIMEOUT_SEC default (a
    caller asking for a tight bound wants wedge detection at that
    bound, round-4 ADVICE)."""
    from sidecar_spark.streaming import ops

    monkeypatch.setattr(ops, "_load_factor", lambda: 4.0)
    seen = {}

    class FakeQuery:
        name = "fq"
        id = "fq-id"

        def awaitTermination(self, timeout):
            seen["timeout"] = timeout
            return True

    ops.await_bounded(FakeQuery(), timeout_sec=7.5)
    assert seen["timeout"] == 7.5  # exact, not 30.0
    ops.await_bounded(FakeQuery())  # default DOES stretch
    assert seen["timeout"] == ops.STREAM_TIMEOUT_SEC * 4.0
