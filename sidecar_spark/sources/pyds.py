"""Python DataSource API connector (Spark 4.x).

The reference ships 10 per-vendor FileSystem wrapper classes as its
"connector surface" (SURVEY.md §2.6); the Spark-native analog for a
NON-file system-of-record (a device fleet, an internal service, a
message bus) is the Python DataSource API: implement `partitions()` +
`read(partition)` and Spark plans the scan like any other source —
one task per InputPartition, pushdown-free but fully parallel.

`TelemetrySource` is a deterministic synthetic telemetry feed (row i
-> host h{i%50}, metric (i*2654435761)%1000 — a Knuth multiplicative
hash, reproducible in any engine's integer math), so correctness is
oracle-checkable: DuckDB recomputes the identical rows from
generate_series. The shape is what matters at scale: N independent
partitions stream Arrow batches concurrently, no driver fan-in.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KNUTH = 2654435761
HOSTS = 50
METRIC_MOD = 1000


class _Span(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TelemetryReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 80_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.rows // self.num_partitions)
        return [_Span(lo, min(lo + step, self.rows))
                for lo in range(0, self.rows, step)]

    def read(self, part: _Span):
        for i in range(part.start, part.end):
            yield i, f"h{i % HOSTS}", (i * KNUTH) % METRIC_MOD


def _feed_rows(start: int, end: int):
    # a list iterator, not a generator: the stream-reader prefetch
    # cache copy.copy()s the iterator it is handed
    return iter([(i, f"h{i % HOSTS}", (i * KNUTH) % METRIC_MOD)
                 for i in range(start, end)])


class TelemetryStreamReader(SimpleDataSourceStreamReader):
    """Resumable micro-batch reader over the same feed: offsets are
    plain row positions, `read(start)` advances one `batch`-sized span,
    and `readBetweenOffsets` replays any committed span — which is all
    Structured Streaming needs for checkpointed, exactly-once resume.
    Offset JSON lives in the checkpoint, so a restarted query continues
    where the last run's commit left off (proved by the
    stream_python_source query, which drives two availableNow runs
    over one checkpoint)."""

    def __init__(self, options):
        self.total = int(options.get("rows", 80_000))
        self.batch = int(options.get("batch", self.total))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        s = start["i"]
        e = min(s + self.batch, self.total)
        return _feed_rows(s, e), {"i": e}

    def readBetweenOffsets(self, start, end):
        return _feed_rows(start["i"], end["i"])


class TelemetrySource(DataSource):
    """`spark.read.format("sidecar_telemetry").option("rows", N)` —
    and `spark.readStream.format("sidecar_telemetry")` for the
    micro-batch variant of the same feed."""

    @classmethod
    def name(cls) -> str:
        return "sidecar_telemetry"

    def schema(self) -> str:
        return "event_id bigint, host string, metric bigint"

    def reader(self, schema) -> TelemetryReader:
        return TelemetryReader(self.options)

    def simpleStreamReader(self, schema) -> TelemetryStreamReader:
        return TelemetryStreamReader(self.options)


# ---------------------------------------------------------------------------
# Writer half of the connector API (Spark 4): executor-parallel writes
# with a commit protocol — the DataSourceWriter counterpart of the
# reference's write-path wrappers (create/close + moniker lifecycle,
# SidecarCachingFileSystem.java:1635-1663,1268-1326).
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _FileDone(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    """JSON-lines sink with the two-phase commit protocol: each task
    writes a uniquely-named ``.inprogress`` file (the moniker idea —
    uncommitted output is marked in-band) and reports it in its commit
    message; the driver-side ``commit`` renames all task files into
    place and drops a ``_SUCCESS`` marker, while ``abort`` removes the
    partials.  A failed/speculated task therefore never corrupts the
    output directory — the same guarantee the reference's
    write-cache moniker protocol provides for unsynced mirrors."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sidecar_jsonl requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        _os.makedirs(self.path, exist_ok=True)
        tmp = _os.path.join(
            self.path, f"part-{_uuid.uuid4().hex}.jsonl.inprogress")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileDone(tmp, n)

    def commit(self, messages):
        for m in messages:
            final = m.path[: -len(".inprogress")]
            _os.replace(m.path, final)
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(sum(m.n_rows for m in messages)))

    def abort(self, messages):
        for m in messages:
            try:
                _os.remove(m.path)
            except OSError:
                pass


class JsonlSink(DataSource):
    """Writer-only Python DataSource: ``df.write.format('sidecar_jsonl')
    .option('path', dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "sidecar_jsonl"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)
