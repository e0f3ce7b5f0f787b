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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class TelemetrySource(DataSource):
    """`spark.read.format("sidecar_telemetry").option("rows", N)`."""

    @classmethod
    def name(cls) -> str:
        return "sidecar_telemetry"

    def schema(self) -> str:
        return "event_id bigint, host string, metric bigint"

    def reader(self, schema) -> TelemetryReader:
        return TelemetryReader(self.options)
