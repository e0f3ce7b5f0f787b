"""Shared helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition a CPU-dense operator's input up to cluster
    parallelism when the scan produced too few partitions.

    Small dimension-sized inputs (one parquet file → one partition)
    otherwise serialize expensive per-row work (shingling, hashing,
    vector math) onto a single core. At 100 TB inputs arrive in
    thousands of partitions and this is a no-op; the guard keeps the
    shuffle away whenever the scan is already parallel enough."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
