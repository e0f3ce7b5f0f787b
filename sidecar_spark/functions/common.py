"""Shared helpers for the pipeline operators."""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Cheap estimate of the scan's partition count from the input
    files' sizes and the session's split settings — mirrors
    FilePartition packing (maxPartitionBytes target size, openCost
    padding per file) without triggering ``df.rdd``, whose plan→RDD
    conversion costs ~1 s of analysis/planning per call."""
    files = df.inputFiles()
    if not files:
        raise ValueError("no input files")
    conf = df.sparkSession.conf
    max_bytes = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            raise ValueError("non-local input")
        total += os.path.getsize(p.path or f) + open_cost
    return max(1, -(-total // max_bytes))


def _parse_bytes(v) -> int:
    s = str(v).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if s and s[-1] == "b":
        s = s[:-1]
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition a CPU-dense operator's input up to cluster
    parallelism when the scan produced too few partitions.

    Small dimension-sized inputs (one parquet file → one partition)
    otherwise serialize expensive per-row work (shingling, hashing,
    vector math) onto a single core. At 100 TB inputs arrive in
    thousands of partitions and this is a no-op; the guard keeps the
    shuffle away whenever the scan is already parallel enough.

    The partition count is *estimated* from input-file sizes (file
    listing is already cached by the scan's FileIndex) rather than
    probed with ``df.rdd.getNumPartitions()``, which forces a full
    plan→RDD conversion (~1 s of driver time per call)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = _estimated_scan_partitions(df)
    except Exception:  # non-file source or remote scheme: exact probe
        nparts = df.rdd.getNumPartitions()
    if nparts * min_factor <= target:
        return df.repartition(target)
    return df
