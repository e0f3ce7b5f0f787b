"""Engine — the query surface over the caching layer.

``Engine(spark, base_dir)`` exposes ``table(name)`` / ``sql(q)`` /
``write(df, name)`` where table reads resolve through the CacheManager
(remote → local materialization when admitted, SURVEY.md §7.1) and
return ordinary DataFrames — the full relational operator set
(join/groupBy/window/sort/set-ops/…) is Catalyst's, exactly as the
reference delegates "queries" to whatever engine sits on top of the
cached FileSystem.

In the sidecar world this split is: sidecar = I/O layer, Spark/Hive/
HBase = query layer (README.md:1-3 of the reference). Here both halves
live in one repo.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.cache.meta import FileMeta
from sidecar_spark.config import SidecarConfig

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


class Engine:
    def __init__(self, spark, base_dir: Optional[str] = None,
                 conf: Optional[SidecarConfig] = None,
                 cache_enabled: bool = True) -> None:
        self.spark = spark
        self.base_dir = base_dir
        if conf is None:
            conf = SidecarConfig.from_spark(spark)
        if conf.cache_dir is None:
            # default cache root under the Spark local dir
            conf = SidecarConfig.create(**{
                **{k: getattr(conf, k) for k in (
                    "data_page_size", "io_buffer_size", "data_cache_type",
                    "data_cache_mode", "data_cache_size", "write_cache_size",
                    "write_cache_mode", "cache_persistent",
                )},
                "cache_dir": os.path.join(
                    os.environ.get("SPARK_LOCAL_DIRS", "/tmp"), "sidecar-cache"),
            })
        self.conf = conf
        self.cache_enabled = cache_enabled
        self.cache: Optional[CacheManager] = (
            CacheManager.get_or_create(conf) if cache_enabled else None
        )
        self._registered: Dict[str, str] = {}
        self._result_cache = None

    # ---- reads ---------------------------------------------------------

    def _location(self, name: str) -> str:
        if self.base_dir is None:
            raise ValueError("Engine has no base_dir; pass explicit paths")
        return os.path.join(self.base_dir, f"{name}.parquet")

    def resolve_paths(self, location: str) -> List[str]:
        """File-granular cache resolution (SURVEY.md §3.1 equivalent)."""
        if self.cache is None:
            return [location]
        paths = self.cache.resolve_for_spark(location)
        return paths if paths else [location]

    def table(self, name: str, sf_dir: Optional[str] = None):
        """Read a named table through the cache; returns a DataFrame."""
        location = (os.path.join(sf_dir, f"{name}.parquet")
                    if sf_dir else self._location(name))
        return self.read_parquet(location)

    def read_parquet(self, location: str):
        paths = self.resolve_paths(location)
        return self.spark.read.parquet(*paths)

    # ---- SQL ------------------------------------------------------------

    def register(self, name: str, sf_dir: Optional[str] = None) -> None:
        self.table(name, sf_dir=sf_dir).createOrReplaceTempView(name)
        self._registered[name] = sf_dir or self.base_dir or ""

    def register_all(self, sf_dir: Optional[str] = None,
                     tables=TPCH_TABLES) -> None:
        for t in tables:
            path = os.path.join(sf_dir or self.base_dir, f"{t}.parquet")
            if os.path.exists(path) or "://" in path:
                self.register(t, sf_dir=sf_dir)

    def sql(self, query: str):
        return self.spark.sql(query)

    def sql_cached(self, query: str):
        """``sql`` with the result cache (cache/results.py): the
        result is keyed by md5(query ‖ every resolved input file's
        path+mtime+length) — the page-key self-invalidation idea at
        result granularity, so a changed input or text produces a
        miss and stale entries are never served.  A hit replaces the
        whole plan with a local parquet scan."""
        from sidecar_spark.cache.results import ResultCache

        if self._result_cache is None:
            self._result_cache = ResultCache(
                os.path.join(self.conf.cache_dir, "results"),
                capacity_bytes=self.conf.write_cache_size or None)
        rc = self._result_cache
        df = self.spark.sql(query)
        inputs = []
        for uri in df.inputFiles():
            path = uri[len("file:"):] if uri.startswith("file:") else uri
            try:
                st = os.stat(path)
                inputs.append((path, st.st_mtime_ns, st.st_size))
            except OSError:
                # non-local input: fold the raw uri in (no mtime —
                # conservative, distinct per listing)
                inputs.append((uri, 0, 0))
        key = rc.key_for(query, inputs)
        hit = rc.lookup(key)
        if hit is not None:
            return self.spark.read.parquet(hit)
        data = rc.store(
            key, lambda d: df.write.mode("overwrite").parquet(d), query)
        return self.spark.read.parquet(data)

    def result_cache_stats(self) -> dict:
        return (self._result_cache.snapshot()
                if self._result_cache is not None else
                {"hits": 0, "misses": 0, "evictions": 0,
                 "entries": 0, "bytes": 0})

    # ---- writes -----------------------------------------------------------

    def write(self, df, location: str, mode: str = "overwrite",
              partition_by: Optional[List[str]] = None) -> None:
        """Write a DataFrame to the remote location and mirror the
        produced files into the write cache (the dual-destination write
        of SURVEY.md §3.2 at file granularity: Spark writes remote, we
        register + mirror after the commit)."""
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(location)
        if self.cache is not None and self.cache.write_cache is not None:
            for st in self.cache.list_files(location):
                if self.conf.write_excluded(st.path):
                    continue
                fs, path = self.cache._resolve(st.path)
                data = fs.read_all(path)
                self.cache.write_cache.put_file(path, data, synced=True)
                self.cache.meta.save(
                    path, FileMeta(st.mtime, st.length, st.is_dir))
                self.cache.write_cache.check_eviction()

    # ---- observability -------------------------------------------------------

    def cache_stats(self):
        """Counters as a one-row DataFrame (replaces the JMX sink)."""
        if self.cache is None:
            from sidecar_spark.stats import Statistics
            return Statistics().to_df(self.spark)
        return self.cache.stats.to_df(self.spark)

    def close(self) -> None:
        if self.cache is not None:
            self.cache.close()
