"""Engine statistics — port of ``util/Statistics.java:27-63,393-440``.

The reference keeps 19 atomic counters and exposes them over JMX; we
keep the same counter set in a thread-safe counter bag, expose a
snapshot ``dict``, a Spark DataFrame view (the engine's replacement for
the JMX sink, ``jmx/SidecarJMXSink.java:24-209``), and the same
save/load persistence (JSON instead of a raw long sequence).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional

# Counter names mirror util/Statistics.java:27-63 one-to-one.
COUNTERS = (
    "total_bytes_read",
    "total_bytes_read_remote",
    "total_bytes_read_write_cache",
    "total_bytes_read_data_cache",
    "total_bytes_read_prefetch",
    "total_read_requests",
    "total_read_requests_from_write_cache",
    "total_read_requests_from_data_cache",
    "total_read_requests_from_remote",
    "total_read_requests_from_prefetch",
    "total_scans_detected",
    "total_files_created",
    "total_files_deleted",
    "total_files_opened",
    "total_files_opened_in_write_cache",
    "total_write_cache_read_time_ns",
    "total_remote_fs_read_time_ns",
    "total_scan_read_requests_from_remote",
    "total_scan_bytes_read_remote",
)


class Statistics:
    """Thread-safe counter bag with snapshot/persistence.

    Mirrors the observable surface of util/Statistics.java so the
    tier-provenance test style of TestCachingFileSystemBase.java:222-316
    (assert *which tier* served the bytes via counter deltas) carries
    over directly.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._c: Dict[str, int] = {name: 0 for name in COUNTERS}

    def add(self, counter: str, delta: int = 1) -> None:
        if counter not in self._c:
            raise KeyError(f"unknown counter: {counter}")
        with self._lock:
            self._c[counter] += delta

    def get(self, counter: str) -> int:
        with self._lock:
            return self._c[counter]

    def snapshot(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._c)

    def reset(self) -> None:
        with self._lock:
            for k in self._c:
                self._c[k] = 0

    # ---- derived metrics (jmx/SidecarJMXSink.java:166-208) -------------

    def derived(self) -> Dict[str, float]:
        s = self.snapshot()

        def avg(total: int, n: int) -> float:
            return (total / n) if n else 0.0

        return {
            "avg_remote_read_time_ns": avg(
                s["total_remote_fs_read_time_ns"], s["total_read_requests_from_remote"]),
            "avg_write_cache_read_time_ns": avg(
                s["total_write_cache_read_time_ns"], s["total_read_requests_from_write_cache"]),
            "avg_read_size_remote": avg(
                s["total_bytes_read_remote"], s["total_read_requests_from_remote"]),
            "avg_read_size_data_cache": avg(
                s["total_bytes_read_data_cache"], s["total_read_requests_from_data_cache"]),
            "local_bytes_ratio": avg(
                s["total_bytes_read_data_cache"]
                + s["total_bytes_read_write_cache"]
                + s["total_bytes_read_prefetch"],
                s["total_bytes_read"]),
        }

    # ---- Spark view ----------------------------------------------------

    def to_df(self, spark):
        """One-row DataFrame of all counters — the queryable stats
        surface replacing the JMX MBeans."""
        snap = self.snapshot()
        fields = ", ".join(f"{name} LONG" for name in COUNTERS)
        return spark.createDataFrame([tuple(snap[n] for n in COUNTERS)], schema=fields)

    # ---- persistence (util/Statistics.java:393-440) ---------------------

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.snapshot(), f)
        os.replace(tmp, path)

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        with open(path) as f:
            data = json.load(f)
        with self._lock:
            for k in self._c:
                self._c[k] = int(data.get(k, 0))
        return True

    @classmethod
    def loaded(cls, path: str) -> "Statistics":
        s = cls()
        s.load(path)
        return s
