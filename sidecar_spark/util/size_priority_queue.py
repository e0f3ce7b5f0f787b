"""Size-based eviction victim queue — port of
``util/SizeBasedPriorityQueue.java:33-151``.

The reference ships this as an ALTERNATIVE write-cache victim policy
(largest file first) but leaves it unwired (commented out at
``SidecarCachingFileSystem.java:114,1479-1481``). Here it is wired as
the opt-in ``sidecar.write.cache.eviction.policy=size`` policy; the
default stays LRC. Interface-compatible with ``LRCQueue`` so the
write cache can swap policies freely.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Iterator, Optional, Tuple


class SizeBasedPriorityQueue:
    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._d: dict = {}

    def put(self, key: str, value: int) -> None:
        with self._lock:
            self._d[key] = value

    def get(self, key: str) -> Optional[int]:
        with self._lock:
            return self._d.get(key)

    def remove(self, key: str) -> Optional[int]:
        with self._lock:
            return self._d.pop(key, None)

    def exists(self, key: str) -> bool:
        with self._lock:
            return key in self._d

    def eviction_candidate(self) -> Optional[str]:
        """Largest entry; ties break on insertion order (oldest first),
        keeping eviction deterministic."""
        with self._lock:
            best, best_len = None, -1
            for k, v in self._d.items():
                if v > best_len:
                    best, best_len = k, v
            return best

    def size(self) -> int:
        with self._lock:
            return len(self._d)

    def items(self) -> Iterator[Tuple[str, int]]:
        with self._lock:
            return iter(list(self._d.items()))

    def total_length(self) -> int:
        with self._lock:
            return sum(self._d.values())

    # ---- persistence (same JSON format as LRCQueue) ----------------------

    def save(self, path: str) -> None:
        with self._lock:
            entries = list(self._d.items())
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, path)

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        with open(path) as f:
            entries = json.load(f)
        with self._lock:
            self._d = {k: int(v) for k, v in entries}
        return True
