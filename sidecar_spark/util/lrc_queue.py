"""Least-Recently-Created queue — port of ``util/LRCQueue.java:41-143``.

Insertion-ordered map of cache_path -> length used by the write cache
to pick eviction victims: the candidate is always the iteration head
(oldest insertion). Re-putting an existing key must NOT refresh its
position (creation order, not access order). Save/load round-trips via
JSON (the reference uses Java object serialization).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Iterator, Optional, Tuple


class LRCQueue:
    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._d: dict = {}

    def put(self, key: str, value: int) -> None:
        with self._lock:
            # python dicts keep the ORIGINAL insertion position on
            # re-assignment — exactly the least-recently-created
            # semantics (a re-put must not refresh the position)
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
        """Oldest-created entry (iteration head) — LRCQueue.java:97-106."""
        with self._lock:
            return next(iter(self._d), None)

    def size(self) -> int:
        with self._lock:
            return len(self._d)

    def items(self) -> Iterator[Tuple[str, int]]:
        with self._lock:
            return iter(list(self._d.items()))

    def total_length(self) -> int:
        with self._lock:
            return sum(self._d.values())

    # ---- persistence (LRCQueue.java:129-143) ----------------------------

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
