"""Scan-resistant cache admission — port of ``util/ScanDetector.java:43-69``.

Keeps a ring buffer of the last N page-aligned offsets; a scan is
detected exactly when the last N recorded offsets are consecutive
pages (each differs from the previous by exactly ``page_size``). Used
by the page store to stop caching pages mid-scan (full-table scans
would otherwise flush the hot set) — veto point mirrors
``SidecarCachingInputStream.dataPagePut:670-682``.

Boundary semantics verified against util/TestScanDetector.java:24-57:
the detector fires on the threshold-th consecutive access, tolerates a
noise prefix, and never fires for strides != page_size.
"""

from __future__ import annotations


class ScanDetector:
    def __init__(self, threshold: int, page_size: int) -> None:
        if threshold < 2:
            raise ValueError("threshold must be >= 2")
        self.threshold = threshold
        self.page_size = page_size
        self._buf = [-1] * threshold  # ring of last N offsets
        self._pos = 0
        self._count = 0

    def record(self, offset: int) -> bool:
        """Record a page-aligned offset; return True iff this access
        completes a run of `threshold` consecutive pages."""
        aligned = (offset // self.page_size) * self.page_size
        self._buf[self._pos] = aligned
        self._pos = (self._pos + 1) % self.threshold
        self._count += 1
        return self.current()

    def current(self) -> bool:
        """True iff the buffer holds threshold offsets forming a
        consecutive-page run (ScanDetector.java:57-69)."""
        if self._count < self.threshold:
            return False
        # walk the ring from oldest to newest
        start = self._pos  # oldest slot
        prev = self._buf[start]
        for i in range(1, self.threshold):
            cur = self._buf[(start + i) % self.threshold]
            if cur - prev != self.page_size:
                return False
            prev = cur
        return True

    def reset(self) -> None:
        self._buf = [-1] * self.threshold
        self._pos = 0
        self._count = 0
