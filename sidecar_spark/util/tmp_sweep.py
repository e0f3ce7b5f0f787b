"""Shared crash-leftover sweep for ``.tmp-`` staging files.

Both whole-file tiers publish via tmp + atomic ``os.replace``
(FileMirror.materialize, the task-side write mirror). A staging file
older than the age threshold is a crash leftover — a live copy
finishes or fails in seconds — and sits outside capacity accounting,
so rebuild/adoption passes sweep it.
"""

from __future__ import annotations

import os

#: staging files older than this are crash leftovers, not in-flight
TMP_SWEEP_AGE_S = 3600.0


def sweep_if_stale(path: str, now: float,
                   age_s: float = TMP_SWEEP_AGE_S) -> bool:
    """Remove ``path`` if it is older than ``age_s``; True if removed.
    Tolerates the file vanishing concurrently (another process's
    sweep or its owner's ``os.replace``)."""
    try:
        if now - os.path.getmtime(path) > age_s:
            os.remove(path)
            return True
    except OSError:
        pass
    return False
