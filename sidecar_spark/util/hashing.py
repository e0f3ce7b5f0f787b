"""Cache-key construction — port of ``util/Utils.java:100-123``.

The reference builds a 24-byte binary key: MD5(path + "/" + mtime)
(16 B) followed by the big-endian page-aligned offset (8 B). We keep
the same content-addressing (path + mtime + page offset) but render the
key as a hex string, which doubles as a safe local filename for the
page store. mtime in the key makes pages self-invalidating when a file
changes — stale keys simply never match (SURVEY.md §3.3).
"""

from __future__ import annotations

import hashlib


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def base_key(path: str, mtime: int) -> str:
    """MD5(path + '/' + mtime) — util/Utils.java:100-112 (getBaseKey)."""
    return md5_hex(f"{path}/{mtime}")


def page_key(path: str, mtime: int, offset: int, page_size: int) -> str:
    """Full page key: base key + page-aligned offset
    (util/Utils.java:114-123, getKey): offset is rounded DOWN to the
    page boundary before encoding."""
    aligned = (offset // page_size) * page_size
    return f"{base_key(path, mtime)}-{aligned:016x}"


def meta_key(path: str) -> str:
    """Meta-cache key: MD5(path) (SidecarCachingFileSystem.java:1086-1099)."""
    return md5_hex(path)
