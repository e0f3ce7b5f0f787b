"""Hive-style partition handling for the cached table read paths.

Spark derives partition COLUMNS from ``key=value`` directory segments
between the table root and each data file. The reference never sees
this problem — it is a Hadoop FileSystem, so Spark still walks the
real directory tree through it. Our file-granular resolve hands Spark
concrete file paths instead, which strips the directories — without
the helpers here, a partitioned table would silently lose its
partition columns (caught by a round-5 probe; pinned in
tests/test_partitioned_tables.py).

Two consumers:

* driver mode (``Engine.read_parquet``): rebuild the ``key=value``
  tree as a content-addressed SYMLINK view over the mirror copies and
  hand Spark the view root with ``basePath`` — zero data copies, and
  Spark's own partition discovery (types, pruning) works unchanged;
* executor mode (``sources/cached_parquet.py``): each task appends
  the partition columns to its Arrow batches from the file's relative
  path; ``schema()`` infers the partition column types the way
  Spark's ``inferPartitionColumnValue`` does (int → bigint → double →
  string; ``__HIVE_DEFAULT_PARTITION__`` → null).
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple
from urllib.parse import unquote

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: symlink views older than this are rebuilt elsewhere and swept
VIEW_SWEEP_AGE_S = 24 * 3600.0


def partition_spec(root: str, file_path: str) -> List[Tuple[str, str]]:
    """``key=value`` segments between table root and the file, in
    order. Empty when the table is unpartitioned. BOTH key and value
    stay RAW (URL-encoded, hive null sentinel intact): the symlink
    view rebuild must round-trip the exact directory names (decoding
    there would make Spark's rediscovery decode TWICE), so decoding
    happens only at use (``decode_key`` / ``decode_value``)."""
    root = root.rstrip("/")
    if not file_path.startswith(root + "/"):
        return []
    rel = file_path[len(root) + 1:]
    out = []
    for seg in rel.split("/")[:-1]:
        if "=" not in seg:
            return []  # non-hive layout: treat as unpartitioned
        k, _, v = seg.partition("=")
        out.append((k, v))
    return out


def decode_key(raw: str) -> str:
    return unquote(raw)


def decode_value(raw: str) -> Optional[str]:
    if raw == HIVE_NULL:
        return None
    return unquote(raw)


def infer_partition_types(
        specs: Sequence[Sequence[Tuple[str, str]]]) -> List[Tuple[str, str]]:
    """(key, spark type ddl) per partition column, matching the
    numeric subset of Spark's inferPartitionColumnValue: int →
    bigint → double → string (date/decimal fall to string — the
    minority case, values stay correct as strings)."""
    import re

    keys: List[str] = []
    values: Dict[str, List[str]] = {}
    for spec in specs:
        for raw_k, v in spec:
            k = decode_key(raw_k)
            if k not in values:
                keys.append(k)
                values[k] = []
            if v != HIVE_NULL:
                values[k].append(decode_value(v))

    # strict numeric shapes (Java parse semantics): Python's
    # int()/float() accept underscores, padding and inf/nan, which
    # Spark's inferPartitionColumnValue rejects as numbers — those
    # must stay strings or values diverge from the JVM scan
    int_re = re.compile(r"[+-]?\d+")
    dbl_re = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")

    def one(vals: List[str]) -> str:
        if not vals:
            return "string"
        if all(int_re.fullmatch(v) for v in vals):
            ints = [int(v) for v in vals]
            if all(-2**31 <= i < 2**31 for i in ints):
                return "int"
            if all(-2**63 <= i < 2**63 for i in ints):
                return "bigint"
            return "string"  # beyond int64: Java parse fails
        if all(dbl_re.fullmatch(v) for v in vals):
            return "double"
        return "string"

    return [(k, one(values[k])) for k in keys]


def build_symlink_view(view_base: str,
                       pairs: Sequence[Tuple[str, str]]) -> str:
    """Materialize ``key=value`` structure as symlinks to local files.

    ``pairs`` is (relative path incl. partition dirs, local file
    path). The view dir is content-addressed by the pair set, so a
    repeat resolve of the same snapshot reuses it; a changed snapshot
    (new files, new mtimes → new mirror names) gets a fresh dir.
    Aged views are swept (they are symlink-only — cheap)."""
    digest = hashlib.md5(
        "\n".join(f"{r}\t{l}" for r, l in sorted(pairs)).encode()
    ).hexdigest()
    root = os.path.join(view_base, digest)
    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        os.utime(root, None)  # refresh for the sweep
        return root
    now = time.time()
    try:
        for name in os.listdir(view_base):
            p = os.path.join(view_base, name)
            try:
                if now - os.path.getmtime(p) > VIEW_SWEEP_AGE_S:
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass
    tmp = f"{root}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for rel, local in pairs:
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.symlink(local, dst)
        except FileExistsError:
            pass
    with open(os.path.join(tmp, ".complete"), "w"):
        pass
    try:
        os.rename(tmp, root)  # atomic publish
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
    return root
