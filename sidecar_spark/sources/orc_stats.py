"""ORC stripe-statistics pruning (round-7 verdict missing #2).

pyarrow exposes ORC stripes only as indexed reads — no stripe
statistics API — but it DOES expose every length needed to locate the
file's metadata section (``stripe_statistics_length``,
``file_footer_length``, ``file_postscript_length``), and the section
itself is a protobuf this module parses by hand (the ORC spec's
``Metadata { repeated StripeStatistics }``; ~100 lines of varint
walking, no protobuf wheel needed). The section is chunked with the
file's general codec: NONE and ZLIB (raw DEFLATE, stdlib) and
SNAPPY/ZSTD (via ``pyarrow.Codec``) all decode — that covers every
codec Spark writes (zstd default in 4.x, snappy in 3.x, zlib
classic); LZO/LZ4 metadata returns None (no pruning, never wrong).

Pruning policy mirrors the parquet side exactly (conservative — a
stripe is dropped only when its statistics PROVE no row matches, and
Spark re-applies every filter as residual):

* integers (sint64 min/max, zigzag) and strings (full min/max only —
  a stats entry carrying just truncated lowerBound/upperBound never
  prunes) compare exactly;
* doubles/floats never prune (NaN semantics), timestamps never prune
  (writer-zone semantics), DATES never prune (ORC day counts are
  HYBRID-calendar labels while pushed references are proleptic — the
  same julian-vs-proleptic hazard the parquet LEGACY rule guards),
  decimals never prune (string-encoded stats; conservative);
* all-null stripes (numberOfValues == 0, min/max absent) provably
  fail every non-IsNull comparison; ``hasNull=false`` proves IsNull
  empty.

Only TOP-LEVEL primitive columns prune (stable preorder column ids
computed from the arrow schema's subtree sizes); nested columns are
present-but-unprunable, exactly like the parquet rule.
"""

from __future__ import annotations

from typing import Optional


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf, start=0, end=None):
    """Iterate (field_no, wire_type, value) over one protobuf
    message. Varints come decoded; length-delimited come as
    memoryview slices; 32/64-bit come as raw bytes."""
    i = start
    end = len(buf) if end is None else end
    while i < end:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fno, wt, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 1:
            yield fno, wt, buf[i:i + 8]
            i += 8
        elif wt == 5:
            yield fno, wt, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")


def _decompress_section(raw: bytes, kind: str, chunk_cap: int):
    """ORC compressed-stream decode: the section is a sequence of
    chunks, each with a 3-byte little-endian header
    ``(length << 1) | is_original``. ``kind`` NONE means no chunk
    framing at all."""
    kind = (kind or "UNCOMPRESSED").upper()
    if kind in ("NONE", "UNCOMPRESSED"):
        return raw
    if kind == "ZLIB":
        import zlib

        def codec(b):
            return zlib.decompress(b, wbits=-15)
    elif kind == "ZSTD":
        import pyarrow as pa

        def codec(b):
            # streaming decode: ORC zstd frames omit the content
            # size, so Codec.decompress (which demands an exact
            # size) can't apply — CompressedInputStream can
            with pa.CompressedInputStream(pa.BufferReader(b),
                                          "zstd") as s:
                return s.read()
    elif kind == "SNAPPY":
        import pyarrow as pa

        c = pa.Codec("snappy")

        def codec(b):
            # a raw snappy block leads with its uncompressed length
            # as a varint — arrow's codec wants it passed explicitly
            size, _ = _varint(b, 0)
            return c.decompress(b, decompressed_size=size).to_pybytes()
    else:
        return None  # LZO/LZ4: no decoder here — no pruning
    out = []
    i = 0
    n = len(raw)
    while i + 3 <= n:
        h = raw[i] | (raw[i + 1] << 8) | (raw[i + 2] << 16)
        i += 3
        ln = h >> 1
        body = raw[i:i + ln]
        i += ln
        out.append(bytes(body) if h & 1 else codec(bytes(body)))
    return b"".join(out)


def _parse_column_stats(buf):
    """One ColumnStatistics message → a small dict (only the stats
    the pruning policy uses)."""
    d = {}
    for fno, wt, v in _fields(buf):
        if fno == 1 and wt == 0:
            d["n"] = v  # numberOfValues (non-null count)
        elif fno == 10 and wt == 0:
            d["has_null"] = bool(v)
        elif fno == 2 and wt == 2:  # IntegerStatistics
            for f2, w2, v2 in _fields(v):
                if w2 == 0 and f2 == 1:
                    d["min"] = _zigzag(v2)
                elif w2 == 0 and f2 == 2:
                    d["max"] = _zigzag(v2)
        elif fno == 4 and wt == 2:  # StringStatistics
            for f2, w2, v2 in _fields(v):
                if w2 == 2 and f2 == 1:
                    d["min"] = bytes(v2).decode("utf-8", "replace")
                elif w2 == 2 and f2 == 2:
                    d["max"] = bytes(v2).decode("utf-8", "replace")
    return d


def stripe_column_stats(fobj, of) -> Optional[list]:
    """Parse the file's StripeStatistics: a list (one entry per
    stripe) of lists (one dict per ORC column id, id 0 = the root
    struct). Returns None when the section is absent, the codec is
    undecodable, or anything fails to parse — callers then simply
    don't prune."""
    try:
        meta_len = of.stripe_statistics_length
        if not meta_len:
            return None
        fobj.seek(0, 2)
        flen = fobj.tell()
        off = (flen - 1 - of.file_postscript_length
               - of.file_footer_length - meta_len)
        if off < 0:
            return None
        fobj.seek(off)
        raw = fobj.read(meta_len)
        buf = _decompress_section(raw, of.compression,
                                  of.compression_size)
        if buf is None:
            return None
        out = []
        for fno, wt, v in _fields(memoryview(buf)):
            if fno == 1 and wt == 2:  # one StripeStatistics
                cols = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 2:
                        cols.append(_parse_column_stats(v2))
                out.append(cols)
        return out or None
    except Exception:  # noqa: BLE001 — stats are an optimization:
        return None    # any parse trouble means "no pruning", never
                       # a failed read


def _subtree_size(t) -> int:
    import pyarrow as pa

    if pa.types.is_struct(t):
        return 1 + sum(_subtree_size(f.type) for f in t)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return 1 + _subtree_size(t.value_type)
    if pa.types.is_map(t):
        return 1 + _subtree_size(t.key_type) + _subtree_size(t.item_type)
    return 1


def top_level_column_ids(schema) -> dict:
    """Top-level PRIMITIVE field name → ORC column id (preorder over
    the type tree, root struct = 0). Integer and string fields only —
    the types the pruning policy compares."""
    import pyarrow as pa

    ids = {}
    cid = 1
    for f in schema:
        t = f.type
        if (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            ids[f.name] = cid
        cid += _subtree_size(t)
    return ids


def _stripe_may_match(cols, col_ids, flt, present, norm) -> bool:
    """Conservative per-stripe test for ONE pushed filter — the ORC
    twin of the parquet ``_rg_may_match`` (same keep-on-any-doubt
    rules)."""
    col_key, op, ref = flt
    j = None
    for name, cid in col_ids.items():
        if norm(name) == col_key:
            j = cid
            break
    if j is None or j >= len(cols):
        if col_key in present:
            return True   # present but unprunable
        return op == "isnull"  # absent: null-filled downstream
    st = cols[j]
    n = st.get("n")
    if op == "isnull":
        has_null = st.get("has_null")
        return has_null is not False  # unknown keeps the stripe
    if op == "isnotnull":
        return n != 0  # unknown (None) keeps the stripe
    mn, mx = st.get("min"), st.get("max")
    if mn is None or mx is None:
        # no comparable stats — EXCEPT the all-null stripe, which
        # provably fails every comparison
        return not (n == 0 and st.get("has_null") is not False)
    refs = ref if op == "in" else (ref,)
    possible = False
    for r in refs:
        if r is None:
            continue
        if not (isinstance(r, int) and not isinstance(r, bool)
                and isinstance(mn, int)) \
                and not (isinstance(r, str) and isinstance(mn, str)):
            return True  # incomparable: keep
        try:
            if op in ("eq", "in"):
                possible = possible or (mn <= r <= mx)
            elif op == "gt":
                possible = possible or (mx > r)
            elif op == "ge":
                possible = possible or (mx >= r)
            elif op == "lt":
                possible = possible or (mn < r)
            elif op == "le":
                possible = possible or (mn <= r)
            else:
                return True
        except TypeError:
            return True
        if possible:
            return True
    return possible


def prune_stripes(fobj, of, stripes, filters,
                  case_sensitive=False) -> list:
    """Drop stripe indices whose statistics PROVABLY fail a pushed
    filter. ``stripes`` is the pre-selected index list; returns a
    subset. Mirrors the parquet ``_stat_prune`` contract."""
    if not filters:
        return list(stripes)
    stats = stripe_column_stats(fobj, of)
    if stats is None:
        return list(stripes)

    def norm(n):
        return n if case_sensitive else n.lower()

    col_ids = top_level_column_ids(of.schema)
    present = {norm(f.name) for f in of.schema}
    flts = [(norm(c), op, ref) for c, op, ref in filters]
    out = []
    for i in stripes:
        if i >= len(stats):
            out.append(i)  # stats shorter than stripe list: keep
            continue
        if all(_stripe_may_match(stats[i], col_ids, f, present, norm)
               for f in flts):
            out.append(i)
    return out
