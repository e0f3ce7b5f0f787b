"""Julian→proleptic-Gregorian rebase for LEGACY-written parquet.

Spark ≤2.x (and 3+/4 with ``datetimeRebaseModeInWrite=LEGACY``) wrote
dates/timestamps as day counts in the HYBRID calendar (Julian before
1582-10-15, Gregorian after) and stamps the footer with
``org.apache.spark.legacyDateTime`` / ``org.apache.spark.legacyINT96``.
The JVM scan rebases those on read; pyarrow decodes the raw counts as
proleptic Gregorian — a silent +0..+10-day drift for ancient values
(probed: stored julian 1500-01-01 reads as proleptic 1500-01-10; the
year-200 row matches because the calendars coincide there).

Rebase rule (Spark's ``RebaseDateTime.rebaseJulianToGregorianDays``):
interpret the stored day count as a JULIAN-calendar date and return
the proleptic day count of that same y-m-d. Julian leap days that
don't exist proleptically (e.g. julian 1500-02-29) roll to March 1,
Spark's own resolution. Identity at/after 1582-10-15 (stored day
``>= GREG_SWITCH_DAY``) — the calendars agree from there on.

Timestamps rebase their DAY component and keep the time-of-day
(probed: wall time preserved exactly across the shift under a UTC
session; pre-1582 era has no DST, and this engine pins rebases to the
UTC day boundary — the same result the JVM produces with a UTC
default zone, the only configuration this sandbox can probe).
"""

from __future__ import annotations

import datetime
from functools import lru_cache

#: proleptic days-since-1970 of 1582-10-15, the Julian→Gregorian
#: switch: stored day counts at/after this are identity
GREG_SWITCH_DAY = (datetime.date(1582, 10, 15).toordinal()
                   - datetime.date(1970, 1, 1).toordinal())

_EPOCH_ORD = datetime.date(1970, 1, 1).toordinal()
_US_PER_DAY = 86_400_000_000


def _jdn_to_julian(jdn: int):
    """Julian Day Number → (y, m, d) in the JULIAN calendar
    (standard arithmetic conversion)."""
    c = jdn + 32082
    d = (4 * c + 3) // 1461
    e = c - (1461 * d) // 4
    m = (5 * e + 2) // 153
    day = e - (153 * m + 2) // 5 + 1
    month = m + 3 - 12 * (m // 10)
    year = d - 4800 + m // 10
    return year, month, day


@lru_cache(maxsize=4096)
def rebase_julian_day(n: int) -> int:
    """One stored day count (days since 1970, hybrid-calendar) → the
    proleptic day count the JVM scan serves. Identity at/after the
    1582-10-15 switch."""
    if n >= GREG_SWITCH_DAY:
        return n
    y, m, d = _jdn_to_julian(n + 2440588)  # 1970-01-01 = JDN 2440588
    try:
        return datetime.date(y, m, d).toordinal() - _EPOCH_ORD
    except ValueError:
        # julian leap day with no proleptic twin (1500-02-29 —
        # julian leaps every 4 years, gregorian skips centuries):
        # Spark rolls it to March 1
        return datetime.date(y, 3, 1).toordinal() - _EPOCH_ORD


def rebase_micros(us: int) -> int:
    """Rebase one int64 microsecond timestamp: shift the (UTC) day
    component, keep the time-of-day."""
    day, tod = divmod(us, _US_PER_DAY)
    if day >= GREG_SWITCH_DAY:
        return us
    return rebase_julian_day(day) * _US_PER_DAY + tod


def rebase_array(arr, dates: bool, ts_plain: bool, ts_int96: bool,
                 int96_cols=frozenset(), name: str = ""):
    """Rebase one Arrow array (recursing into list/struct), per-kind
    flags: ``dates`` rebases date32 (parquet: when legacyDateTime;
    ORC: ALWAYS — hybrid is the format semantic, probed), ``ts_plain``
    rebases non-INT96 timestamps, ``ts_int96`` those whose dotted
    path is in ``int96_cols``. Values at/after the 1582 switch pass
    through untouched — the fast path returns the input array
    unchanged when nothing is ancient."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_date32(t) and dates:
        days = arr.cast(pa.int32())
        anc = pc.any(pc.less(days, GREG_SWITCH_DAY)).as_py()
        if not anc:
            return arr
        vals = [None if v is None
                else rebase_julian_day(v)
                for v in days.to_pylist()]
        return pa.array(vals, type=pa.int32()).cast(pa.date32())
    if pa.types.is_timestamp(t):
        flag = ts_int96 if name in int96_cols else ts_plain
        if not flag:
            return arr
        unit_per_day = {"s": 86_400, "ms": 86_400_000,
                        "us": _US_PER_DAY,
                        "ns": 86_400_000_000_000}[t.unit]
        ints = arr.cast(pa.int64())
        anc = pc.any(pc.less(
            ints, GREG_SWITCH_DAY * unit_per_day)).as_py()
        if not anc:
            return arr
        vals = []
        for v in ints.to_pylist():
            if v is None:
                vals.append(None)
            elif t.unit == "ns":
                vals.append(rebase_micros(v // 1000) * 1000
                            + v % 1000)
            else:
                to_us = _US_PER_DAY // unit_per_day  # s→1e6, ms→1e3
                vals.append(rebase_micros(v * to_us) // to_us)
        return pa.array(vals, type=pa.int64()).cast(t)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        src = arr.flatten()
        flat = rebase_array(src, dates, ts_plain, ts_int96, int96_cols)
        if flat is src:
            return arr
        import pyarrow.compute as _pc

        off = arr.offsets
        if off.null_count:
            off = _pc.fill_null_backward(_pc.fill_null_forward(off))
        base = off[0].as_py() or 0
        if base:
            off = _pc.subtract(off, base)
        cls = (pa.LargeListArray if pa.types.is_large_list(t)
               else pa.ListArray)
        return cls.from_arrays(off.cast(
            pa.int64() if pa.types.is_large_list(t) else pa.int32()),
            flat, mask=arr.is_null())
    if pa.types.is_struct(t):
        srcs = [arr.field(i) for i in range(t.num_fields)]
        kids = [rebase_array(s, dates, ts_plain, ts_int96, int96_cols,
                             f"{name}.{t.field(i).name}" if name
                             else t.field(i).name)
                for i, s in enumerate(srcs)]
        if all(k is s for k, s in zip(kids, srcs)):
            return arr
        return pa.StructArray.from_arrays(
            kids, fields=list(t), mask=arr.is_null())
    if pa.types.is_map(t):
        # rebase inside map entries via the list<struct<key,value>>
        # view (the _conform_array pattern); identity when nothing
        # inside is temporal
        entries = pa.list_(pa.struct([
            pa.field("key", t.key_type, False),
            pa.field("value", t.item_type)]))
        lv = arr.cast(entries)
        out = rebase_array(lv, dates, ts_plain, ts_int96, int96_cols)
        if out is lv:
            return arr
        vals = out.values
        if vals.null_count == 0 and vals.buffers()[0] is not None:
            vals = pa.StructArray.from_arrays(
                [vals.field(i) for i in range(vals.type.num_fields)],
                fields=list(vals.type))
        return pa.Array.from_buffers(
            t, len(out), out.buffers()[:2],
            null_count=out.null_count, children=[vals])
    return arr


def has_date(t) -> bool:
    """True when the type contains a date32 anywhere (the ORC
    always-rebase gate)."""
    import pyarrow as pa

    if pa.types.is_date32(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return has_date(t.value_type)
    if pa.types.is_map(t):
        return has_date(t.key_type) or has_date(t.item_type)
    if pa.types.is_struct(t):
        return any(has_date(f.type) for f in t)
    return False


def _has_temporal(t) -> bool:
    import pyarrow as pa

    if pa.types.is_date32(t) or pa.types.is_timestamp(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_temporal(t.value_type)
    if pa.types.is_map(t):
        return _has_temporal(t.key_type) or _has_temporal(t.item_type)
    if pa.types.is_struct(t):
        return any(_has_temporal(f.type) for f in t)
    return False


def rebase_batches(batches, pf, int96_leaves):
    """Wrap a batch iterator with legacy rebase when (and only when)
    the file footer carries Spark's legacy markers. Files without
    the markers — everything written by Spark 3+/4 defaults or by
    non-Spark writers — pass through with zero overhead (probed:
    the JVM reads those proleptic-raw, same as pyarrow)."""
    import pyarrow as pa

    km = pf.metadata.metadata or {}
    legacy_dt = b"org.apache.spark.legacyDateTime" in km
    legacy_96 = b"org.apache.spark.legacyINT96" in km
    if not (legacy_dt or legacy_96):
        yield from batches
        return
    # dotted leaf paths; struct recursion rebuilds the same dotted
    # form, so nested INT96 columns match their own flag too
    int96_cols = frozenset(int96_leaves)
    for batch in batches:
        if not any(_has_temporal(f.type) for f in batch.schema):
            yield batch
            continue
        arrays = [rebase_array(batch.column(i), legacy_dt, legacy_dt,
                               legacy_96, int96_cols,
                               batch.schema.names[i])
                  for i in range(batch.num_columns)]
        yield pa.RecordBatch.from_arrays(arrays,
                                         schema=batch.schema)
