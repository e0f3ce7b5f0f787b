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


#: micros of 1900-01-01T00:00:00Z — Spark's ancient-TIMESTAMP
#: threshold for rebase-mode checks (probed: EXCEPTION errors on a
#: 1800 LTZ value even though dates only error before 1582-10-15;
#: the JVM's julian→gregorian micros tables extend to 1900 because
#: pre-1900 zone offsets were LMT-based)
TS_1900_US = ((datetime.date(1900, 1, 1).toordinal() - _EPOCH_ORD)
              * _US_PER_DAY)


def rebase_array(arr, dates: bool, ts_plain: bool, ts_int96: bool,
                 int96_cols=frozenset(), name: str = "",
                 ntz_exempt: bool = False):
    """Rebase one Arrow array (recursing into list/struct), per-kind
    flags: ``dates`` rebases date32 (parquet: when legacyDateTime;
    ORC: ALWAYS — hybrid is the format semantic, probed), ``ts_plain``
    rebases non-INT96 timestamps, ``ts_int96`` those whose dotted
    path is in ``int96_cols``. Values at/after the 1582 switch pass
    through untouched — the fast path returns the input array
    unchanged when nothing is ancient. ``ntz_exempt`` skips tz-NAIVE
    timestamps outside ``int96_cols``: those read as TIMESTAMP_NTZ,
    and the JVM NEVER rebases NTZ (probed: a LEGACY-written file
    stores NTZ columns proleptic-raw while rebasing its date and LTZ
    columns; rebase eligibility follows the CATALYST type — with NTZ
    inference off the same naive column reads as LTZ and IS
    rebased)."""
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
        if name in int96_cols:
            flag = ts_int96
        elif t.tz is None and ntz_exempt:
            flag = False  # reads as TIMESTAMP_NTZ — never rebased
        else:
            flag = ts_plain
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
        flat = rebase_array(src, dates, ts_plain, ts_int96, int96_cols,
                            name, ntz_exempt)
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
                             else t.field(i).name, ntz_exempt)
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
        out = rebase_array(lv, dates, ts_plain, ts_int96, int96_cols,
                           name, ntz_exempt)
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


def _norm_leaf(path: str) -> str:
    """FALLBACK normalization (string surgery) for a parquet dotted
    leaf path → rebase-recursion name: list levels contribute no
    segment and map entries drop the synthetic ``key_value`` level.
    Used only when the structural walk below can't parse the group
    tree — a genuine struct field named ``list``/``key_value`` would
    be mangled here, which is why ``_recursion_names`` (structural,
    ADVICE r7 #4) is consulted first."""
    return (path.replace(".list.element", "")
                .replace(".key_value.", "."))


def _recursion_names(pf, leaves):
    """Normalize parquet leaf paths to rebase-recursion names
    STRUCTURALLY (walking the actual group tree, so only genuine
    repeated/map container levels drop out); falls back to the
    anchored string replace per-leaf when the tree is unparseable."""
    try:
        from sidecar_spark.sources.cached_parquet import (
            _leaf_recursion_names,
        )

        m = _leaf_recursion_names(pf)
    except Exception:  # noqa: BLE001 — dump parse trouble: fall back
        m = None
    if m is None:
        return frozenset(_norm_leaf(p) for p in leaves)
    return frozenset(m.get(p, _norm_leaf(p)) for p in leaves)


def _raise_if_ancient(arr, dt_exc: bool, i96_exc: bool, int96_cols,
                      ntz_exempt: bool, name: str, path: str):
    """EXCEPTION rebase mode: fail the read when a rebase-eligible
    column holds an ancient value, like the JVM's
    SparkUpgradeException (INCONSISTENT_BEHAVIOR_CROSS_VERSION.
    READ_ANCIENT_DATETIME). Thresholds probed: dates before
    1582-10-15; timestamps before 1900-01-01T00:00:00Z (a 1800 LTZ
    value errors even though it needs no 1582 rebase). NTZ columns
    are exempt (probed: an ancient NTZ-only file reads fine)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _msg(kind):
        return (f"reading ancient {kind} values from {path!r} "
                f"(column {name!r}) is ambiguous: the writer's "
                "calendar is unknown (no Spark footer marker). Set "
                "spark.sql.parquet.datetimeRebaseModeInRead (or "
                "int96RebaseModeInRead) to CORRECTED to read them as "
                "proleptic Gregorian, or LEGACY to rebase from the "
                "hybrid Julian calendar — the JVM scan raises "
                "SparkUpgradeException READ_ANCIENT_DATETIME here "
                "too.")

    t = arr.type
    if pa.types.is_date32(t):
        if dt_exc and len(arr):
            days = arr.cast(pa.int32())
            if pc.any(pc.less(days, GREG_SWITCH_DAY)).as_py():
                raise ValueError(_msg("date"))
        return
    if pa.types.is_timestamp(t):
        if name in int96_cols:
            exc = i96_exc
        elif t.tz is None and ntz_exempt:
            exc = False  # TIMESTAMP_NTZ — never checked
        else:
            exc = dt_exc
        if exc and len(arr):
            unit_per_day = {"s": 86_400, "ms": 86_400_000,
                            "us": _US_PER_DAY,
                            "ns": 86_400_000_000_000}[t.unit]
            bound = TS_1900_US // _US_PER_DAY * unit_per_day
            ints = arr.cast(pa.int64())
            if pc.any(pc.less(ints, bound)).as_py():
                raise ValueError(_msg("timestamp"))
        return
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        _raise_if_ancient(arr.flatten(), dt_exc, i96_exc, int96_cols,
                          ntz_exempt, name, path)
        return
    if pa.types.is_struct(t):
        for i in range(t.num_fields):
            kid = f"{name}.{t.field(i).name}" if name else t.field(i).name
            _raise_if_ancient(arr.field(i), dt_exc, i96_exc,
                              int96_cols, ntz_exempt, kid, path)
        return
    if pa.types.is_map(t):
        _raise_if_ancient(arr.keys, dt_exc, i96_exc, int96_cols,
                          ntz_exempt, f"{name}.key", path)
        _raise_if_ancient(arr.items, dt_exc, i96_exc, int96_cols,
                          ntz_exempt, f"{name}.value", path)
        return


def rebase_batches(batches, pf, int96_leaves, dt_conf="CORRECTED",
                   i96_conf="CORRECTED", ntz_infer=True,
                   path: str = ""):
    """Wrap a batch iterator with the rebase mode the JVM scan would
    pick for this file (probed, Spark 4.1):

    - footer marker ``org.apache.spark.legacyDateTime`` /
      ``legacyINT96`` → LEGACY (rebase), regardless of session confs;
    - else footer has ``org.apache.spark.version`` (Spark 3+/4
      default writes) → CORRECTED (pass through), regardless of
      session confs;
    - else (non-Spark writer, e.g. pyarrow) → the session's
      ``spark.sql.parquet.datetimeRebaseModeInRead`` /
      ``int96RebaseModeInRead`` (both default CORRECTED): LEGACY
      rebases, EXCEPTION fails the read on ancient values
      (dates < 1582-10-15, LTZ timestamps < 1900-01-01Z).

    NTZ columns are exempt from every mode — eligibility follows the
    CATALYST type, so ``ntz_infer=False`` (inference disabled) makes
    tz-naive columns LTZ and rebase-eligible again (probed)."""
    import pyarrow as pa

    km = pf.metadata.metadata or {}
    spark_written = b"org.apache.spark.version" in km
    dt_mode = ("LEGACY" if b"org.apache.spark.legacyDateTime" in km
               else "CORRECTED" if spark_written else dt_conf)
    i96_mode = ("LEGACY" if b"org.apache.spark.legacyINT96" in km
                else "CORRECTED" if spark_written else i96_conf)
    if dt_mode == "CORRECTED" and i96_mode == "CORRECTED":
        yield from batches
        return
    # dotted leaf paths normalized to the recursion's naming, so
    # nested INT96 columns (inside structs, lists, maps) match too —
    # structurally (genuine fields named 'list'/'key_value' survive)
    int96_cols = _recursion_names(pf, int96_leaves)
    dt_leg = dt_mode == "LEGACY"
    i96_leg = i96_mode == "LEGACY"
    any_exc = "EXCEPTION" in (dt_mode, i96_mode)
    for batch in batches:
        if not any(_has_temporal(f.type) for f in batch.schema):
            yield batch
            continue
        if any_exc:
            for i in range(batch.num_columns):
                _raise_if_ancient(batch.column(i),
                                  dt_mode == "EXCEPTION",
                                  i96_mode == "EXCEPTION",
                                  int96_cols, ntz_infer,
                                  batch.schema.names[i], path)
        if not (dt_leg or i96_leg):
            yield batch
            continue
        arrays = [rebase_array(batch.column(i), dt_leg, dt_leg,
                               i96_leg, int96_cols,
                               batch.schema.names[i],
                               ntz_exempt=ntz_infer)
                  for i in range(batch.num_columns)]
        yield pa.RecordBatch.from_arrays(arrays,
                                         schema=batch.schema)
