"""Executor-side (partition-local) cache resolve — the real-cluster
read path.

The driver-mode resolve (``CacheManager.resolve_for_spark``) hands
Spark concrete local paths out of the DRIVER's mirror — correct only
while every scan task can see that same mirror root (local[k], shared
NVMe/NFS). On a real multi-node cluster each node has its OWN
node-local mirror (the per-node singleton design of the reference —
every node's ``SidecarCachingFileSystem`` serves its own reads,
``SidecarCachingFileSystem.java:96-119,273-288``), so a driver-chosen
path is unreadable on any other machine and a task scheduled on an
unwarmed node would die with FileNotFoundException.

``CachedParquetSource`` moves the resolve into the scan task itself:

* ``partitions()`` (driver): ONE remote listing → one InputPartition
  per data file, plus the same file-level scan veto math as
  ``resolve_for_spark`` (a table bigger than the mirror floor must
  stream from remote on every node, not churn caches cluster-wide);
* ``read(partition)`` (executor): opens the node-local
  ``CacheManager.get_or_create`` singleton for the shipped cache root
  and resolves THIS file hit-or-materialize-or-remote against THAT
  node's mirror — an unwarmed node self-heals by materializing (a
  node-local fill, never a driver funnel), and a vetoed or failed
  fill streams the bytes straight from remote;
* self-heal against mid-scan eviction: the local copy is OPENED
  before use — a POSIX unlink after open leaves the fd readable, so
  an eviction racing the scan can never produce wrong bytes; a copy
  already gone at open time falls back to materialize-or-remote.

Scale shape: N files → N independent partitions, each task touching
exactly one file's bytes on its own node; the driver moves zero data
bytes. Batches cross into Spark as Arrow RecordBatches (the
DataSource API's vectorized path).

Trade-off vs driver mode (kept the default for local[k]): rows pass
through the Python worker as Arrow batches instead of the JVM-native
parquet scan, and the Python DataSource API gives no column pruning —
so this mode pays a per-byte toll for multi-node correctness. Use it
where it is the only correct choice (``sidecar.resolve.mode =
executor`` on real clusters with node-local cache roots).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_BATCH_ROWS = 65536


class _PageCachedFile:
    """Minimal file-object adapter so pyarrow's parquet reader can
    pull its ranged reads through the engine's page-granular
    ``CachingInputStream`` (pyarrow wraps any readable+seekable Python
    object via ``pa.PythonFile``)."""

    def __init__(self, stream):
        self._s = stream

    def read(self, n=-1):
        return self._s.read(n)

    def seek(self, pos, whence=0):
        if whence == 1:
            pos += self._s.tell()
        elif whence == 2:
            pos += self._s.length
        self._s.seek(pos)
        return pos

    def tell(self):
        return self._s.tell()

    def size(self):
        return self._s.length

    def readable(self):
        return True

    def seekable(self):
        return True

    def writable(self):
        return False

    def flush(self):
        pass

    def close(self):
        self._s.close()

    @property
    def closed(self):
        return self._s._closed


def _int96_leaves(pf) -> set:
    """Dotted parquet leaf paths stored as INT96 (nested included —
    ``st.ts``, ``arr.list.element``, ``mp.key_value.value``). Spark
    reads INT96 as TimestampType (an LTZ instant) REGARDLESS of the
    NTZ inference setting, while pyarrow decodes it tz-naive — those
    exact leaves must carry a UTC zone so the derived Spark type
    matches (the int64 micros are unchanged; INT96 stores UTC
    instants)."""
    try:
        ps = pf.schema
        return {ps.column(i).path for i in range(len(ps))
                if ps.column(i).physical_type == "INT96"}
    except Exception:  # noqa: BLE001 — coercion is best-effort
        return set()


def _target_type(t, path: str, int96: set):
    """Recursively derive the type Spark should see at this leaf
    path: ns coerced to µs (Spark has no ns precision and its Arrow
    bridge rejects timestamp[ns]), INT96 leaves zoned UTC, nested
    struct fields relaxed to nullable (FileFormat asNullable). Path
    segments follow parquet's naming for containers (``list.element``,
    ``key_value.key/value``) so the INT96 match is per-leaf exact."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        unit = "us" if t.unit == "ns" else t.unit
        tz = "UTC" if (t.tz is None and path in int96) else t.tz
        if unit != t.unit or tz != t.tz:
            return pa.timestamp(unit, tz=tz)
        return t
    if pa.types.is_list(t):
        return pa.list_(
            _target_type(t.value_type, path + ".list.element", int96))
    if pa.types.is_large_list(t):
        return pa.large_list(
            _target_type(t.value_type, path + ".list.element", int96))
    if pa.types.is_map(t):
        return pa.map_(
            _target_type(t.key_type, path + ".key_value.key", int96),
            _target_type(t.item_type, path + ".key_value.value", int96))
    if pa.types.is_struct(t):
        return pa.struct([
            pa.field(f.name,
                     _target_type(f.type, path + "." + f.name, int96),
                     True)
            for f in t])
    return t


def _arrow_target(pf):
    """The Arrow schema Spark should see for this parquet file:
    ns→µs, nested-nullable, INT96 zoned UTC (per leaf)."""
    import pyarrow as pa

    int96 = _int96_leaves(pf)
    return pa.schema([
        pa.field(f.name, _target_type(f.type, f.name, int96),
                 f.nullable)
        for f in pf.schema_arrow])


def _coerce_batches(pf, target):
    """iter_batches with schema coercion applied only when needed."""
    same = pf.schema_arrow.equals(target)
    for batch in pf.iter_batches(batch_size=_BATCH_ROWS):
        yield batch if same else batch.cast(target)


class _FilePart(InputPartition):
    def __init__(self, path: str, mtime: int, length: int, veto: bool,
                 parts=()):
        self.path = path
        self.mtime = mtime
        self.length = length
        self.veto = veto
        #: ((key, raw value), ...) hive partition segments of this file
        self.parts = tuple(parts)


def _read_file_batches(mgr, part: _FilePart):
    """Node-local hit-or-materialize-or-remote for ONE data file;
    yields Arrow RecordBatches. Runs inside the scan task (the caller
    applied the S3 endpoint override already — one authoritative
    site, ``_apply_endpoint``)."""
    import pyarrow.parquet as pq

    from sidecar_spark.cache.fs import FileStat

    fs, p = mgr._resolve(part.path)  # noqa: SLF001 — package-internal
    st = FileStat(path=p, length=part.length, mtime=part.mtime,
                  is_dir=False)
    handle = None
    hit = False
    if mgr.mirror is not None and mgr.is_cacheable_file(p, part.length):
        # EXISTING hits are served locally even under the veto — the
        # veto gates FILLS only (resolve_for_spark parity: "existing
        # hits are still served locally"); a warmed file must not
        # re-stream from remote just because the table grew
        local = mgr.mirror.lookup(p, part.mtime)
        if local is not None:
            try:
                # open BEFORE reading: once the fd exists, a racing
                # eviction's unlink cannot corrupt this scan (POSIX
                # keeps the inode alive)
                handle = open(local, "rb")
                hit = True
            except OSError:
                handle = None  # evicted between lookup and open
        if handle is None and not part.veto:
            try:
                # unwarmed node (or lookup-to-open eviction race):
                # self-heal by materializing — a node-local fill,
                # never an error and never a driver funnel (the
                # fetch_slice pattern inside the scan)
                local = mgr.mirror.materialize(fs, st)
                handle = open(local, "rb")
            except Exception:  # noqa: BLE001 — cache trouble never
                handle = None  # fails the read: stream from remote
        if handle is not None:
            # stats only after the copy is OPEN — a hit that failed
            # to serve bytes must not count as one
            if hit:
                mgr.stats.add("total_read_requests_from_data_cache")
                mgr.stats.add("total_bytes_read_data_cache", part.length)
            mgr.stats.add("total_bytes_read", part.length)
    if handle is not None:
        with handle:
            pf = pq.ParquetFile(handle, coerce_int96_timestamp_unit="us")
            yield from _coerce_batches(pf, _arrow_target(pf))
        return
    # remote stream (vetoed / excluded / fill failed): when the page
    # store is live, route the ranged reads through the node-local
    # CachingInputStream — a table too big to file-mirror still gets
    # PAGE-granular caching of exactly the ranges this node's tasks
    # touch (footers, hot column chunks), the reference's readInternal
    # serving a real Spark scan. Otherwise ranged reads straight from
    # the store.
    if mgr.pages is not None and mgr.pages.enabled:
        try:
            stream = mgr.open(p)
        except Exception:  # noqa: BLE001 — page path is best-effort
            stream = None
        if stream is not None:
            try:
                pf = pq.ParquetFile(_PageCachedFile(stream),
                                    coerce_int96_timestamp_unit="us")
                yield from _coerce_batches(pf, _arrow_target(pf))
                return
            finally:
                stream.close()
    mgr.stats.add("total_read_requests_from_remote")
    mgr.stats.add("total_bytes_read_remote", part.length)
    with fs.open_read(p) as f:
        pf = pq.ParquetFile(f, coerce_int96_timestamp_unit="us")
        yield from _coerce_batches(pf, _arrow_target(pf))


def _apply_endpoint(endpoint) -> None:
    """Every Python stage of this source (plan process, scan workers)
    runs OUTSIDE the driver process and does not inherit env vars set
    after the worker daemon forked — the S3 endpoint override must
    travel as an option and be re-applied per process (the same
    reused-worker rule warm_distributed's fetch_slice follows)."""
    if endpoint:
        import os

        os.environ["SIDECAR_S3_ENDPOINT"] = endpoint


def _finalize_batches(batches, schema, parts):
    """Conform every Arrow batch to the DECLARED schema, in declared
    order — the executor-side equivalent of how the JVM scan reads a
    whole table through ONE footer's schema:

    * hive partition columns are materialized from the directory
      values (a shadowed data column is overridden — directory wins,
      JVM semantics);
    * a column the declared schema has but this FILE lacks (schema
      evolution: the footer schema() sampled was newer/older) is
      null-filled, exactly as the JVM scan does without mergeSchema;
    * a column this file has but the schema lacks is dropped;
    * type drift casts to the declared type.

    Fast path: a batch already matching the declared names/types with
    no partition columns passes through untouched."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from sidecar_spark.cache.partitions import decode_key, decode_value

    part_vals = {decode_key(k): raw for k, raw in parts}
    targets = [(f.name, to_arrow_type(f.dataType)) for f in schema.fields]

    def part_scalar(name, at):
        val = decode_value(part_vals[name])
        if val is not None:
            if pa.types.is_integer(at):
                val = int(val)
            elif pa.types.is_floating(at):
                val = float(val)
        return pa.scalar(val, type=at)

    for batch in batches:
        names = batch.schema.names
        if not part_vals and names == [n for n, _ in targets]                 and all(batch.schema.field(i).type.equals(t)
                        for i, (_, t) in enumerate(targets)):
            yield batch
            continue
        arrays = []
        for name, at in targets:
            if name in part_vals:
                arrays.append(pa.repeat(part_scalar(name, at),
                                        batch.num_rows))
            elif name in names:
                col = batch.column(names.index(name))
                if not col.type.equals(at):
                    col = col.cast(at)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(batch.num_rows, type=at))
        yield pa.RecordBatch.from_arrays(
            arrays, names=[n for n, _ in targets])


def _filter_matches(raw: str, op: str, ref) -> bool:
    """Evaluate one pushed filter against a file's raw partition
    value. Conservative: any doubt (cast failure, unknown shape)
    returns True — pruning may only skip files that PROVABLY fail,
    and every filter stays residual for Spark anyway."""
    from sidecar_spark.cache.partitions import decode_value

    val = decode_value(raw)
    if op == "isnull":
        return val is None
    if op == "isnotnull":
        return val is not None
    if val is None:
        return False  # NULL fails every comparison
    refs = ref if op == "in" else (ref,)
    outcomes = []
    for r in refs:
        try:
            if isinstance(r, bool):
                v = val.lower() in ("true", "1")
            elif isinstance(r, int):
                v, r = int(val), r
            elif isinstance(r, float):
                v, r = float(val), r
            else:
                v, r = val, str(r)
        except ValueError:
            return True  # incomparable: keep the file
        if op in ("eq", "in"):
            outcomes.append(v == r)
        elif op == "gt":
            outcomes.append(v > r)
        elif op == "ge":
            outcomes.append(v >= r)
        elif op == "lt":
            outcomes.append(v < r)
        elif op == "le":
            outcomes.append(v <= r)
        else:
            return True
    return any(outcomes)


class CachedParquetReader(DataSourceReader):
    def __init__(self, options, schema=None):
        path = options.get("path")
        if not path:
            raise ValueError("sidecar_cached_parquet requires option 'path'")
        self.path = path
        self.conf_json = options.get("conf")
        if not self.conf_json:
            raise ValueError("sidecar_cached_parquet requires option 'conf'")
        self.endpoint = options.get("endpoint")
        self.schema = schema
        self._part_filters = []
        _apply_endpoint(self.endpoint)


    def _conf(self):
        from sidecar_spark.config import SidecarConfig

        return SidecarConfig.from_json(self.conf_json)

    def partitions(self):
        from sidecar_spark.cache.manager import CacheManager

        _apply_endpoint(self.endpoint)
        # keep-alive singleton (no release), like read(): the planner
        # process serves every later plan too — tearing the manager
        # down here would pay FileMirror._rebuild + adopt_disk (two
        # full cache-root walks) per query planned
        mgr = CacheManager.get_or_create(self._conf())
        files = mgr.list_files(self.path)
        veto = False
        if mgr.mirror is not None and mgr.mirror.capacity:
            admitted = sum(
                st.length for st in files
                if mgr.is_cacheable_file(st.path, st.length))
            floor = (mgr.mirror.capacity
                     * mgr.conf.eviction_stop_occupancy)
            if admitted > floor:
                # same veto as resolve_for_spark: a table bigger
                # than the mirror floor is not FILLED on any node
                # (existing hits still serve locally in read())
                veto = True
                mgr.stats.add("total_scans_detected")
        from sidecar_spark.cache.partitions import partition_spec

        _, root = mgr._resolve(self.path)  # noqa: SLF001
        out = []
        for st in files:
            spec = partition_spec(root, st.path)
            if spec and self._part_filters:
                from sidecar_spark.cache.partitions import decode_key

                keys = {decode_key(k): v for k, v in spec}
                if not all(_filter_matches(keys[col], op, ref)
                           for col, op, ref in self._part_filters
                           if col in keys):
                    continue  # pruned: provably outside the predicate
            out.append(_FilePart(st.path, st.mtime, st.length, veto,
                                 parts=spec))
        return out

    def read(self, part: _FilePart):
        from sidecar_spark.cache.manager import CacheManager

        _apply_endpoint(self.endpoint)
        # worker-lifetime singleton, exactly like fetch_slice /
        # mirror_slice: get_or_create with no release — the node-local
        # manager outlives the task, serving every later scan's hits
        mgr = CacheManager.get_or_create(self._conf())
        batches = _read_file_batches(mgr, part)
        if self.schema is not None:
            batches = _finalize_batches(batches, self.schema,
                                        part.parts)
        yield from batches


class PruningCachedParquetReader(CachedParquetReader):
    """CachedParquetReader + pushFilters-based partition pruning.

    Split into a subclass because Spark 4.1 HARD-FAILS any reader that
    defines pushFilters while spark.sql.python.filterPushdown.enabled
    is false — the source picks this variant only when the session
    conf (shipped as the "pushdown" option) allows it."""

    def pushFilters(self, filters):
        """Partition pruning — the one pushdown that matters at 100 TB
        for this source: a filter on a hive partition column skips the
        non-matching FILES at planning time, so their bytes are never
        listed into partitions (the JVM scan's PartitionFilters
        equivalent). Every filter is also returned to Spark as
        residual, so pruning can only ever skip provably-non-matching
        files — acceptance here is optimistic (any single-column
        filter), and partitions() applies only those naming actual
        partition keys."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = [(EqualTo, "eq"), (In, "in"), (GreaterThan, "gt"),
               (GreaterThanOrEqual, "ge"), (LessThan, "lt"),
               (LessThanOrEqual, "le"), (IsNull, "isnull"),
               (IsNotNull, "isnotnull")]
        for f in filters:
            try:
                attr = f.attribute
                if isinstance(attr, tuple) and len(attr) == 1:
                    for cls, op in ops:
                        if type(f) is cls:
                            # In's field is `value` (a tuple) —
                            # NOT `values`; a wrong attribute here
                            # silently disables IN pruning
                            ref = (tuple(f.value) if op == "in" else
                                   getattr(f, "value", None))
                            self._part_filters.append(
                                (attr[0], op, ref))
                            break
            except Exception:  # noqa: BLE001 — pruning is best-effort
                pass
            yield f  # residual: Spark re-evaluates everything


class CachedParquetSource(DataSource):
    """``spark.read.format("sidecar_cached_parquet")
    .option("path", uri).option("conf", conf.to_json()).load()`` —
    wired automatically by ``Engine.read_parquet`` when
    ``sidecar.resolve.mode = executor``."""

    @classmethod
    def name(cls) -> str:
        return "sidecar_cached_parquet"

    def schema(self):
        """Schema from the first data file's footer, read through the
        cache fs (driver-side metadata only — no data bytes)."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from sidecar_spark.cache.manager import CacheManager
        from sidecar_spark.config import SidecarConfig

        _apply_endpoint(self.options.get("endpoint"))
        path = self.options.get("path")
        conf = SidecarConfig.from_json(self.options["conf"])
        # keep-alive singleton (no release) — see partitions()
        mgr = CacheManager.get_or_create(conf)
        files = mgr.list_files(path)
        if not files:
            raise FileNotFoundError(f"no data files under {path!r}")
        # deterministic footer pick: FIRST file by path, matching the
        # JVM scan's choice under schema evolution (a listing in OS
        # order sampled a different file and diverged the schema)
        files = sorted(files, key=lambda s: s.path)
        fs, p = mgr._resolve(files[0].path)
        local = (mgr.mirror.lookup(p, files[0].mtime)
                 if mgr.mirror is not None else None)
        if local is not None:
            # mirror-first: a warmed table's schema costs zero
            # remote requests
            arrow_schema = _arrow_target(pq.ParquetFile(
                local, coerce_int96_timestamp_unit="us"))
        else:
            with fs.open_read(p) as f:
                arrow_schema = _arrow_target(pq.ParquetFile(
                    f, coerce_int96_timestamp_unit="us"))
        # match the JVM parquet reader's NTZ inference (tz-less
        # parquet timestamps read as timestamp_ntz when
        # spark.sql.parquet.inferTimestampNTZ.enabled, default true) —
        # the two resolve modes must yield identical schemas. The
        # Engine ships the session's setting as an option because this
        # code runs in the plan worker process, which has no active
        # session; the probe below covers direct format() use from the
        # driver, and the Spark default covers everything else.
        ntz_opt = self.options.get("ntz")
        if ntz_opt is not None:
            ntz = str(ntz_opt).lower() == "true"
        else:
            ntz = True
            try:
                from pyspark.sql import SparkSession

                active = SparkSession.getActiveSession()
                if active is not None:
                    ntz = (active.conf.get(
                        "spark.sql.parquet.inferTimestampNTZ.enabled",
                        "true").lower() == "true")
            except Exception:  # noqa: BLE001 — keep the default
                pass
        base = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=ntz)
        # Spark's file sources relax every read schema to nullable
        # (FileFormat asNullable) — a required parquet field must not
        # make the two resolve modes' schemas differ
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        base = _ST([_SF(f.name, f.dataType, True, f.metadata)
                    for f in base.fields])
        # hive partition columns live in the DIRECTORY names, not the
        # files — append them (typed per the same int → bigint →
        # double → string ladder Spark's partition discovery uses) so
        # both resolve modes expose identical schemas
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from sidecar_spark.cache.partitions import (
            infer_partition_types,
            partition_spec,
        )

        # direct type map — _parse_datatype_string needs a live
        # SparkContext, which the plan worker process does not have
        type_map = {"int": IntegerType(), "bigint": LongType(),
                    "double": DoubleType(), "string": StringType()}
        _, p_root = mgr._resolve(path)  # noqa: SLF001
        specs = [partition_spec(p_root, st.path) for st in files]
        inferred = infer_partition_types(specs)
        shadowed = {k: type_map[ddl] for k, ddl in inferred
                    if k in {f.name for f in base.fields}}
        if shadowed:
            # a data column with a partition key's name: the JVM scan
            # serves the DIRECTORY value with the partition-inferred
            # type at the file position — mirror that in the schema
            base = StructType([
                StructField(f.name, shadowed.get(f.name, f.dataType),
                            True)
                for f in base.fields])
        part_fields = [
            StructField(k, type_map[ddl])
            for k, ddl in inferred
            if k not in {f.name for f in base.fields}]
        if part_fields:
            base = StructType(list(base.fields) + part_fields)
        return base

    def reader(self, schema) -> CachedParquetReader:
        # the pruning variant defines pushFilters, which Spark 4.1
        # hard-rejects while spark.sql.python.filterPushdown.enabled
        # is false — the Engine ships the session conf's query-time
        # value as the "pushdown" option
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return PruningCachedParquetReader(self.options, schema)
        return CachedParquetReader(self.options, schema)
