"""Two-PROCESS cache races — the closest this sandbox gets to the
executor deployment: separate Python interpreters sharing one cache
root against one remote, doing concurrent resolve / warm / evict
(reference concurrency shape:
``TestCachingFileSystemMultithreadedBase.java:92-95``, lifted from
threads to processes so no locks are shared).

What must hold with zero coordination:

* every read — from either process, whichever tier served it — returns
  the exact remote bytes (zero corrupt reads);
* the content-addressed mirror converges to ONE copy per (path, mtime)
  with no ``.tmp-`` leftovers (tmp + atomic ``os.replace`` publish);
* a process discovering the other's fill adopts it instead of
  re-fetching (out-of-band adoption, ``FileMirror.lookup``), and its
  size accounting matches the bytes actually on disk;
* the ResultCache's atomic entry publish never serves a half-written
  entry to a concurrent reader.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FILES = 8
FILE_LEN = 64 * 1024


def _content(i: int) -> bytes:
    # offset-derived oracle, distinct per file (FIXTURES.md style)
    return bytes((i * 7 + j) % 256 for j in range(FILE_LEN))


def _make_remote(remote_dir: str, n: int = N_FILES) -> None:
    for i in range(n):
        with open(os.path.join(remote_dir, f"f{i}.parquet"), "wb") as f:
            f.write(_content(i))


def _run_worker(code: str, *args: str,
                timeout: float = 120.0) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code), *args],
        capture_output=True, text=True, timeout=timeout, env=env)


#: resolve the remote through a FRESH interpreter's CacheManager,
#: verify every resolved file's bytes against the oracle, dump stats
RESOLVE_WORKER = """
import json, os, sys
sys.path.insert(0, os.environ["PYTHONPATH"])
from sidecar_spark.cache.manager import CacheManager
from sidecar_spark.config import SidecarConfig

cache_dir, remote_dir, rounds, cap = sys.argv[1:5]
conf = SidecarConfig.create(cache_dir=cache_dir, data_cache_type="file",
                            data_cache_size=int(cap),
                            cache_persistent=False)
mgr = CacheManager.get_or_create(conf)
file_len = %d
corrupt = 0
# per-FILE resolves: a whole-dir resolve of an over-capacity table is
# scan-vetoed (no fills); resolving file-by-file keeps each fill
# admitted so the eviction-pressure variant really churns the mirror
def resolve_all():
    out = []
    for name in sorted(os.listdir(remote_dir)):
        out.extend(mgr.resolve_for_spark(os.path.join(remote_dir, name)))
    return out

for _ in range(int(rounds)):
    for p in resolve_all():
        i = int(os.path.basename(p).rsplit("f", 1)[-1].split(".")[0])
        try:
            with open(p, "rb") as f:
                data = f.read()
        except OSError:
            # the OTHER process evicted this mirror copy between our
            # resolve and open: a miss, not corruption — the engine's
            # contract is self-heal to remote, mirror that here
            with open(os.path.join(remote_dir,
                                   "f%%d.parquet" %% i), "rb") as f:
                data = f.read()
        want = bytes((i * 7 + j) %% 256 for j in range(file_len))
        if data != want:
            corrupt += 1
print(json.dumps({
    "corrupt": corrupt,
    "remote_reqs": mgr.stats.get("total_read_requests_from_remote"),
    "cache_reqs": mgr.stats.get("total_read_requests_from_data_cache"),
    "mirror_size": mgr.mirror.size_bytes(),
}))
mgr.close(save=False)
""" % FILE_LEN


class TestTwoProcessMirror:
    def test_concurrent_resolve_two_processes(self, cache_dir, remote_dir):
        """Both interpreters resolve the same cold table at once:
        all reads correct, the shared mirror converges to one copy
        per file, and both processes' accounting matches disk."""
        _make_remote(remote_dir)
        cap = str(N_FILES * FILE_LEN * 4)  # ample: no eviction here
        procs = [subprocess.Popen(
            [sys.executable, "-c", RESOLVE_WORKER,
             cache_dir, remote_dir, "3", cap],
            stdout=subprocess.PIPE, text=True,
            env=dict(os.environ, PYTHONPATH=REPO)) for _ in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=120)
            assert p.returncode == 0
            outs.append(json.loads(out.strip().splitlines()[-1]))
        for o in outs:
            assert o["corrupt"] == 0
            # each process fetched at most all N files itself; with
            # adoption, later rounds were all cache hits
            assert o["remote_reqs"] <= N_FILES
            assert o["cache_reqs"] >= N_FILES  # rounds 2+ fully local
        mroot = os.path.join(cache_dir, "mirror")
        names = os.listdir(mroot)
        assert not [n for n in names if ".tmp-" in n]
        assert len(names) == N_FILES  # one copy per file, both procs
        disk = sum(os.path.getsize(os.path.join(mroot, n)) for n in names)
        assert disk == N_FILES * FILE_LEN
        # each process's occupancy figure equals what is on disk —
        # the adoption/materialize race does not double-count
        for o in outs:
            assert o["mirror_size"] == disk

    def test_third_process_adopts_with_zero_fetches(self, cache_dir,
                                                    remote_dir):
        """A process arriving AFTER another's warm serves everything
        via out-of-band adoption: zero remote requests."""
        _make_remote(remote_dir)
        cap = str(N_FILES * FILE_LEN * 4)
        first = _run_worker(RESOLVE_WORKER, cache_dir, remote_dir, "1", cap)
        assert first.returncode == 0, first.stderr[-500:]
        second = _run_worker(RESOLVE_WORKER, cache_dir, remote_dir, "1", cap)
        assert second.returncode == 0, second.stderr[-500:]
        o = json.loads(second.stdout.strip().splitlines()[-1])
        assert o["corrupt"] == 0
        assert o["remote_reqs"] == 0
        assert o["cache_reqs"] == N_FILES

    def test_concurrent_resolve_under_eviction_pressure(
            self, cache_dir, remote_dir):
        """Capacity holds ~3 of 8 files: both processes loop resolve,
        so each is constantly evicting what the other just filled or
        adopted. Every read must still return exact bytes (a reader
        holds its resolved path across the other's eviction — POSIX
        unlink keeps open/readable files alive; a MISSED file
        self-heals to the remote path) and tmp leftovers must not
        accumulate."""
        _make_remote(remote_dir)
        cap = str(3 * FILE_LEN)
        procs = [subprocess.Popen(
            [sys.executable, "-c", RESOLVE_WORKER,
             cache_dir, remote_dir, "5", cap],
            stdout=subprocess.PIPE, text=True,
            env=dict(os.environ, PYTHONPATH=REPO)) for _ in range(2)]
        for p in procs:
            out, _ = p.communicate(timeout=180)
            assert p.returncode == 0
            o = json.loads(out.strip().splitlines()[-1])
            assert o["corrupt"] == 0  # the headline invariant
        mroot = os.path.join(cache_dir, "mirror")
        assert not [n for n in os.listdir(mroot) if ".tmp-" in n]


RESULT_STORE_WORKER = """
import json, os, sys, time
sys.path.insert(0, os.environ["PYTHONPATH"])
from sidecar_spark.cache.results import ResultCache

root, key, payload_char = sys.argv[1:4]
rc = ResultCache(root)

def write_fn(data_dir):
    os.makedirs(data_dir, exist_ok=True)
    # slow multi-chunk write: forces real overlap between writers
    with open(os.path.join(data_dir, "part-0"), "wb") as f:
        for _ in range(20):
            f.write(payload_char.encode() * 4096)
            f.flush()
            time.sleep(0.01)

data = rc.store(key, write_fn, "SELECT 1")
with open(os.path.join(data, "part-0"), "rb") as f:
    blob = f.read()
ok = len(blob) == 20 * 4096 and len(set(blob)) == 1
print(json.dumps({"ok": ok, "served": chr(blob[0])}))
"""

RESULT_POLL_WORKER = """
import json, os, sys, time
sys.path.insert(0, os.environ["PYTHONPATH"])
from sidecar_spark.cache.results import ResultCache

root, key = sys.argv[1:3]
rc = ResultCache(root)
half_reads = 0
hits = 0
deadline = time.time() + 30
while time.time() < deadline:
    d = rc.lookup(key)
    if d is not None:
        hits += 1
        with open(os.path.join(d, "part-0"), "rb") as f:
            blob = f.read()
        if len(blob) != 20 * 4096 or len(set(blob)) != 1:
            half_reads += 1
        if hits >= 50:
            break
    time.sleep(0.005)
print(json.dumps({"hits": hits, "half_reads": half_reads}))
"""


class TestTwoProcessResultCache:
    def test_concurrent_same_key_store(self, cache_dir):
        """Two processes store the SAME key simultaneously with slow
        overlapping writes. Each must be served a complete,
        single-writer payload (never an interleaving), and the final
        state is exactly one published entry with no staging dirs."""
        root = os.path.join(cache_dir, "results")
        key = "deadbeef" * 4
        procs = [subprocess.Popen(
            [sys.executable, "-c", textwrap.dedent(RESULT_STORE_WORKER),
             root, key, ch],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=dict(os.environ, PYTHONPATH=REPO)) for ch in ("A", "B")]
        served = []
        for p in procs:
            out, err = p.communicate(timeout=120)
            assert p.returncode == 0, err[-500:]
            o = json.loads(out.strip().splitlines()[-1])
            assert o["ok"], "served a torn/interleaved payload"
            served.append(o["served"])
        assert set(served) <= {"A", "B"}
        entries = os.listdir(root)
        assert key in entries
        assert not [e for e in entries if ".tmp-" in e]
        rc_meta = os.path.join(root, key, "entry.json")
        assert os.path.exists(rc_meta)
        # the published entry itself is complete
        with open(os.path.join(root, key, "data", "part-0"), "rb") as f:
            blob = f.read()
        assert len(blob) == 20 * 4096 and len(set(blob)) == 1

    def test_reader_never_sees_partial_entry(self, cache_dir):
        """A polling reader racing a slow writer observes either a
        miss or the COMPLETE entry — atomic rename publish means no
        half-written state is ever visible under the key."""
        root = os.path.join(cache_dir, "results")
        os.makedirs(root, exist_ok=True)
        key = "cafebabe" * 4
        reader = subprocess.Popen(
            [sys.executable, "-c", textwrap.dedent(RESULT_POLL_WORKER),
             root, key],
            stdout=subprocess.PIPE, text=True,
            env=dict(os.environ, PYTHONPATH=REPO))
        writer = _run_worker(RESULT_STORE_WORKER, root, key, "C")
        assert writer.returncode == 0, writer.stderr[-500:]
        out, _ = reader.communicate(timeout=60)
        assert reader.returncode == 0
        o = json.loads(out.strip().splitlines()[-1])
        assert o["hits"] > 0, "reader never saw the published entry"
        assert o["half_reads"] == 0


SQL_CACHED_WORKER = """
import json, os, sys
sys.path.insert(0, os.environ["PYTHONPATH"])
from pyspark.sql import SparkSession
from sidecar_spark import Engine
from sidecar_spark.config import SidecarConfig

cache_dir, sf_dir, rounds = sys.argv[1:4]
spark = (SparkSession.builder.master("local[2]")
         .appName("sidecar-mp-sqlcached")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
conf = SidecarConfig.create(cache_dir=cache_dir, data_cache_type="file",
                            cache_persistent=False, auto_warm_bytes=1)
eng = Engine(spark, base_dir=sf_dir, conf=conf)
eng.register("nation")
q = ("SELECT n_regionkey, count(*) AS cnt, min(n_name) AS first_name "
     "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
expected = [tuple(r) for r in spark.sql(q).collect()]
bad = 0
for _ in range(int(rounds)):
    got = [tuple(r) for r in eng.sql_cached(q).collect()]
    if got != expected:
        bad += 1
print(json.dumps({"bad": bad,
                  "rc": eng.result_cache_stats()}))
eng.close()
spark.stop()
"""


class TestTwoProcessEngineSqlCached:
    def test_worker_store_races_driver_lookup(self, spark, cache_dir,
                                              sf_dir):
        """The ENGINE result-cache path across processes (round-4
        verdict next-round #4): a second interpreter's Engine stores
        sql_cached entries under the shared cache root (with auto-warm
        also writing task-side into the same root) while this process's
        Engine concurrently looks up the same key. Every result —
        computed, stored, or adopted from the other process's publish —
        must equal the plain-SQL answer; no partial entry is ever
        served."""
        from sidecar_spark import Engine

        conf = SidecarConfig.create(
            cache_dir=cache_dir, data_cache_type="file",
            cache_persistent=False, auto_warm_bytes=1)
        worker = subprocess.Popen(
            [sys.executable, "-c", textwrap.dedent(SQL_CACHED_WORKER),
             cache_dir, sf_dir, "8"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=dict(os.environ, PYTHONPATH=REPO))
        eng = Engine(spark, base_dir=sf_dir, conf=conf)
        try:
            eng.register("nation")
            q = ("SELECT n_regionkey, count(*) AS cnt, "
                 "min(n_name) AS first_name "
                 "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
            expected = [tuple(r) for r in eng.spark.sql(q).collect()]
            bad = 0
            # keep looking up while the worker's session boots, stores
            # and re-reads — real cross-process overlap on the key
            while worker.poll() is None:
                got = [tuple(r) for r in eng.sql_cached(q).collect()]
                if got != expected:
                    bad += 1
            out, err = worker.communicate(timeout=30)
            assert worker.returncode == 0, err[-800:]
            o = json.loads(out.strip().splitlines()[-1])
            assert o["bad"] == 0
            assert bad == 0
            # at least one side must have served hits for the race to
            # mean anything; the worker runs 8 rounds so IT certainly hit
            assert o["rc"]["hits"] >= 1
        finally:
            eng.close()
            CacheManager.clear_instances()
