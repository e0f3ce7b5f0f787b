"""Env-gated REAL cloud-connector test (SURVEY.md §2.6 completion).

The protocol-level S3 dialect is already covered against a localhost
server (tests/test_cache.py + sidecar_spark/testing/s3server.py); this
module exercises the credentialed vendor path — the analog of the
reference's live-credential S3A suite
(``fs/s3a/TestSidecarS3AFileSystem*.java``, which likewise only runs
when real credentials exist).

Activate with::

    SIDECAR_TEST_S3_URI=s3://my-bucket/sidecar-ci \
    AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=... \
    python -m pytest tests/test_cloud.py

Unset, every test skips cleanly (this sandbox has no cloud creds).
"""

import os
import uuid

import pytest

from sidecar_spark.cache import CacheManager
from sidecar_spark.config import SidecarConfig

CLOUD_URI = os.environ.get("SIDECAR_TEST_S3_URI")

pytestmark = pytest.mark.skipif(
    not CLOUD_URI,
    reason="SIDECAR_TEST_S3_URI not set (no cloud credentials available)")

PAGE = 64 * 1024


def virtual_read(offset: int, length: int) -> bytes:
    """Offset-derived content oracle (VirtualFileInputStream.java:43-50)."""
    return bytes((offset + i) % 256 for i in range(length))


@pytest.fixture()
def cloud_prefix():
    """A unique per-run prefix under the configured bucket; removed on
    teardown so repeated CI runs don't accumulate objects."""
    from sidecar_spark.cache.fs import RemoteFS

    prefix = CLOUD_URI.rstrip("/") + f"/run-{uuid.uuid4().hex[:12]}"
    fs, root = RemoteFS.from_uri(prefix)
    yield prefix
    try:
        fs.delete(root, recursive=True)
    except Exception:  # noqa: BLE001 - best-effort cleanup
        pass


def test_crud_lifecycle_tier_provenance_real_cloud(cache_dir, cloud_prefix):
    """The §5.3 CRUD scenario against a REAL bucket: write 4 pages →
    read#1 from write cache, read#2 from data cache; rename keeps
    content; delete drains meta and the remote object
    (TestCachingFileSystemBase.java:179-334)."""
    conf = SidecarConfig.create(
        cache_dir=cache_dir, data_page_size=PAGE, io_buffer_size=4 * PAGE,
        data_cache_type="file", write_cache_size=100 * 1024 * 1024,
        cache_persistent=False)
    mgr = CacheManager(conf)
    try:
        path = cloud_prefix + "/f1"
        payload = virtual_read(0, 4 * PAGE)

        out = mgr.create(path)
        out.write(payload)
        out.close()
        mgr.drain()
        assert mgr.write_cache.moniker_count() == 0
        assert mgr.meta.get(path) is not None

        s = mgr.open(path)
        assert s.read_at(0, 4 * PAGE) == payload
        assert mgr.stats.get("total_bytes_read_write_cache") == 4 * PAGE
        assert mgr.stats.get("total_bytes_read_remote") == 0

        s2 = mgr.open(path)
        assert s2.read_at(0, 4 * PAGE) == payload
        assert mgr.stats.get("total_bytes_read_data_cache") == 4 * PAGE

        dst = cloud_prefix + "/f2"
        assert mgr.rename(path, dst)
        mgr.drain()
        assert mgr.meta.get(path) is None
        assert mgr.meta.get(dst) is not None
        s3 = mgr.open(dst)
        assert s3.read_at(0, PAGE) == payload[:PAGE]

        assert mgr.delete(dst)
        mgr.drain()
        assert mgr.meta.get(dst) is None
        fs, p = mgr._resolve(dst)
        assert fs.stat(p) is None
    finally:
        mgr.close(save=False)


def test_resolve_for_spark_real_cloud(cache_dir, cloud_prefix, spark):
    """Mirror materialization over a real bucket: first resolve pulls
    the object down (remote read), second serves the local copy, and
    Spark reads the mirrored parquet."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sidecar_spark.cache.fs import RemoteFS

    conf = SidecarConfig.create(
        cache_dir=cache_dir, data_cache_type="file", cache_persistent=False)
    mgr = CacheManager(conf)
    try:
        uri = cloud_prefix + "/t.parquet"
        fs, p = RemoteFS.from_uri(uri)
        table = pa.Table.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
        with fs.open_write(p) as sink:
            buf = pa.BufferOutputStream()
            pq.write_table(table, buf)
            sink.write(buf.getvalue().to_pybytes())

        paths1 = mgr.resolve_for_spark(uri)
        assert len(paths1) == 1 and paths1[0].startswith(cache_dir)
        assert mgr.stats.get("total_read_requests_from_remote") >= 1
        remote_reads = mgr.stats.get("total_read_requests_from_remote")
        paths2 = mgr.resolve_for_spark(uri)
        assert paths2 == paths1
        assert mgr.stats.get("total_read_requests_from_remote") == remote_reads
        assert spark.read.parquet(paths1[0]).count() == 3
    finally:
        mgr.close(save=False)
