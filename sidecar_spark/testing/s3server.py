"""Minimal S3-compatible object store over localhost HTTP.

The reference's headline connector is the S3A wrapper
(``fs/s3a/SidecarS3AFileSystem.java:50-188``): a real network object
store spoken to over the S3 REST dialect.  The sandbox has no cloud
credentials, so this module supplies the other half of the wire: an
in-process HTTP server implementing the exact S3 operations the AWS
SDK (inside ``pyarrow.fs.S3FileSystem``) issues for our verb set —

* PutObject / GetObject (with ``Range``) / HeadObject / DeleteObject
* CopyObject (``x-amz-copy-source``) — pyarrow ``move`` = copy+delete
* ListObjectsV2 (prefix + delimiter + CommonPrefixes)
* DeleteObjects (batch POST ``?delete``)
* CreateBucket / HeadBucket
* Multipart upload (initiate / UploadPart / complete / abort) —
  pyarrow's ``open_output_stream`` always writes through multipart

Auth headers are accepted and ignored (SigV4 verification is the
vendor's job, not the protocol shape's).  State is in-memory; each
server instance is an isolated store.  This makes ``s3://`` a TESTED
scheme — ranged GETs, list pagination shape, rename-via-copy — not a
URI-parsing claim.
"""

from __future__ import annotations

import os
import re
import threading
import time
from email.utils import formatdate
from hashlib import md5
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, unquote, urlparse
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape


class _Obj:
    __slots__ = ("data", "mtime")

    def __init__(self, data: bytes):
        self.data = data
        self.mtime = time.time()


def _iso(ts: float) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime(ts))


def _etag(data: bytes) -> str:
    return '"%s"' % md5(data).hexdigest()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "SidecarS3Stub/1.0"

    # silence per-request stderr logging
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def parse_request(self):  # noqa: D102 — optional emulated RTT:
        # SIDECAR_S3_STUB_LATENCY_MS sleeps per request (threaded
        # server: concurrent requests overlap their sleeps, like a
        # real remote store) so planning benches can measure
        # round-trip-bound listing instead of localhost CPU
        ok = BaseHTTPRequestHandler.parse_request(self)
        if ok:
            ms = os.environ.get("SIDECAR_S3_STUB_LATENCY_MS")
            if ms:
                try:
                    time.sleep(max(0.0, float(ms)) / 1000.0)
                except ValueError:
                    pass
        return ok

    # ---- helpers -------------------------------------------------------

    @property
    def store(self) -> "S3Store":
        return self.server.store  # type: ignore[attr-defined]

    def _parse(self) -> Tuple[str, str, Dict[str, str]]:
        u = urlparse(self.path)
        parts = unquote(u.path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        q = {k: v[0] for k, v in parse_qs(u.query, keep_blank_values=True).items()}
        # request journal: tests assert data-path properties ("this
        # scan issued ZERO GETs against object keys") from the wire,
        # which is the one vantage point worker processes and the
        # driver share. The query string is kept so subresource GETs
        # (?uploadId=... part listings) are distinguishable from
        # object-data GETs.
        with self.store.lock:
            self.store.requests.append(
                (self.command,
                 u.path + ("?" + u.query if u.query else "")))
        return bucket, key, q

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n) if n else b""
        if self.headers.get("x-amz-content-sha256", "").startswith(
                "STREAMING-"):
            body = _strip_chunk_signatures(body)
        return body

    def _send(self, code: int, body: bytes = b"",
              headers: Optional[Dict[str, str]] = None,
              content_type: str = "application/xml") -> None:
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        if body or code not in (204, 304):
            self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _err(self, code: int, s3code: str, msg: str = "") -> None:
        body = (f'<?xml version="1.0" encoding="UTF-8"?>'
                f"<Error><Code>{s3code}</Code><Message>{escape(msg)}</Message>"
                f"</Error>").encode()
        self._send(code, body)

    # ---- verbs ---------------------------------------------------------

    def do_HEAD(self):  # noqa: N802
        bucket, key, _ = self._parse()
        with self.store.lock:
            if bucket not in self.store.buckets:
                return self._send(404)
            if not key:  # HeadBucket
                return self._send(200)
            obj = self.store.buckets[bucket].get(key)
            if obj is None:
                return self._send(404)
            # HeadObject: real Content-Length, no body (the SDK reads
            # the object size from this header)
            self.send_response(200)
            self.send_header("ETag", _etag(obj.data))
            self.send_header("Last-Modified",
                             formatdate(obj.mtime, usegmt=True))
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(len(obj.data)))
            self.end_headers()

    def do_GET(self):  # noqa: N802
        bucket, key, q = self._parse()
        # snapshot the object's BYTES under the lock, send OUTSIDE it:
        # a stalled client blocking on the socket while holding the
        # store lock would serialize (or wedge) every other request
        with self.store.lock:
            if bucket not in self.store.buckets:
                return self._err(404, "NoSuchBucket", bucket)
            if not key or "list-type" in q or "prefix" in q:
                return self._list(bucket, q)
            obj = self.store.buckets[bucket].get(key)
            if obj is None:
                return self._err(404, "NoSuchKey", key)
            data = obj.data  # bytes are immutable: a safe snapshot
            mtime = obj.mtime
        rng = self.headers.get("Range")
        headers = {
            "ETag": _etag(data),
            "Last-Modified": formatdate(mtime, usegmt=True),
            "Accept-Ranges": "bytes",
        }
        if rng:
            m = re.match(r"bytes=(\d*)-(\d*)", rng)
            if m.group(1) == "" and m.group(2):
                # suffix range bytes=-N: the LAST N bytes (the classic
                # parquet-footer read) — not bytes 0..N
                n = min(int(m.group(2)), len(data))
                start, end = len(data) - n, len(data) - 1
            else:
                start = int(m.group(1) or 0)
                end = int(m.group(2)) if m.group(2) else len(data) - 1
                end = min(end, len(data) - 1)
            if start >= len(data) or start > end:
                # unsatisfiable: RFC 7233 416 with the total length —
                # a 206 here would be treated as data by SDKs
                return self._send(
                    416, b"", {"Content-Range": f"bytes */{len(data)}"})
            headers["Content-Range"] = f"bytes {start}-{end}/{len(data)}"
            return self._send(206, data[start:end + 1], headers,
                              "application/octet-stream")
        self._send(200, data, headers, "application/octet-stream")

    def _list(self, bucket: str, q: Dict[str, str]) -> None:
        """ListObjectsV2 with REAL pagination: keys and common
        prefixes truncate at max-keys (default 1000, like S3) and a
        NextContinuationToken resumes after the last emitted sort
        key. Without this a 100k-object prefix listed in ONE response
        — hiding exactly the serial-LIST round-trip cost the
        distributed-listing path exists to beat (round 10)."""
        prefix = q.get("prefix", "")
        delim = q.get("delimiter", "")
        try:
            maxk = max(1, int(q.get("max-keys", "1000")))
        except ValueError:
            maxk = 1000
        after = q.get("continuation-token") or q.get("start-after", "")
        objs = self.store.buckets[bucket]
        contents, common = [], []
        seen = set()
        truncated = False
        last_sort_key = ""
        for k in sorted(objs):
            if not k.startswith(prefix):
                continue
            if delim:
                rest = k[len(prefix):]
                if delim in rest:
                    p = prefix + rest.split(delim, 1)[0] + delim
                    if p in seen:
                        continue
                    # a common prefix sorts (and resumes) by its own
                    # string; every key under it is covered by it
                    if p <= after:
                        seen.add(p)
                        continue
                    if len(contents) + len(common) >= maxk:
                        truncated = True
                        break
                    seen.add(p)
                    common.append(p)
                    last_sort_key = p
                    continue
            if k <= after:
                continue
            if len(contents) + len(common) >= maxk:
                truncated = True
                break
            o = objs[k]
            contents.append(
                f"<Contents><Key>{escape(k)}</Key>"
                f"<LastModified>{_iso(o.mtime)}</LastModified>"
                f"<ETag>{escape(_etag(o.data))}</ETag>"
                f"<Size>{len(o.data)}</Size>"
                f"<StorageClass>STANDARD</StorageClass></Contents>")
            last_sort_key = k
        cps = "".join(f"<CommonPrefixes><Prefix>{escape(p)}</Prefix>"
                      f"</CommonPrefixes>" for p in common)
        nct = (f"<NextContinuationToken>{escape(last_sort_key)}"
               "</NextContinuationToken>" if truncated else "")
        body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<ListBucketResult xmlns='
            '"http://s3.amazonaws.com/doc/2006-03-01/">'
            f"<Name>{escape(bucket)}</Name><Prefix>{escape(prefix)}</Prefix>"
            f"<KeyCount>{len(contents) + len(common)}</KeyCount>"
            f"<MaxKeys>{maxk}</MaxKeys>"
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>"
            f"{nct}{''.join(contents)}{cps}</ListBucketResult>").encode()
        self._send(200, body)

    def do_PUT(self):  # noqa: N802
        bucket, key, q = self._parse()
        body = self._body()
        with self.store.lock:
            if not key:  # CreateBucket
                self.store.buckets.setdefault(bucket, {})
                return self._send(200, headers={"Location": f"/{bucket}"})
            if bucket not in self.store.buckets:
                if self.store.auto_create_buckets:
                    self.store.buckets[bucket] = {}
                else:
                    return self._err(404, "NoSuchBucket", bucket)
            if "partNumber" in q:  # UploadPart
                up = self.store.uploads.get(q.get("uploadId", ""))
                if up is None:
                    return self._err(404, "NoSuchUpload", "")
                up[int(q["partNumber"])] = body
                return self._send(200, headers={"ETag": _etag(body)})
            src = self.headers.get("x-amz-copy-source")
            if src:  # CopyObject
                sb, _, sk = unquote(src).lstrip("/").partition("/")
                sobj = self.store.buckets.get(sb, {}).get(sk)
                if sobj is None:
                    return self._err(404, "NoSuchKey", sk)
                self.store.buckets[bucket][key] = _Obj(sobj.data)
                rb = ('<?xml version="1.0" encoding="UTF-8"?>'
                      "<CopyObjectResult>"
                      f"<LastModified>{_iso(time.time())}</LastModified>"
                      f"<ETag>{escape(_etag(sobj.data))}</ETag>"
                      "</CopyObjectResult>").encode()
                return self._send(200, rb)
            self.store.buckets[bucket][key] = _Obj(body)
            self._send(200, headers={"ETag": _etag(body)})

    def do_POST(self):  # noqa: N802
        bucket, key, q = self._parse()
        body = self._body()
        with self.store.lock:
            if bucket not in self.store.buckets:
                if self.store.auto_create_buckets and key:
                    self.store.buckets[bucket] = {}
                else:
                    return self._err(404, "NoSuchBucket", bucket)
            if "uploads" in q:  # CreateMultipartUpload
                uid = f"up-{self.store.next_upload}"
                self.store.next_upload += 1
                self.store.uploads[uid] = {}
                self.store.upload_targets[uid] = (bucket, key)
                rb = ('<?xml version="1.0" encoding="UTF-8"?>'
                      "<InitiateMultipartUploadResult>"
                      f"<Bucket>{escape(bucket)}</Bucket>"
                      f"<Key>{escape(key)}</Key>"
                      f"<UploadId>{uid}</UploadId>"
                      "</InitiateMultipartUploadResult>").encode()
                return self._send(200, rb)
            if "uploadId" in q:  # CompleteMultipartUpload
                uid = q["uploadId"]
                parts = self.store.uploads.pop(uid, None)
                tb, tk = self.store.upload_targets.pop(uid, (bucket, key))
                if parts is None:
                    return self._err(404, "NoSuchUpload", uid)
                data = b"".join(parts[n] for n in sorted(parts))
                self.store.buckets[tb][tk] = _Obj(data)
                rb = ('<?xml version="1.0" encoding="UTF-8"?>'
                      "<CompleteMultipartUploadResult>"
                      f"<Bucket>{escape(tb)}</Bucket><Key>{escape(tk)}</Key>"
                      f"<ETag>{escape(_etag(data))}</ETag>"
                      "</CompleteMultipartUploadResult>").encode()
                return self._send(200, rb)
            if "delete" in q:  # DeleteObjects
                root = ET.fromstring(body)
                ns = root.tag.partition("}")[0] + "}" if "}" in root.tag else ""
                deleted = []
                for o in root.iter(f"{ns}Object"):
                    k = o.find(f"{ns}Key").text
                    self.store.buckets[bucket].pop(k, None)
                    deleted.append(f"<Deleted><Key>{escape(k)}</Key>"
                                   f"</Deleted>")
                rb = ('<?xml version="1.0" encoding="UTF-8"?>'
                      f"<DeleteResult>{''.join(deleted)}"
                      "</DeleteResult>").encode()
                return self._send(200, rb)
            self._err(400, "NotImplemented", self.path)

    def do_DELETE(self):  # noqa: N802
        bucket, key, q = self._parse()
        with self.store.lock:
            if "uploadId" in q:  # AbortMultipartUpload
                self.store.uploads.pop(q["uploadId"], None)
                self.store.upload_targets.pop(q["uploadId"], None)
                return self._send(204)
            if bucket not in self.store.buckets:
                return self._err(404, "NoSuchBucket", bucket)
            if not key:  # DeleteBucket
                self.store.buckets.pop(bucket, None)
                return self._send(204)
            self.store.buckets[bucket].pop(key, None)
            self._send(204)


def _strip_chunk_signatures(body: bytes) -> bytes:
    """aws-chunked transfer encoding: `<hex-size>;chunk-signature=…\r\n
    <data>\r\n` repeated, terminated by a 0-size chunk."""
    out = []
    i = 0
    while i < len(body):
        j = body.find(b"\r\n", i)
        if j < 0:
            break
        header = body[i:j]
        size = int(header.split(b";", 1)[0], 16)
        if size == 0:
            break
        out.append(body[j + 2:j + 2 + size])
        i = j + 2 + size + 2  # skip data + trailing CRLF
    return b"".join(out)


class S3Store:
    """In-memory bucket/object state shared by the handler threads."""

    def __init__(self, auto_create_buckets: bool = True):
        self.buckets: Dict[str, Dict[str, _Obj]] = {}
        self.uploads: Dict[str, Dict[int, bytes]] = {}
        self.upload_targets: Dict[str, Tuple[str, str]] = {}
        self.next_upload = 1
        self.auto_create_buckets = auto_create_buckets
        self.lock = threading.RLock()
        self.requests: list = []  # (method, raw path) wire journal

    def object_gets(self, substr: str = "") -> int:
        """GET requests against object keys (not listings) whose path
        contains ``substr`` — the wire-level 'bytes left the store'
        counter tests assert on."""
        with self.lock:
            return sum(1 for m, p in self.requests
                       if m == "GET" and "?" not in p
                       and p.rstrip("/").count("/") >= 2
                       and substr in p)

    def clear_requests(self) -> None:
        with self.lock:
            self.requests.clear()


class S3StubServer:
    """``with S3StubServer() as srv:`` → ``srv.endpoint`` is a live
    S3-dialect HTTP endpoint on 127.0.0.1 (ephemeral port)."""

    def __init__(self):
        self.store = S3Store()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.store = self.store  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "S3StubServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "S3StubServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
