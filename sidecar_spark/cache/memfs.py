"""In-memory object store behind the ``mem://`` scheme.

The reference's connector matrix exists to wrap cloud object stores
(``fs/s3a/SidecarS3AFileSystem.java:50-188`` and 9 siblings); in this
sandbox no cloud credentials exist, so ``mem://`` provides a second,
genuinely non-local scheme with object-store semantics (flat
namespace, whole-object writes, no partial update) that the
``RemoteFS.from_uri`` dispatcher routes exactly like ``s3://`` —
proving the dispatch + caching verbs work over more than ``file://``.

Implemented as a ``pyarrow.fs.FileSystemHandler`` so the SAME pyarrow
``NativeFile`` surface the real connectors expose (``read_at`` ranged
reads — the S3 ranged-GET analog) is exercised end to end.  State is
process-global per store name, mimicking a per-account bucket
namespace reachable from every component in the process.
"""

from __future__ import annotations

import io
import posixpath
import threading
import time
from typing import Dict, Tuple

import pyarrow as pa
import pyarrow.fs as pafs

_LOCK = threading.RLock()
#: store-name → ({object-path → (payload, mtime_ns)}, {dir-path})
_STORES: Dict[str, Tuple[dict, set]] = {}


def _store(name: str):
    with _LOCK:
        return _STORES.setdefault(name, ({}, set()))


def reset_store(name: str = "default") -> None:
    """Drop every object in a named store (test isolation)."""
    with _LOCK:
        _STORES.pop(name, None)


class _CommitOnClose(io.BytesIO):
    """Whole-object PUT semantics: bytes become visible atomically at
    close, like a cloud multipart-upload completion."""

    def __init__(self, commit):
        super().__init__()
        self._commit = commit

    def close(self):
        if not self.closed:
            self._commit(self.getvalue())
        super().close()


class MemFSHandler(pafs.FileSystemHandler):
    def __init__(self, name: str = "default"):
        self.name = name

    # -- identity ------------------------------------------------------

    def get_type_name(self):
        return f"mem::{self.name}"

    def __eq__(self, other):
        return (isinstance(other, MemFSHandler)
                and other.name == self.name)

    def __ne__(self, other):
        return not self.__eq__(other)

    def normalize_path(self, path):
        return path.strip("/")

    # -- metadata ------------------------------------------------------

    def _info(self, path):
        files, dirs = _store(self.name)
        path = path.strip("/")
        if path in files:
            data, mtime_ns = files[path]
            return pafs.FileInfo(path, pafs.FileType.File,
                                 mtime_ns=mtime_ns, size=len(data))
        if path == "" or path in dirs or any(
                f.startswith(path + "/") for f in files):
            return pafs.FileInfo(path, pafs.FileType.Directory)
        return pafs.FileInfo(path, pafs.FileType.NotFound)

    def get_file_info(self, paths):
        with _LOCK:
            return [self._info(p) for p in paths]

    def get_file_info_selector(self, selector):
        files, dirs = _store(self.name)
        base = selector.base_dir.strip("/")
        prefix = base + "/" if base else ""
        with _LOCK:
            out, seen_dirs = [], set()
            for p in sorted(files):
                if not p.startswith(prefix):
                    continue
                rel = p[len(prefix):]
                if "/" in rel:
                    child = prefix + rel.split("/", 1)[0]
                    if child not in seen_dirs:
                        seen_dirs.add(child)
                        out.append(pafs.FileInfo(
                            child, pafs.FileType.Directory))
                    if selector.recursive:
                        out.append(self._info(p))
                else:
                    out.append(self._info(p))
            for d in sorted(dirs):
                if d.startswith(prefix) and d not in seen_dirs:
                    rel = d[len(prefix):]
                    if "/" not in rel or selector.recursive:
                        out.append(pafs.FileInfo(
                            d, pafs.FileType.Directory))
            if not out and base and self._info(
                    base).type == pafs.FileType.NotFound \
                    and not selector.allow_not_found:
                raise FileNotFoundError(base)
            return out

    # -- mutation ------------------------------------------------------

    def create_dir(self, path, recursive):
        files, dirs = _store(self.name)
        path = path.strip("/")
        with _LOCK:
            parts = path.split("/")
            if recursive:
                for i in range(1, len(parts) + 1):
                    dirs.add("/".join(parts[:i]))
            elif path:
                dirs.add(path)

    def delete_dir(self, path):
        files, dirs = _store(self.name)
        path = path.strip("/")
        with _LOCK:
            for p in [p for p in files if p.startswith(path + "/")]:
                del files[p]
            for d in [d for d in dirs
                      if d == path or d.startswith(path + "/")]:
                dirs.discard(d)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        files, dirs = _store(self.name)
        path = path.strip("/")
        with _LOCK:
            if (self._info(path).type == pafs.FileType.NotFound
                    and not missing_dir_ok):
                raise FileNotFoundError(path)
            for p in [p for p in files if p.startswith(path + "/")]:
                del files[p]
            for d in [d for d in dirs if d.startswith(path + "/")]:
                dirs.discard(d)

    def delete_root_dir_contents(self):
        files, dirs = _store(self.name)
        with _LOCK:
            files.clear()
            dirs.clear()

    def delete_file(self, path):
        files, _ = _store(self.name)
        path = path.strip("/")
        with _LOCK:
            if path not in files:
                raise FileNotFoundError(path)
            del files[path]

    def move(self, src, dest):
        files, dirs = _store(self.name)
        src, dest = src.strip("/"), dest.strip("/")
        with _LOCK:
            if src in files:
                files[dest] = files.pop(src)
            elif self._info(src).type == pafs.FileType.Directory:
                for p in [p for p in files if p.startswith(src + "/")]:
                    files[dest + p[len(src):]] = files.pop(p)
                # rename NESTED dir entries too — leaving them keeps
                # phantom dirs under the old name and loses them under
                # the new one
                for d in [d for d in dirs
                          if d == src or d.startswith(src + "/")]:
                    dirs.discard(d)
                    dirs.add(dest + d[len(src):])
            else:
                raise FileNotFoundError(src)

    def copy_file(self, src, dest):
        files, _ = _store(self.name)
        src, dest = src.strip("/"), dest.strip("/")
        with _LOCK:
            if src not in files:
                raise FileNotFoundError(src)
            files[dest] = (files[src][0], time.time_ns())

    # -- data ----------------------------------------------------------

    def _payload(self, path):
        files, _ = _store(self.name)
        path = path.strip("/")
        with _LOCK:
            if path not in files:
                raise FileNotFoundError(path)
            return files[path][0]

    def open_input_stream(self, path):
        return pa.BufferReader(self._payload(path))

    def open_input_file(self, path):
        return pa.BufferReader(self._payload(path))

    def _writer(self, path, initial=b""):
        files, dirs = _store(self.name)
        path = path.strip("/")

        def commit(data):
            with _LOCK:
                parent = posixpath.dirname(path)
                if parent:
                    self.create_dir(parent, True)
                files[path] = (data, time.time_ns())

        buf = _CommitOnClose(commit)
        if initial:
            buf.write(initial)
        return pa.PythonFile(buf, mode="w")

    def open_output_stream(self, path, metadata):
        return self._writer(path)

    def open_append_stream(self, path, metadata):
        files, _ = _store(self.name)
        p = path.strip("/")
        with _LOCK:
            initial = files[p][0] if p in files else b""
        return self._writer(path, initial)


def memory_filesystem(name: str = "default") -> pafs.PyFileSystem:
    """A pyarrow FileSystem over the named in-memory store."""
    return pafs.PyFileSystem(MemFSHandler(name))
