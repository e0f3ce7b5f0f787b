"""Scheme-agnostic filesystem access.

The reference ships 10 per-vendor FileSystem subclasses
(``fs/s3a/SidecarS3AFileSystem.java`` etc., SURVEY.md §2.6) whose only
job is delegating the 9 cached verbs to the shared core. Here the whole
connector matrix collapses into one adapter over
``pyarrow.fs.FileSystem.from_uri`` — ``file://``, ``s3://``, ``gs://``,
``hdfs://``… all dispatch for free, mirroring the reference's
``RemoteFileSystemAccess`` pass-throughs (RemoteFileSystemAccess.java:34-180).

All verbs operate on positional ranged reads so the caching input
stream can fetch individual pages (the S3 ranged-GET analog of
``readFromRemoteFS``, SidecarCachingInputStream.java:990-1006).
"""

from __future__ import annotations

import os
import posixpath
from dataclasses import dataclass
from typing import List, Optional, Tuple

import pyarrow.fs as pafs


@dataclass(frozen=True)
class FileStat:
    """Subset of FileStatus the reference caches: length / mtime / is_dir
    (17-byte meta value, SidecarCachingFileSystem.java:1101-1116)."""

    path: str
    length: int
    mtime: int  # integer milliseconds (reference uses Java epoch millis)
    is_dir: bool


def _mtime_ms(info: pafs.FileInfo) -> int:
    mt = info.mtime_ns
    if mt is None:
        return 0
    return mt // 1_000_000


class RemoteFS:
    """Thin verb layer over a pyarrow FileSystem."""

    def __init__(self, fs: pafs.FileSystem, root: str = "") -> None:
        self.fs = fs
        self.root = root

    @classmethod
    def from_uri(cls, uri: str) -> Tuple["RemoteFS", str]:
        """Dispatch on scheme; returns (fs, path-within-fs)."""
        if "://" not in uri:
            return cls(pafs.LocalFileSystem()), os.path.abspath(uri)
        fs, path = pafs.FileSystem.from_uri(uri)
        return cls(fs), path

    @classmethod
    def local(cls) -> "RemoteFS":
        return cls(pafs.LocalFileSystem())

    # ---- metadata ------------------------------------------------------

    def stat(self, path: str) -> Optional[FileStat]:
        info = self.fs.get_file_info(path)
        if info.type == pafs.FileType.NotFound:
            return None
        is_dir = info.type == pafs.FileType.Directory
        return FileStat(path=path, length=info.size or 0,
                        mtime=_mtime_ms(info), is_dir=is_dir)

    def exists(self, path: str) -> bool:
        return self.stat(path) is not None

    def list(self, path: str, recursive: bool = True) -> List[FileStat]:
        sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
        out = []
        for info in self.fs.get_file_info(sel):
            out.append(FileStat(path=info.path, length=info.size or 0,
                                mtime=_mtime_ms(info),
                                is_dir=info.type == pafs.FileType.Directory))
        return out

    # ---- data ----------------------------------------------------------

    def open_read(self, path: str):
        """Random-access reader supporting read_at(nbytes, offset)."""
        return self.fs.open_input_file(path)

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        with self.fs.open_input_file(path) as f:
            return f.read_at(length, offset)

    def read_all(self, path: str) -> bytes:
        with self.fs.open_input_file(path) as f:
            return f.read()

    def open_write(self, path: str):
        return self.fs.open_output_stream(path)

    def write_all(self, path: str, data: bytes) -> None:
        self.mkdirs(posixpath.dirname(path))
        with self.fs.open_output_stream(path) as f:
            f.write(data)

    # ---- mutation verbs (the cached FS verb set, SURVEY.md §2.1) --------

    def mkdirs(self, path: str) -> None:
        if path:
            self.fs.create_dir(path, recursive=True)

    def delete(self, path: str, recursive: bool = False) -> bool:
        st = self.stat(path)
        if st is None:
            return False
        if st.is_dir:
            self.fs.delete_dir(path) if recursive else self.fs.delete_dir_contents(path)
        else:
            self.fs.delete_file(path)
        return True

    def rename(self, src: str, dst: str) -> bool:
        if not self.exists(src):
            return False
        parent = posixpath.dirname(dst)
        if parent:
            self.fs.create_dir(parent, recursive=True)
        self.fs.move(src, dst)
        return True

    def copy(self, src: str, dst: str) -> None:
        parent = posixpath.dirname(dst)
        if parent:
            self.fs.create_dir(parent, recursive=True)
        self.fs.copy_file(src, dst)

    def concat(self, target: str, sources: List[str]) -> None:
        """Concatenate source files into target (ADL Gen1 verb,
        SidecarCachingFileSystem.java:1560-1586). Emulated by streaming
        copy since generic stores lack server-side concat."""
        with self.fs.open_output_stream(target) as out:
            for s in sources:
                with self.fs.open_input_stream(s) as f:
                    while True:
                        chunk = f.read(4 * 1024 * 1024)
                        if not chunk:
                            break
                        out.write(chunk)
        for s in sources:
            self.fs.delete_file(s)
