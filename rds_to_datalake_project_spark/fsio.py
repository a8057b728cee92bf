"""Filesystem metadata I/O: native fast path for local paths.

Every engine metadata operation (flag files, markers, manifests,
rename-swap publishes) goes through the Hadoop FileSystem API so a
lake can live on hdfs://-/s3a://-style storage. From Python each
Hadoop call costs several py4j round trips (~10-50 ms of driver wall
each), and a lifecycle commit makes hundreds of them: a round-12
event-log profile of one matview build measured 14.9 s of driver-side
gaps between jobs against 13.8 s of actual job time — more than half
the build was metadata chatter.

On scheme-less (plain local) paths Hadoop's LocalFileSystem is itself
only a checksummed wrapper over the OS, so this module provides a
drop-in native implementation of the small FileSystem/Path/FileStatus
API subset the engine uses. ``KeyedTable._fs`` (and the marker-file
helpers) route local paths here and keep the Hadoop handle for any
real scheme — semantics, not performance, decide nothing.

Semantics matched to Hadoop LocalFileSystem where the engine relies
on them:

- ``rename`` returns False instead of raising; renaming onto an
  existing directory moves the source INTO it; onto an existing file
  fails. Same-filesystem ``os.rename`` keeps the publish protocol's
  atomic-swap guarantee.
- ``delete``/``exists``/``mkdirs`` are idempotent.
- ChecksumFileSystem writes ``.<name>.crc`` siblings next to files it
  creates. Native create/rename/delete keep those siblings consistent
  (drop a stale one, move it with the file) so a later Hadoop-path
  read of a natively (re)written file can never fail checksum
  verification.
"""

from __future__ import annotations

import os
import shutil


def is_local(path: str) -> bool:
    """True for paths the OS can touch directly (no scheme). ``file:``
    URIs keep the Hadoop route — cheap, and spares us URI parsing."""
    return "://" not in path and not path.startswith("file:")


def _crc_sibling(path: str) -> str:
    d, name = os.path.split(path)
    return os.path.join(d, f".{name}.crc")


def _drop_crc(path: str) -> None:
    try:
        os.remove(_crc_sibling(path))
    except OSError:
        pass


class NativePath:
    """Hadoop ``Path``-shaped wrapper over a plain string."""

    __slots__ = ("_p",)

    def __init__(self, p: str):
        self._p = str(p)

    def getName(self) -> str:
        return os.path.basename(self._p.rstrip("/"))

    def getParent(self) -> "NativePath":
        return NativePath(os.path.dirname(self._p.rstrip("/")))

    def toString(self) -> str:
        return self._p

    def __str__(self) -> str:  # f-string call sites
        return self._p

    def __repr__(self) -> str:
        return f"NativePath({self._p!r})"


class NativeStatus:
    """Hadoop ``FileStatus``-shaped wrapper over one ``os.stat``."""

    __slots__ = ("_p", "_is_dir", "_len", "_mtime_ms")

    def __init__(self, p: str, st: os.stat_result, is_dir: bool):
        self._p = p
        self._is_dir = is_dir
        self._len = st.st_size
        self._mtime_ms = int(st.st_mtime * 1000)

    def getPath(self) -> NativePath:
        return NativePath(self._p)

    def isDirectory(self) -> bool:
        return self._is_dir

    def isFile(self) -> bool:
        return not self._is_dir

    def getLen(self) -> int:
        return self._len

    def getModificationTime(self) -> int:
        return self._mtime_ms


class _NativeOut:
    """``fs.create`` return shape: ``write(bytes)`` + ``close``."""

    __slots__ = ("_f",)

    def __init__(self, path: str, overwrite: bool):
        if not overwrite and os.path.exists(path):
            raise IOError(f"create failed, exists: {path}")
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        _drop_crc(path)  # a Hadoop-era checksum no longer describes us
        self._f = open(path, "wb")

    def write(self, data: bytes) -> None:
        self._f.write(data)

    def close(self) -> None:
        self._f.close()


class _NativeIn:
    __slots__ = ("_f",)

    def __init__(self, path: str):
        self._f = open(path, "rb")

    def read(self) -> bytes:
        return self._f.read()

    def close(self) -> None:
        self._f.close()


class _RemoteIter:
    """Hadoop ``RemoteIterator`` shape over a Python iterator."""

    __slots__ = ("_it", "_next")

    _SENTINEL = object()

    def __init__(self, it):
        self._it = iter(it)
        self._next = self._SENTINEL

    def hasNext(self) -> bool:
        if self._next is self._SENTINEL:
            self._next = next(self._it, self._SENTINEL)
        return self._next is not self._SENTINEL

    def next(self):
        if not self.hasNext():
            raise StopIteration
        out, self._next = self._next, self._SENTINEL
        return out


def _status(p: str) -> NativeStatus:
    st = os.stat(p)
    return NativeStatus(p, st, os.path.isdir(p))


class NativeFS:
    """The FileSystem API subset the engine calls, natively."""

    @staticmethod
    def _s(p) -> str:
        return str(p)

    def exists(self, p) -> bool:
        return os.path.lexists(self._s(p))

    def getFileStatus(self, p) -> NativeStatus:
        sp = self._s(p)
        if not os.path.lexists(sp):
            raise IOError(f"not found: {sp}")
        return _status(sp)

    def listStatus(self, p) -> list[NativeStatus]:
        sp = self._s(p)
        if not os.path.isdir(sp):
            if os.path.lexists(sp):
                return [_status(sp)]
            raise IOError(f"not found: {sp}")
        out = []
        with os.scandir(sp) as it:
            for e in it:
                st = e.stat()
                out.append(
                    NativeStatus(os.path.join(sp, e.name), st, e.is_dir())
                )
        return out

    def listFiles(self, p, recursive: bool = False) -> _RemoteIter:
        sp = self._s(p)

        def walk():
            if not recursive:
                for s in self.listStatus(sp):
                    if not s.isDirectory():
                        yield s
                return
            for root, _dirs, files in os.walk(sp):
                for name in files:
                    fp = os.path.join(root, name)
                    yield _status(fp)

        return _RemoteIter(walk())

    def delete(self, p, recursive: bool = False) -> bool:
        sp = self._s(p)
        if not os.path.lexists(sp):
            return False
        if os.path.isdir(sp) and not os.path.islink(sp):
            if not recursive and os.listdir(sp):
                raise IOError(f"dir not empty: {sp}")
            shutil.rmtree(sp, ignore_errors=True)
        else:
            try:
                os.remove(sp)
            except OSError:
                return False
            _drop_crc(sp)
        return True

    def mkdirs(self, p) -> bool:
        os.makedirs(self._s(p), exist_ok=True)
        return True

    def create(self, p, overwrite: bool = False) -> _NativeOut:
        return _NativeOut(self._s(p), overwrite)

    def open(self, p) -> _NativeIn:
        return _NativeIn(self._s(p))

    def getContentSummary(self, p):
        sp = self._s(p)
        total = 0
        for root, _dirs, files in os.walk(sp):
            for name in files:
                try:
                    total += os.path.getsize(os.path.join(root, name))
                except OSError:
                    pass

        class _Summary:
            __slots__ = ()

            @staticmethod
            def getLength() -> int:
                return total

        return _Summary()

    def rename(self, src, dst) -> bool:
        s, d = self._s(src), self._s(dst)
        if not os.path.lexists(s):
            return False
        if os.path.lexists(d):
            if os.path.isdir(d):
                target = os.path.join(d, os.path.basename(s.rstrip("/")))
                if os.path.lexists(target):
                    return False
                os.rename(s, target)
                self._move_crc(s, target)
                return True
            return False
        parent = os.path.dirname(d)
        if parent and not os.path.isdir(parent):
            return False  # Hadoop: rename into a missing parent fails
        os.rename(s, d)
        self._move_crc(s, d)
        return True

    @staticmethod
    def _move_crc(src_file: str, dst_file: str) -> None:
        """Keep a Hadoop checksum sibling travelling with its file
        (no-op for dirs — their inner .crc files moved with the
        tree)."""
        if os.path.isdir(dst_file):
            return
        crc_s, crc_d = _crc_sibling(src_file), _crc_sibling(dst_file)
        _drop_crc(dst_file)
        try:
            os.rename(crc_s, crc_d)
        except OSError:
            pass


_NATIVE_FS = NativeFS()


def native_fs() -> NativeFS:
    return _NATIVE_FS


def read_text(spark, path: str) -> str | None:
    """Contents of a small marker file, or None when absent. Native on
    local paths; Hadoop (portable) otherwise."""
    if is_local(path):
        try:
            with open(path, "r", encoding="utf-8") as f:
                return f.read()
        except OSError:
            return None
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark, path: str, text: str) -> None:
    """Overwrite a small marker file (parents created)."""
    if is_local(path):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        _drop_crc(path)
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        return
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    out.write(text.encode("utf-8"))
    out.close()
