"""Filesystem seam for the streaming state store.

The exactly-once protocol (log-structured deltas + commit markers +
compaction, ``engine.StreamingERJob``) needs exactly six small-metadata
operations besides Spark's own parquet IO: join, makedirs, listdir,
exists, read/write a small text blob, and recursive delete. Routing them
through this interface lets ``work_dir`` be ``hdfs://``, ``s3a://`` or any
other Hadoop-supported URI on a real cluster while the sandbox keeps the
fast POSIX implementation — the engine itself never touches ``os`` /
``shutil`` for state paths.

``HadoopStateFS`` is a REAL implementation, not a stub: it drives the
JVM's ``org.apache.hadoop.fs.FileSystem`` through the active session's
py4j gateway, which is exactly what a cluster deployment resolves for
``hdfs://``/``s3a://`` URIs (and LocalFileSystem for ``file://``), so the
whole protocol is exercisable against it in-sandbox (see
tests/test_streaming.py::test_state_fs_contract).

Commit-marker visibility relies on ``write_text`` being atomic-enough:
POSIX rename gives that locally; HDFS create is atomic at close; S3 PUT is
atomic per object. The protocol only requires that a marker never be
visible half-written, which all three provide.
"""

from __future__ import annotations

import os
import shutil


def _has_scheme(path: str) -> bool:
    # a URI scheme longer than one char (so C:\ stays a Windows path)
    head = path.split("://", 1)
    return len(head) == 2 and len(head[0]) > 1


def state_fs_for(path: str, spark=None) -> "StateFS":
    """Pick the implementation by the work-dir's scheme: plain paths →
    POSIX; any ``scheme://`` URI → Hadoop FileSystem via the session JVM."""
    if _has_scheme(path):
        if spark is None:
            raise ValueError(
                f"a SparkSession is required to resolve the {path!r} scheme"
            )
        return HadoopStateFS(spark, path)
    return LocalStateFS()


class StateFS:
    """list/read/write/delete of small state-store metadata files."""

    def join(self, *parts: str) -> str:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Child BASENAMES of a directory (missing dir → empty list)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        """Contents of a small text file; OSError if unreadable/missing."""
        raise NotImplementedError

    def write_text(self, path: str, data: str) -> None:
        """(Over)write a small text file, never visible half-written."""
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        """Recursive delete; missing path is not an error."""
        raise NotImplementedError

    def copytree(self, src: str, dst: str) -> None:
        """Recursive copy of a (small) directory of data files — used to
        publish a just-written state delta as the batch's output partition
        without re-encoding it through a second Spark write job. POSIX
        hardlinks when possible (same bytes, zero copy); Hadoop uses
        FileUtil.copy. The copy need not be atomic — visibility is gated
        by the state commit marker, and a replayed batch rmtrees first."""
        raise NotImplementedError


class LocalStateFS(StateFS):
    """POSIX implementation (the sandbox default)."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic visibility

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def copytree(self, src: str, dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            troot = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(troot, exist_ok=True)
            for fn in files:
                s, d = os.path.join(root, fn), os.path.join(troot, fn)
                try:
                    os.link(s, d)  # same device: zero-copy
                except OSError:
                    shutil.copyfile(s, d)


class HadoopStateFS(StateFS):
    """org.apache.hadoop.fs.FileSystem implementation via the py4j gateway
    — resolves hdfs://, s3a://, file:// etc. with the cluster's own Hadoop
    configuration (credentials, replication, encryption zones)."""

    def __init__(self, spark, base_uri: str):
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(base_uri).getFileSystem(
            self._conf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def join(self, *parts: str) -> str:
        out = parts[0].rstrip("/")
        for p in parts[1:]:
            out = f"{out}/{p.strip('/')}"
        return out

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text(self, path: str, data: str) -> None:
        # create(overwrite=true) + close: atomic visibility on HDFS; on
        # object stores the PUT happens at close and is atomic per object
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()

    def rmtree(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def copytree(self, src: str, dst: str) -> None:
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._p(src), self._fs, self._p(dst), False, True, self._conf
        )
