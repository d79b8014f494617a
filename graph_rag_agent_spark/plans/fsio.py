"""Filesystem I/O for warehouse metadata, routed through the Hadoop
FileSystem API.

The warehouse modules (plans/merge.py, plans/build.py,
plans/maintenance.py, streaming/pipeline.py) need a handful of
metadata operations the DataFrame reader/writer doesn't expose:
probe a table's existence, list its partition directories, read and
write tiny JSON sidecars (bucket spec, link-config fingerprint,
format marker), and delete emptied partitions. Round-2 code did all
of this with ``os``/``shutil``, which silently breaks the moment the
warehouse root is an ``hdfs://`` or ``s3a://`` URI — exactly the
deployment the 100 TB docstrings assume (ADVICE r2).

This module is the one place those operations live. Every call
resolves the *scheme-appropriate* Hadoop ``FileSystem`` from the
active SparkSession's Hadoop configuration
(``Path.getFileSystem(conf)``), so the same code drives local disk
(RawLocalFileSystem), HDFS, or any object store whose connector is
on the classpath — the standard Spark-ecosystem pattern (the JVM
gateway and the Hadoop FS API are public Spark/Hadoop surface). With
no active session (plain unit tests, driver-side tooling) the calls
fall back to ``os``/``shutil`` semantics, which are identical for
local paths.

Design notes for the 100 TB path:
  * These are METADATA ops — O(partitions) listings and O(bytes)
    sidecar reads, never data-file reads; py4j round-trip cost is
    microscopic next to any Spark job they gate.
  * ``listdir``/``exists`` against object stores cost one LIST/HEAD
    each; callers already bound call counts by bucket count, not row
    count (plans/merge.py docstring).
  * Sidecar writes (``write_text``) use create-with-overwrite, which
    is atomic-enough on HDFS (rename-based) and last-writer-wins on
    object stores — the same single-writer assumption the MERGE
    simulation already documents.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

__all__ = [
    "exists",
    "is_dir",
    "listdir",
    "list_dirs",
    "makedirs",
    "rmtree",
    "rename",
    "remove",
    "read_text",
    "write_text",
    "read_json",
    "write_json",
]


def _session():
    """The live SparkSession, resolved process-wide.

    getActiveSession() alone is THREAD-LOCAL: the warehouse plans fan
    metadata writes across driver threads (plans/build._run_parallel),
    and a worker thread would see None, silently fall back to plain
    open(), and leave a stale Hadoop .crc checksum file beside the
    sidecar — the next Hadoop-side read then dies with
    ChecksumException (observed as a declined link-reuse). The
    process-wide _instantiatedSession fallback keeps every thread on
    the same FileSystem path."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        spark = getattr(SparkSession, "_instantiatedSession", None)
    if spark is not None and spark._sc._jsc is None:  # stopped session
        return None
    return spark


def _hadoop(path: str):
    """(FileSystem, Path, jvm) for ``path`` via the session's Hadoop
    conf, or None when no session is live (→ local fallback)."""
    spark = _session()
    if spark is None:
        return None
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def exists(path: str) -> bool:
    h = _hadoop(path)
    if h is None:
        return os.path.exists(path)
    fs, p, _ = h
    return bool(fs.exists(p))


def is_dir(path: str) -> bool:
    h = _hadoop(path)
    if h is None:
        return os.path.isdir(path)
    fs, p, _ = h
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def listdir(path: str) -> list[str]:
    """Child names of a DIRECTORY; [] when the path is missing or is
    a regular file (the tolerant shape every caller wants — and made
    explicit so both backends agree: Hadoop's listStatus on a file
    would return the file's own status, os.listdir would raise
    NotADirectoryError)."""
    h = _hadoop(path)
    if h is None:
        try:
            return sorted(os.listdir(path))
        except (FileNotFoundError, NotADirectoryError):
            return []
    fs, p, _ = h
    if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def list_dirs(path: str) -> list[str]:
    """Child names that are directories; [] when missing or a file."""
    h = _hadoop(path)
    if h is None:
        try:
            return sorted(
                n for n in os.listdir(path)
                if os.path.isdir(os.path.join(path, n))
            )
        except (FileNotFoundError, NotADirectoryError):
            return []
    fs, p, _ = h
    if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(p) if st.isDirectory()
    )


def makedirs(path: str) -> None:
    """mkdir -p, idempotent (os.makedirs exist_ok=True / FS.mkdirs)."""
    h = _hadoop(path)
    if h is None:
        os.makedirs(path, exist_ok=True)
        return
    fs, p, _ = h
    fs.mkdirs(p)


def rmtree(path: str) -> None:
    """Recursive delete, silent when missing (shutil.rmtree
    ignore_errors semantics — the only mode the warehouse uses).
    No exists() precheck: FS.delete returns false (doesn't throw) on
    a missing path, and the MERGE paths call this once per emptied
    bucket — one RPC, not two, on object stores."""
    h = _hadoop(path)
    if h is None:
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, p, _ = h
    fs.delete(p, True)


def rename(src: str, dst: str) -> None:
    """Rename src onto a NON-EXISTENT dst (callers delete dst first).
    One FS metadata op — atomic on posix and HDFS, the property the
    journal swap in plans/incremental.py relies on. Raises when the
    source is missing or the move is refused (Hadoop rename returns
    false instead of throwing)."""
    h = _hadoop(src)
    if h is None:
        os.rename(src, dst)
        return
    fs, p_src, jvm = h
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(p_src, p_dst):
        raise OSError(f"rename refused: {src} -> {dst}")


def remove(path: str) -> None:
    """Delete one file, silent when missing (single RPC — see rmtree)."""
    h = _hadoop(path)
    if h is None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    fs, p, _ = h
    fs.delete(p, False)


def read_text(path: str) -> str:
    """Full contents of a small (sidecar-sized) file as UTF-8.
    Raises on a missing path, like open()."""
    h = _hadoop(path)
    if h is None:
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    fs, p, jvm = h
    stream = fs.open(p)
    sink = jvm.java.io.ByteArrayOutputStream()
    # copyBytes(in, out, bufSize, close=True) is stable public Hadoop API
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, True)
    return sink.toString("UTF-8")


def write_text(path: str, text: str) -> None:
    """Create/overwrite a small file with UTF-8 contents."""
    h = _hadoop(path)
    if h is None:
        # scrub any stale Hadoop checksum sidecar: a plain overwrite
        # after a Hadoop-side write would otherwise leave a .crc that
        # no longer matches, and the next Hadoop read throws
        # ChecksumException
        crc = os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".crc"
        )
        try:
            os.remove(crc)
        except FileNotFoundError:
            pass
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        return
    fs, p, _ = h
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_json(path: str):
    return json.loads(read_text(path))


def write_json(path: str, obj) -> None:
    write_text(path, json.dumps(obj))
