"""plans/fsio: Hadoop-FileSystem-routed warehouse metadata I/O.

The warehouse's metadata probes (bucket spec sidecars, partition
listings, emptied-bucket deletes) must behave identically whether
they run through the Hadoop FileSystem API (active SparkSession —
the HDFS/S3-capable path) or the os/shutil fallback (no session).
Both paths are exercised here; the scheme-generality evidence is the
``file:`` URI round-trip, which forces resolution through Hadoop's
scheme dispatch exactly as an ``hdfs://`` URI would.
"""

from __future__ import annotations

import os

from graph_rag_agent_spark.plans import fsio


def _exercise(root: str) -> None:
    tbl = os.path.join(root, "tbl")
    assert not fsio.exists(tbl)
    assert fsio.listdir(tbl) == []
    assert fsio.list_dirs(tbl) == []

    os.makedirs(os.path.join(tbl, "__bucket=3"))
    os.makedirs(os.path.join(tbl, "__bucket=1"))
    fsio.write_text(os.path.join(tbl, "_spec.json"), '{"k": 1}')

    # listing a regular FILE is [] on both backends (Hadoop listStatus
    # would return the file's own status; os.listdir would raise
    # NotADirectoryError — both are normalized away)
    assert fsio.listdir(os.path.join(tbl, "_spec.json")) == []
    assert fsio.list_dirs(os.path.join(tbl, "_spec.json")) == []

    assert fsio.exists(tbl)
    assert fsio.is_dir(tbl)
    assert not fsio.is_dir(os.path.join(tbl, "_spec.json"))
    assert fsio.listdir(tbl) == ["__bucket=1", "__bucket=3", "_spec.json"]
    assert fsio.list_dirs(tbl) == ["__bucket=1", "__bucket=3"]
    assert fsio.read_text(os.path.join(tbl, "_spec.json")) == '{"k": 1}'
    assert fsio.read_json(os.path.join(tbl, "_spec.json")) == {"k": 1}

    # overwrite-in-place (the sidecar update shape)
    fsio.write_json(os.path.join(tbl, "_spec.json"), {"k": 2})
    assert fsio.read_json(os.path.join(tbl, "_spec.json")) == {"k": 2}

    fsio.remove(os.path.join(tbl, "_spec.json"))
    fsio.remove(os.path.join(tbl, "_spec.json"))  # idempotent
    assert fsio.listdir(tbl) == ["__bucket=1", "__bucket=3"]

    fsio.rmtree(os.path.join(tbl, "__bucket=3"))
    assert fsio.list_dirs(tbl) == ["__bucket=1"]
    fsio.rmtree(tbl)
    fsio.rmtree(tbl)  # idempotent
    assert not fsio.exists(tbl)


def test_fsio_hadoop_path(spark, tmp_path):
    """Active session → Hadoop FileSystem resolution (plain path)."""
    assert fsio._hadoop(str(tmp_path)) is not None
    _exercise(str(tmp_path))


def test_fsio_file_uri_scheme(spark, tmp_path):
    """Scheme-qualified URI resolves through Hadoop's FileSystem
    dispatch — the same code path an hdfs:// or s3a:// root takes.
    Local-path helpers (os.makedirs) still need the bare path, so only
    the fsio calls see the URI."""
    root = str(tmp_path / "wh")
    os.makedirs(os.path.join(root, "t", "__bucket=0"))
    uri = "file://" + root
    assert fsio.exists(uri + "/t")
    assert fsio.is_dir(uri + "/t")
    assert fsio.listdir(uri + "/t") == ["__bucket=0"]
    fsio.write_json(uri + "/t/_m.json", {"v": 7})
    assert fsio.read_json(os.path.join(root, "t", "_m.json")) == {"v": 7}
    fsio.rmtree(uri + "/t/__bucket=0")
    assert fsio.list_dirs(uri + "/t") == []


def test_fsio_worker_thread_stays_on_hadoop_path(spark, tmp_path):
    """getActiveSession() is thread-local; the warehouse plans call
    fsio from _run_parallel driver threads. A worker thread must STILL
    resolve the Hadoop FileSystem (via the process-wide session) — a
    silent fall-through to plain open() leaves a stale .crc checksum
    beside a previously-Hadoop-written sidecar, and the next Hadoop
    read dies with ChecksumException (regression: declined link-reuse
    in test_delta_incremental_noop_cycle_rewrites_nothing)."""
    import threading

    sidecar = str(tmp_path / "_params.json")
    fsio.write_json(sidecar, {"method": "exact"})  # main thread: Hadoop

    results = {}

    def worker():
        results["session_seen"] = fsio._hadoop(sidecar) is not None
        fsio.write_json(sidecar, {"method": "lsh"})  # overwrite

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert results["session_seen"], "worker thread lost the session"
    # main thread reads back through Hadoop: checksum must be intact
    assert fsio.read_json(sidecar) == {"method": "lsh"}


def test_fsio_local_fallback(tmp_path, monkeypatch):
    """No active session → os/shutil fallback, same contract."""
    monkeypatch.setattr(fsio, "_hadoop", lambda path: None)
    _exercise(str(tmp_path))
