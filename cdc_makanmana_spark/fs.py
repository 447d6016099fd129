"""Hadoop FileSystem helpers — object-store-safe filesystem metadata ops.

Every sink/cache in the engine does its partition bookkeeping
(existence checks, version listing, atomic rename-commit, bucket
drops) through THIS module, which routes to Hadoop's ``FileSystem``
API via the session JVM — so a target path may be ``file:/...``,
``hdfs://...``, ``s3a://...`` or any other registered scheme and the
code is identical. Driver-local ``os``/``shutil`` calls (the round-1/2
implementation) only ever worked on a single machine; reference
analogue for the sink these serve: the cache commit + TTL versioning
in /root/reference/src/services/dataManager.ts:26-77.

All calls are driver-side METADATA operations (list/stat/rename) —
O(entries) namenode/object-store RPCs, never data movement. The text
read/write helpers exist for small JSON sidecars only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path_str: str):
    """(FileSystem, Path) pair for ``path_str``'s scheme."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_path(spark, path_str)
    return fs.exists(path)


def is_dir(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_path(spark, path_str)
    return fs.exists(path) and fs.getFileStatus(path).isDirectory()


def list_names(spark: SparkSession, path_str: str, dirs_only: bool = False) -> list[str]:
    """Child entry basenames of a directory (empty if absent)."""
    fs, path = _fs_path(spark, path_str)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        if dirs_only and not st.isDirectory():
            continue
        out.append(st.getPath().getName())
    return out


def delete(spark: SparkSession, path_str: str, recursive: bool = True) -> bool:
    """Remove a file/dir tree; False if it did not exist."""
    fs, path = _fs_path(spark, path_str)
    if not fs.exists(path):
        return False
    return fs.delete(path, recursive)


def rename(spark: SparkSession, src_str: str, dst_str: str) -> bool:
    """Same-filesystem rename — the atomic-commit primitive on HDFS
    (and a fast metadata op on file:). On S3 rename is a copy; a real
    deployment there fronts the layout with a Delta/Iceberg log — the
    call-site semantics (commit version n+1) are unchanged."""
    fs, src = _fs_path(spark, src_str)
    _, dst = _fs_path(spark, dst_str)
    return fs.rename(src, dst)


def mkdirs(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_path(spark, path_str)
    return fs.mkdirs(path)


def file_size(spark: SparkSession, path_str: str) -> int:
    fs, path = _fs_path(spark, path_str)
    return fs.getFileStatus(path).getLen()


def stat_token(spark: SparkSession, path_str: str) -> str:
    """Change-detection token for a file or directory (``absent`` if
    missing) — regenerating a source table changes its token, which
    cache keys fold in so a stale derived artifact is never served
    against refreshed data.

    Files: ``mtime:len``. Directories: an md5 over the child entries'
    (name, mtime, len) triples — NOT the directory's own status,
    because object stores (s3a) report 0:0 for "directories" and even
    local directory mtime only tracks entry add/remove. One listStatus
    RPC; parquet table dirs hold a bounded number of part files."""
    import hashlib

    fs, path = _fs_path(spark, path_str)
    if not fs.exists(path):
        return "absent"
    st = fs.getFileStatus(path)
    if not st.isDirectory():
        return f"{st.getModificationTime()}:{st.getLen()}"
    entries = sorted(
        (c.getPath().getName(), c.getModificationTime(), c.getLen())
        for c in fs.listStatus(path)
    )  # listStatus order is not guaranteed — sort for a stable token
    h = hashlib.md5()
    for name, mtime, ln in entries:
        h.update(f"{name}:{mtime}:{ln};".encode())
    return f"dir:{h.hexdigest()[:16]}"


def read_text(spark: SparkSession, path_str: str) -> str | None:
    """Small-sidecar read (JSON metadata, a few hundred bytes); None if
    absent. Not for data files."""
    fs, path = _fs_path(spark, path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        # py4j passes byte[] ARGUMENTS by value, so out-param reads like
        # readFully(pos, buf) never reach Python — but byte[] RETURN
        # values auto-convert to Python bytes, so read via IOUtils.
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path_str: str, content: str) -> None:
    """Small-sidecar write (overwrite). Not for data files."""
    fs, path = _fs_path(spark, path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


# ---- commit-marker protocol -------------------------------------------------
#
# ``rename`` is atomic on HDFS but a non-atomic COPY on raw object
# stores (S3A without a table format): a crash mid-commit can leave a
# torn destination directory that looks real to a lister. The marker
# protocol closes that window without a Delta/Iceberg dependency:
# writers create ``{dir}/_COMMITTED`` as the LAST step of a commit, and
# readers treat any version directory lacking the marker as garbage.
# (Spark's own ``_SUCCESS`` is written by the output committer into the
# STAGING dir before the rename, so it travels WITH the copy and can be
# present in a torn destination — it cannot serve as the marker.)
# Reference analogue: the atomic cache replace + version stamp in
# /root/reference/src/services/dataManager.ts:68-77.

COMMIT_MARKER = "_COMMITTED"


def mark_committed(spark: SparkSession, dir_str: str) -> None:
    """Stamp ``dir_str`` as fully committed (write this LAST)."""
    write_text(spark, f"{dir_str}/{COMMIT_MARKER}", "1")


def is_committed(spark: SparkSession, dir_str: str) -> bool:
    """True iff the directory carries the commit marker."""
    return exists(spark, f"{dir_str}/{COMMIT_MARKER}")


def list_versions(
    spark: SparkSession, root: str, prefix: str = "v"
) -> list[tuple[int, str]]:
    """All ``{prefix}N`` version directories under ``root`` as
    (number, name) pairs sorted by number — committed or not. The
    single source for version enumeration (SnapshotCache, LandingJob,
    VerdictCache all resolve through here, so padded and unpadded
    naming schemes behave identically)."""
    out = []
    for name in list_names(spark, root.rstrip("/"), dirs_only=True):
        if name.startswith(prefix) and name[len(prefix):].isdigit():
            out.append((int(name[len(prefix):]), name))
    return sorted(out)


def newest_committed(
    spark: SparkSession,
    root: str,
    preferred_name: str | None = None,
    prefix: str = "v",
) -> str | None:
    """Resolve the current committed version directory (full path):
    the sidecar-preferred name if it carries ``_COMMITTED``, else the
    highest-numbered committed version, else None. The shared reader
    half of the commit protocol — a torn directory from a crashed
    commit is never returned."""
    r = root.rstrip("/")
    if preferred_name is not None:
        candidate = f"{r}/{preferred_name}"
        if is_committed(spark, candidate):
            return candidate
    for _, name in reversed(list_versions(spark, r, prefix)):
        candidate = f"{r}/{name}"
        if is_committed(spark, candidate):
            return candidate
    return None


def adopt_unmarked_versions(
    spark: SparkSession, root: str, prefix: str = "v"
) -> list[str]:
    """ONE-TIME migration for version roots written BEFORE the commit-
    marker protocol: stamp ``_COMMITTED`` into every ``{prefix}N``
    subdirectory that lacks it, making legacy snapshots visible to the
    marker-requiring readers (SnapshotCache/VerdictCache/LandingJob)
    instead of silently invisible — and, worse, vacuumable as torn.

    Run exactly once, on a root KNOWN to predate the protocol, before
    the first new-style read or vacuum. Do NOT run routinely: on a
    post-protocol root an unmarked dir means a crashed commit, and
    adopting it would publish a version that was never committed.
    Returns the adopted directory paths.
    """
    adopted = []
    r = root.rstrip("/")
    for name in list_names(spark, r, dirs_only=True):
        if not (name.startswith(prefix) and name[len(prefix):].isdigit()):
            continue
        d = f"{r}/{name}"
        if not is_committed(spark, d):
            mark_committed(spark, d)
            adopted.append(d)
    return adopted


def byte_string_as_bytes(spark: SparkSession, s: str) -> int:
    """Parse a Spark size string ('128MB', '134217728b') to bytes."""
    try:
        return int(s)
    except ValueError:
        return int(spark._jvm.org.apache.spark.util.Utils.byteStringAsBytes(s))
