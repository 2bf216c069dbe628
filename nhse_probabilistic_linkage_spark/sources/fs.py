"""Filesystem plumbing through the Hadoop FileSystem API.

The pipeline's durability features — the resume manifest, streaming commit
markers — must work wherever the warehouse lives (HDFS, S3A, DBFS, local
file:). Python's os.* only sees the driver's local disk, so every path probe
and small-file read/write goes through the JVM's Hadoop FS client instead,
which resolves the scheme from the path and the active Hadoop configuration.

Reference analog: the reference persists its model/run state as rows in a
Delta table (/root/reference/utils/model_utils.py:107-125) precisely so that
state lives in the same durable store as the data; these helpers give the
engine's JSON manifests the same property without a metastore dependency.

Only small control files go through this module (a manifest is a few hundred
bytes); bulk data always moves via spark.read/write.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    filesystem = jpath.getFileSystem(conf)
    # LocalFileSystem is checksummed (shadow .crc files); control files here
    # are tiny and may be hand-edited (a manifest is user-serviceable), so a
    # stale CRC must not brick a resume — use the raw FS where one exists.
    try:
        filesystem = filesystem.getRawFileSystem()
    except Exception:
        pass  # not a ChecksumFileSystem (hdfs/s3a/...) — use as-is
    return filesystem, jpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs_and_path(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    fs, p, _ = _fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def read_text(spark: SparkSession, path: str) -> str | None:
    """Contents of a small text file, or None if it does not exist."""
    fs, p, jvm = _fs_and_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file atomically: create a sibling temp file and
    rename over the target (rename is atomic on HDFS/local; on object stores
    it is copy+delete, still leaving either old or new content, never a
    torn write)."""
    fs, p, _ = _fs_and_path(spark, path + ".tmp")
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    fs_t, target, _ = _fs_and_path(spark, path)
    if fs_t.exists(target):
        fs_t.delete(target, False)
    fs.rename(p, target)


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (parents included)."""
    fs, p, _ = _fs_and_path(spark, path)
    out = fs.create(p, True)
    out.close()


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory (empty list if it does not exist)."""
    fs, p, _ = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [status.getPath().getName() for status in fs.listStatus(p)]


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, p_src, _ = _fs_and_path(spark, src)
    _, p_dst, _ = _fs_and_path(spark, dst)
    return bool(fs.rename(p_src, p_dst))


def join(*parts: str) -> str:
    """URI-safe path join (os.path.join would mangle scheme-prefixed paths
    on non-POSIX hosts; Hadoop paths are always '/'-separated)."""
    return "/".join(s.rstrip("/") for s in parts if s)
