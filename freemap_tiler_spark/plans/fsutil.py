"""Filesystem operations through the Hadoop FileSystem API.

Driver-side file management (slice promotion, staging swaps) must work on
whatever filesystem backs the store root — local disk in tests, HDFS/S3/
GCS on a cluster.  ``os.rename``/``shutil`` only work for local paths, so
every move/delete here routes through the JVM's resolved FileSystem for
the path's scheme (the same mechanism Spark's own committers use).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _jfs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _jfs(spark, path)
    return bool(fs.exists(p))


def fs_delete(spark: SparkSession, path: str) -> None:
    fs, p, _ = _jfs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic on HDFS/local; S3A emulates with copy+delete (documented
    Hadoop behavior — callers keep a recorded commit row as the source of
    truth, never the rename alone)."""
    fs, s, jvm = _jfs(spark, src)
    return bool(fs.rename(s, jvm.org.apache.hadoop.fs.Path(dst)))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _jfs(spark, path)
    fs.mkdirs(p)


def fs_listdir(spark: SparkSession, path: str) -> list[str]:
    """Basenames of directory entries ([] if the path is absent)."""
    fs, p, _ = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]
