"""Shared Hadoop FileSystem small-file IO.

One home for the getFileSystem + create/overwrite + readAllBytes
boilerplate the vector-store sidecar/marker/lock, the manifest's
partition clears, and the streaming heavy-hitter snapshots all need —
so durable sidecar state always lives WHERE THE DATA LIVES (hdfs://,
s3a://, file:), never silently on driver-local disk, and a filesystem
quirk fix lands in exactly one place.

Hadoop's ``FileSystem.rename``/``delete`` signal failure by returning
``false`` rather than throwing — the helpers here check and raise.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for ``path`` via the Hadoop FS API —
    the same filesystem the dataframes write through."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jpath, jvm


def write_small(spark: SparkSession, path: str, text: str) -> None:
    """Overwrite ``path`` with ``text`` (small sidecar files only)."""
    fs, jpath, _ = hadoop_fs(spark, path)
    out = fs.create(jpath, True)  # overwrite=True
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_small(spark: SparkSession, path: str) -> str:
    fs, jpath, _ = hadoop_fs(spark, path)
    inp = fs.open(jpath)
    try:
        # readAllBytes RETURNS byte[] (py4j auto-converts to Python
        # bytes); a readFully(buf) would mutate a py4j copy instead
        return bytes(inp.readAllBytes()).decode("utf-8")
    finally:
        inp.close()


def write_small_swap(spark: SparkSession, path: str, text: str) -> None:
    """Crash-safe overwrite: write ``path + ".tmp"`` durably first,
    then delete-old + rename. Every crash window leaves a readable
    snapshot for :func:`read_small_swapped`:

    * before the delete — the old ``path`` is intact;
    * between delete and rename — the new ``.tmp`` is complete;
    * after the rename — the new ``path`` is in place.
    """
    fs, jpath, jvm = hadoop_fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath) and not fs.delete(jpath, False):
        raise IOError(f"could not replace snapshot {path}")
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename {path}.tmp -> {path} failed")


def read_small_swapped(spark: SparkSession, path: str) -> str:
    """Read a :func:`write_small_swap` snapshot, falling back to the
    ``.tmp`` file when a crash died between its delete and rename."""
    fs, jpath, jvm = hadoop_fs(spark, path)
    if fs.exists(jpath):
        return read_small(spark, path)
    tmp = path + ".tmp"
    if fs.exists(jvm.org.apache.hadoop.fs.Path(tmp)):
        return read_small(spark, tmp)
    raise FileNotFoundError(path)
