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


def _pack(text: str) -> str:
    """Self-validating payload: sha256 header + body. A partially
    written file fails validation instead of being mistaken for a
    committed snapshot."""
    import hashlib

    return hashlib.sha256(text.encode("utf-8")).hexdigest() + "\n" + text


def _unpack(raw: str) -> str | None:
    """Body if the header checksum validates, else None (partial or
    corrupt file)."""
    import hashlib

    digest, sep, text = raw.partition("\n")
    if not sep:
        return None
    return text if hashlib.sha256(text.encode("utf-8")).hexdigest() == digest else None


def write_small_swap(spark: SparkSession, path: str, text: str) -> None:
    """Crash-safe overwrite: heal any previous crash, write a
    checksummed ``path + ".tmp"``, then delete-old + rename. Every
    crash window leaves a COMMITTED snapshot recoverable by
    :func:`read_small_swapped`:

    * a prior crash between delete and rename left only a VALID
      ``.tmp`` — promoted back to ``path`` here BEFORE the new tmp is
      created (creating the tmp first would truncate the sole
      surviving snapshot);
    * crash mid-tmp-write — the partial tmp fails its checksum and is
      ignored; the old ``path`` (if any) is intact;
    * crash between delete and rename — the new ``.tmp`` is complete
      and validates;
    * after the rename — the new ``path`` is in place.

    NOT safe for concurrent writers of the same path — serialize
    externally (delete + rename cannot be made atomic together here).
    """
    fs, jpath, jvm = hadoop_fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    if not fs.exists(jpath) and fs.exists(tmp):
        if _unpack(read_small(spark, path + ".tmp")) is not None:
            if not fs.rename(tmp, jpath):
                raise IOError(f"could not heal snapshot {path} from .tmp")
        else:
            fs.delete(tmp, False)  # partial leftover — discard
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(_pack(text).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath) and not fs.delete(jpath, False):
        raise IOError(f"could not replace snapshot {path}")
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename {path}.tmp -> {path} failed")


def read_small_swapped(spark: SparkSession, path: str) -> str:
    """Read a :func:`write_small_swap` snapshot: ``path`` when its
    checksum validates, else a VALID ``.tmp`` (crash between delete
    and rename). A partial/corrupt tmp with no main raises
    FileNotFoundError — "no committed snapshot", which callers treat
    as start-fresh — never silently returns truncated text."""
    fs, jpath, jvm = hadoop_fs(spark, path)
    if fs.exists(jpath):
        text = _unpack(read_small(spark, path))
        if text is None:
            raise ValueError(f"snapshot {path} failed checksum validation")
        return text
    tmp = path + ".tmp"
    if fs.exists(jvm.org.apache.hadoop.fs.Path(tmp)):
        text = _unpack(read_small(spark, tmp))
        if text is not None:
            return text
    raise FileNotFoundError(path)
