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


def _read_small_bytes(spark: SparkSession, path: str) -> bytes:
    fs, jpath, _ = hadoop_fs(spark, path)
    inp = fs.open(jpath)
    try:
        return bytes(inp.readAllBytes())
    finally:
        inp.close()


def _pack(text: str) -> bytes:
    """Self-validating payload (format: one sha256-hex header line, then
    the body; this format predates any release of the module, so there
    is no legacy unchecksummed data to migrate). A partially written
    file fails validation instead of being mistaken for a committed
    snapshot."""
    import hashlib

    body = text.encode("utf-8")
    return hashlib.sha256(body).hexdigest().encode("ascii") + b"\n" + body


def _unpack(raw: bytes) -> str | None:
    """Body if the header checksum validates, else None (partial or
    corrupt file). Hashes BYTES and decodes only after validation — a
    tmp truncated mid multi-byte UTF-8 character must classify as
    invalid, not raise UnicodeDecodeError."""
    import hashlib

    digest, sep, body = raw.partition(b"\n")
    if not sep or hashlib.sha256(body).hexdigest().encode("ascii") != digest:
        return None
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:  # valid hash of undecodable bytes can't
        return None  # happen via _pack, but never raise on garbage


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
        if _unpack(_read_small_bytes(spark, path + ".tmp")) is not None:
            if not fs.rename(tmp, jpath):
                raise IOError(f"could not heal snapshot {path} from .tmp")
        else:
            fs.delete(tmp, False)  # partial leftover — discard
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(_pack(text)))
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
    as start-fresh — never silently returns truncated text. A main that
    vanishes between the exists check and the open (another PROCESS
    mid-swap — in-process writers are serialized by the caller) falls
    through to the tmp branch instead of surfacing an opaque IO error."""
    fs, jpath, jvm = hadoop_fs(spark, path)
    if fs.exists(jpath):
        try:
            raw = _read_small_bytes(spark, path)
        except Exception as e:  # py4j-wrapped java.io.FileNotFoundException
            if "FileNotFoundException" not in str(e):
                raise  # a real IO failure, not the swap's delete window
        else:
            text = _unpack(raw)
            if text is None:
                raise ValueError(f"snapshot {path} failed checksum validation")
            return text
    tmp = path + ".tmp"
    if fs.exists(jvm.org.apache.hadoop.fs.Path(tmp)):
        text = _unpack(_read_small_bytes(spark, tmp))
        if text is not None:
            return text
    raise FileNotFoundError(path)
