"""hadoop_io: the shared Hadoop FS small-file helpers — roundtrips,
swap-safe overwrite crash windows, and failure signaling."""

from __future__ import annotations

import os

import pytest

from hdfs_anomaly_detection_spark.hadoop_io import (
    read_small,
    read_small_swapped,
    write_small,
    write_small_swap,
)


def test_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "x.json")
    write_small(spark, p, '{"a": 1}')
    assert read_small(spark, p) == '{"a": 1}'
    write_small(spark, p, "v2")  # overwrite
    assert read_small(spark, p) == "v2"


def test_swap_preserves_previous_on_every_window(spark, tmp_path):
    p = str(tmp_path / "s.json")
    write_small_swap(spark, p, "v1")
    assert read_small_swapped(spark, p) == "v1"
    assert not os.path.exists(p + ".tmp")  # tmp renamed away

    write_small_swap(spark, p, "v2")
    assert read_small_swapped(spark, p) == "v2"

    # crash window: delete happened, rename didn't — .tmp holds the new
    os.rename(p, p + ".tmp")
    assert read_small_swapped(spark, p) == "v2"

    # crash window: tmp written, old still in place — old wins (main
    # takes precedence over a not-yet-committed tmp)
    write_small_swap(spark, p, "v3")
    write_small(spark, p + ".tmp", "uncommitted")
    assert read_small_swapped(spark, p) == "v3"


def test_read_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_small_swapped(spark, str(tmp_path / "absent.json"))


def test_partial_tmp_without_main_is_no_snapshot(spark, tmp_path):
    """A crash mid-write of the very first snapshot leaves a partial
    .tmp; it must read as 'no committed snapshot' (FileNotFoundError a
    caller handles as start-fresh), never as truncated text."""
    p = str(tmp_path / "s.json")
    write_small(spark, p + ".tmp", '{"half": tru')  # no checksum header
    with pytest.raises(FileNotFoundError):
        read_small_swapped(spark, p)


def test_next_save_heals_crash_window_before_truncating(spark, tmp_path):
    """Recovery-then-save: after a crash between delete and rename (only
    a valid .tmp survives), the NEXT write_small_swap must promote it
    before creating its own tmp — creating first would truncate the
    sole surviving snapshot while the new one is not yet durable."""
    import os

    p = str(tmp_path / "s.json")
    write_small_swap(spark, p, "v1")
    os.rename(p, p + ".tmp")  # the crash window
    write_small_swap(spark, p, "v2")
    assert read_small_swapped(spark, p) == "v2"
    # and the healed v1 was committed to main before v2's tmp existed
    # (observable: no window raised, both reads succeed)


def test_partial_multibyte_tmp_is_invalid_not_decode_error(spark, tmp_path):
    """A tmp truncated mid multi-byte UTF-8 character classifies as
    'no committed snapshot' — never UnicodeDecodeError (bytes are
    hashed before any decode)."""
    p = str(tmp_path / "s.json")
    write_small_swap(spark, p, "héllo wörld ✓")
    raw = open(p, "rb").read()
    os.remove(p)
    with open(p + ".tmp", "wb") as f:
        f.write(raw[:-2])  # cut inside the final multi-byte char
    with pytest.raises(FileNotFoundError):
        read_small_swapped(spark, p)
    # and the next writer heals by discarding the partial tmp
    write_small_swap(spark, p, "recovered")
    assert read_small_swapped(spark, p) == "recovered"


def test_corrupt_main_raises_value_error(spark, tmp_path):
    p = str(tmp_path / "s.json")
    write_small_swap(spark, p, "v1")
    write_small(spark, p, "scribbled-over")  # bypasses the swap protocol
    with pytest.raises(ValueError, match="checksum"):
        read_small_swapped(spark, p)
