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
