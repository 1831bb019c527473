"""TableCatalog backend selection. The parquet backend runs for real;
the Iceberg branch (no runtime jar in this sandbox) is exercised at the
API-string level with recording fakes so the ~40 lines of writeTo /
read.table / snapshots SQL are pinned (r1 VERDICT item 9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.sources import catalog as cat_mod
from hdfs_anomaly_detection_spark.sources.catalog import TableCatalog, iceberg_available


# ------------------------------------------------------------- parquet (real)


def test_parquet_backend_roundtrip(spark, tmp_path):
    assert not iceberg_available(spark)  # sandbox has no runtime jar
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    assert cat.use_iceberg is False
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("bucket")
    )
    cat.write(df, "t1", partition_by=["bucket"])
    assert cat.read("t1").count() == 10
    cat.append(df.filter("id < 3"), "t1", partition_by=["bucket"])
    assert cat.read("t1").count() == 13
    snap1 = cat.snapshot("t1")
    cat.append(df.filter("id = 9"), "t1", partition_by=["bucket"])
    assert cat.snapshot("t1") != snap1  # fingerprint tracks the file set


# ------------------------------------------------------- iceberg (API fakes)


class _Recorder:
    def __init__(self):
        self.calls: list[tuple] = []


class _FakeWriteTo:
    def __init__(self, rec, table):
        self.rec, self.table = rec, table

    def using(self, fmt):
        self.rec.calls.append(("using", self.table, fmt))
        return self

    def partitionedBy(self, *cols):
        self.rec.calls.append(("partitionedBy", self.table, len(cols)))
        return self

    def createOrReplace(self):
        self.rec.calls.append(("createOrReplace", self.table))

    def append(self):
        self.rec.calls.append(("append", self.table))


class _FakeDF:
    def __init__(self, rec):
        self.rec = rec

    def writeTo(self, table):
        return _FakeWriteTo(self.rec, table)


class _FakeConf:
    def __init__(self):
        self.kv = {}

    def set(self, k, v):
        self.kv[k] = v


class _FakeRead:
    def __init__(self, rec):
        self.rec = rec

    def table(self, name):
        self.rec.calls.append(("read.table", name))
        return "df"


class _FakeSpark:
    def __init__(self, rec):
        self.conf = _FakeConf()
        self.read = _FakeRead(rec)
        self.rec = rec

    def sql(self, q):
        self.rec.calls.append(("sql", q))

        class _R:
            @staticmethod
            def first():
                return ["12345"]

        return _R()


@pytest.fixture()
def iceberg_cat(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(cat_mod, "iceberg_available", lambda s: True)
    fake = _FakeSpark(rec)
    cat = TableCatalog(fake, "/wh/", catalog="local")
    return cat, fake, rec


def test_iceberg_catalog_conf(iceberg_cat):
    cat, fake, _ = iceberg_cat
    assert cat.use_iceberg is True
    assert fake.conf.kv["spark.sql.catalog.local"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert fake.conf.kv["spark.sql.catalog.local.type"] == "hadoop"
    assert fake.conf.kv["spark.sql.catalog.local.warehouse"] == "/wh"


def test_iceberg_write_append_read(iceberg_cat):
    cat, _, rec = iceberg_cat
    df = _FakeDF(rec)
    cat.write(df, "events", partition_by=None)
    cat.append(df, "events")
    cat.read("events")
    assert ("using", "local.events", "iceberg") in rec.calls
    assert ("createOrReplace", "local.events") in rec.calls
    assert ("append", "local.events") in rec.calls
    assert ("read.table", "local.events") in rec.calls


def test_iceberg_partitioned_write(iceberg_cat, spark):
    # spark fixture requested so F.col has a live JVM behind it
    cat, _, rec = iceberg_cat
    cat.write(_FakeDF(rec), "events", partition_by=["bucket", "day"])
    assert ("partitionedBy", "local.events", 2) in rec.calls


def test_iceberg_snapshot_sql(iceberg_cat):
    cat, _, rec = iceberg_cat
    assert cat.snapshot("events") == "12345"
    sqls = [c[1] for c in rec.calls if c[0] == "sql"]
    assert any(
        "local.events.snapshots" in q and "ORDER BY committed_at DESC" in q
        for q in sqls
    )
