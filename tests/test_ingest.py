"""JSONL/CSV ingestion: schema enforcement + corrupt-record accounting
(reference: line-wise json.loads with silent continue,
evaluation/anomaly_evaluation.py:76-87; CSV loads,
training/hdfs_line_level_loader_v2.py:23-29)."""

import os

from hdfs_anomaly_detection_spark.sources.ingest import (
    read_csv,
    read_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_and_corrupt_accounting(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"text": "hello", "label": 0}\n')
        f.write('{"text": "world", "label": 1}\n')
        f.write("{not json at all\n")
        f.write('{"text": "ok", "label": 2}\n')
    res = read_jsonl(spark, p, "text string, label int")
    assert res.good.count() == 3
    corrupt = res.corrupt.collect()
    assert len(corrupt) == 1
    assert corrupt[0]["line"].startswith("{not json")
    assert corrupt[0]["reason"] == "jsonl parse error"

    out = str(tmp_path / "out")
    write_jsonl(res.good, out, n_files=1)
    back = read_jsonl(spark, out, "text string, label int")
    assert back.corrupt.count() == 0
    assert sorted(r["text"] for r in back.good.collect()) == ["hello", "ok", "world"]


def test_csv_scan_with_schema(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("event_id,content\n")
        f.write("E1,Receiving block blk_1\n")
        f.write("E2,Deleting block blk_2\n")
    res = read_csv(spark, p, "event_id string, content string")
    assert res.good.count() == 2
    assert res.corrupt.count() == 0
    rows = {r["event_id"]: r["content"] for r in res.good.collect()}
    assert rows["E1"] == "Receiving block blk_1"


def test_csv_corrupt_rows_flagged(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("a,b\n")
        f.write("1,2\n")
        f.write('"unterminated,3\n')
    res = read_csv(spark, p, "a int, b int")
    assert res.good.count() == 1
    assert res.corrupt.count() == 1


def test_csv_results_sink_roundtrip(spark, tmp_path):
    from hdfs_anomaly_detection_spark.sources.ingest import read_csv, write_csv_results

    df = spark.createDataFrame(
        [(0, "not_null_text", 3, False), (1, "not_null_text", 0, True)],
        "part_id int, check_id string, n_violations int, passed boolean",
    )
    out = str(tmp_path / "results_csv")
    write_csv_results(df, out)
    back = read_csv(
        spark, out, "part_id int, check_id string, n_violations int, passed boolean"
    )
    assert back.corrupt.count() == 0
    rows = {r["part_id"]: r["n_violations"] for r in back.good.collect()}
    assert rows == {0: 3, 1: 0}
    import glob

    assert len(glob.glob(f"{out}/part-*.csv")) == 1  # coalesced results file


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from hdfs_anomaly_detection_spark.sources.ingest import read_orc, write_orc

    df = spark.range(100).selectExpr("id", "id % 5 as grp", "cast(id * 1.5 as double) as v")
    out = str(tmp_path / "orc_t")
    write_orc(df, out, partition_by=["grp"])
    back = read_orc(spark, out)
    assert back.count() == 100
    sel = back.filter("grp = 3 and v > 10")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    # partition pruning + predicate pushdown reach the ORC scan
    assert "PartitionFilters" in plan and "PushedFilters" in plan
    assert sel.count() == sum(1 for i in range(100) if i % 5 == 3 and i * 1.5 > 10)
