"""Schema drift (B10) + corrupt-record quarantine tests."""

import json
import os

import pytest

from qradar_restapi_kafka_datapipeline_spark.operators.schema_evolution import (
    append_with_evolution,
    diff_schemas,
    read_evolved,
)
from qradar_restapi_kafka_datapipeline_spark.sources.ingest import (
    read_jsonl_stream,
    split_quarantine,
)


def test_additive_drift_accepted_and_merged(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    b2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    assert append_with_evolution(spark, b1, path).added == []
    diff = append_with_evolution(spark, b2, path)
    assert diff.added == ["score"] and diff.compatible
    merged = read_evolved(spark, path)
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got == {1: None, 2: 9.5}  # pre-drift rows NULL-fill, not dropped


def test_retype_drift_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    append_with_evolution(spark, spark.createDataFrame([(1,)], ["id"]), path)
    bad = spark.createDataFrame([("not-an-int",)], ["id"])
    with pytest.raises(ValueError, match="retyped"):
        append_with_evolution(spark, bad, path)


def test_diff_schemas_reports_all_changes(spark):
    a = spark.createDataFrame([(1, "x", 2.0)], ["id", "name", "v"]).schema
    b = spark.createDataFrame([("1", "x", 3)], ["id", "name", "w"]).schema
    d = diff_schemas(a, b)
    assert d.added == ["w"] and d.removed == ["v"]
    assert d.retyped == [("id", "bigint", "string")] and not d.compatible


def test_corrupt_record_quarantine(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(f"{src}/a.jsonl", "w") as f:
        f.write(json.dumps({"eventCount": 1, "startTime": 1_721_383_200_000}) + "\n")
        f.write("TOTAL GARBAGE{{{\n")
    stream = read_jsonl_stream(spark, src, corrupt_col="_corrupt")
    clean, bad = split_quarantine(stream, "_corrupt")
    (
        clean.writeStream.format("parquet")
        .option("path", str(tmp_path / "clean"))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )
    (
        bad.writeStream.format("parquet")
        .option("path", str(tmp_path / "bad"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )
    clean_rows = spark.read.parquet(str(tmp_path / "clean")).collect()
    bad_rows = spark.read.parquet(str(tmp_path / "bad")).collect()
    assert len(clean_rows) == 1 and clean_rows[0]["eventCount"] == 1
    assert len(bad_rows) == 1 and "GARBAGE" in bad_rows[0]["_corrupt"]
