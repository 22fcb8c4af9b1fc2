"""Normalize-chain tests: rename collision, sanitize, add_date (SURVEY §5 item 3)."""

import pytest
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.normalize import (
    add_date,
    clean_column_name,
    normalize,
    rename_events,
    sanitize_columns,
)


def test_clean_column_name():
    # reference clickhouse/helpers.py:87-95: ' ', '/', '(', ')', ',' → '_'
    assert clean_column_name("Event Count") == "Event_Count"
    assert clean_column_name("Source Geographic Country/Region") == "Source_Geographic_Country_Region"
    assert clean_column_name("f(x), y") == "f_x___y"


def test_rename_passthrough_and_map(spark):
    df = spark.createDataFrame([(1, "a", 5)], ["eventCount", "sourceIP", "unmapped_col"])
    out = rename_events(df)
    assert set(out.columns) == {"Event Count", "Source IP", "unmapped_col"}


def test_rename_collision_last_wins(spark):
    # userName and username both map to Username; last source column wins
    # (reference clickhouse/helpers.py:31-32,49 dict-comprehension overwrite).
    df = spark.createDataFrame([("first", "second")], ["userName", "username"])
    out = rename_events(df)
    assert out.columns.count("Username") == 1
    assert out.first()["Username"] == "second"


def test_add_date_epoch_ms_and_s(spark):
    df = spark.createDataFrame(
        [(1_721_430_000,), (1_721_430_000_000,)], ["Start Time"]
    )  # 2024-07-19 (Fri) in s and ms
    out = add_date(df)
    rows = out.collect()
    assert rows[0]["WeekFrom"] == rows[1]["WeekFrom"] == "13/07/2024"
    assert rows[0]["ReportDate"] == "19/07/2024"


def test_add_date_fallback_and_missing(spark):
    df = spark.createDataFrame([(1_721_430_000,)], ["Time"])
    out = add_date(df)
    assert "WeekFrom" in out.columns and "Start Time" in out.columns
    with pytest.raises(ValueError):
        add_date(spark.createDataFrame([(1,)], ["x"]))


def test_normalize_end_to_end(spark):
    df = spark.createDataFrame(
        [(3, "10.0.0.1", 1_721_430_000_000, "u")],
        ["eventCount", "sourceIP", "startTime", "userName"],
    )
    out = normalize(df)
    assert set(out.columns) == {
        "Event_Count", "Source_IP", "Start_Time", "Username", "WeekFrom", "ReportDate",
    }
    r = out.first()
    assert r["Event_Count"] == 3 and r["ReportDate"] == "19/07/2024"
