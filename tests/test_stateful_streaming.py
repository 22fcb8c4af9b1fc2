"""Stateful streaming operators: session windows + watermark-bounded dedup.

Same file-source pattern as test_streaming.py (file source ≡ Kafka source API).
Sessionize parity: the streaming output must equal the batch sessionize() rows
for every CLOSED session; the trailing open session stays in state.
"""

import json
import os

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.streaming.stateful import (
    streaming_dedup,
    streaming_sessionize,
)

T0 = 1_721_383_200_000  # 2024-07-19 10:00:00 UTC in ms
MIN = 60_000
SCHEMA = "user_id BIGINT, ts_ms BIGINT, value DOUBLE, event_id BIGINT"


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .json(src)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )


def _ev(user, ts, value=1.0, eid=0):
    return {"user_id": user, "ts_ms": ts, "value": value, "event_id": eid}


def test_streaming_sessionize_closes_on_gap_and_watermark(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # session A: 3 events within the 30-min gap; then a 60-min jump opens B
    _write_jsonl(
        f"{src}/p0.jsonl",
        [
            _ev(1, T0, 1.5),
            _ev(1, T0 + 1 * MIN, 2.0),
            _ev(1, T0 + 2 * MIN, 0.5),
            _ev(1, T0 + 62 * MIN, 3.0),
        ],
    )
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1  # A closed by the gap; B still open in state
    a = got[0]
    assert a["n_events"] == 3 and a["total_value"] == 4.0
    assert a["session_start"].minute == 0 and a["session_end"].minute == 2

    # a much-later event closes B by gap; its own session stays open
    _write_jsonl(f"{src}/p1.jsonl", [_ev(1, T0 + 6 * 3_600_000, 9.0)])
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)
    rows = {r["n_events"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {3, 1}
    assert rows[1]["total_value"] == 3.0  # session B = the single 62-min event


def test_streaming_sessionize_matches_batch_for_closed_sessions(spark, tmp_path):
    from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import sessionize

    src = str(tmp_path / "landing")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    events = [
        _ev(1, T0, 1.0),
        _ev(1, T0 + 5 * MIN, 2.0),
        _ev(2, T0 + 1 * MIN, 4.0),
        _ev(1, T0 + 90 * MIN, 8.0),
        _ev(2, T0 + 95 * MIN, 16.0),
        # closer event far in the future: watermark passes every prior
        # session's end + gap, so timeouts flush users 1 and 2 completely
        _ev(99, T0 + 24 * 3_600_000, 0.0),
    ]
    _write_jsonl(f"{src}/p0.jsonl", events[:3])
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)
    _write_jsonl(f"{src}/p1.jsonl", events[3:5])
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)
    _write_jsonl(f"{src}/p2.jsonl", events[5:])
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)
    # one more empty-progress run so the advanced watermark fires timeouts
    _write_jsonl(f"{src}/p3.jsonl", [_ev(99, T0 + 25 * 3_600_000, 0.0)])
    streaming_sessionize(_stream(spark, src), out, ckpt).awaitTermination(120)

    batch = spark.createDataFrame(
        [(e["user_id"], e["ts_ms"], e["value"]) for e in events[:5]],
        "user_id BIGINT, ts_ms BIGINT, value DOUBLE",
    ).withColumn("ts", F.timestamp_millis("ts_ms"))
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in sessionize(batch, agg_cols={"value": "total_value"}).collect()
    }
    stream_rows = spark.read.parquet(out).where("user_id IN (1, 2)")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in stream_rows.collect()
    }
    assert got == expect and len(got) == 4  # two sessions per user, all closed


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        f"{src}/p0.jsonl",
        [_ev(1, T0, eid=1), _ev(1, T0 + MIN, eid=1), _ev(2, T0, eid=2)],
    )
    streaming_dedup(_stream(spark, src), out, ckpt).awaitTermination(120)
    # duplicate of eid=2 arrives in a later batch, still within the watermark
    _write_jsonl(
        f"{src}/p1.jsonl", [_ev(2, T0 + 2 * MIN, eid=2), _ev(3, T0 + MIN, eid=3)]
    )
    streaming_dedup(_stream(spark, src), out, ckpt).awaitTermination(120)
    eids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert eids == [1, 2, 3]  # first-wins, both in-batch and cross-batch


def test_sessionize_gap_boundary_ms_truncation(spark, tmp_path):
    """Gap semantics are ms-TRUNCATED (unix_millis parity with the batch
    plan): a pair exactly 30 min apart stays in one session (> gap required),
    and a pair 30 min + 500 us apart ALSO stays together because both engines
    compare truncated milliseconds — only >= gap + 1 ms splits. Regression
    for the us-precision state machine taking the raw-us diff."""
    from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import sessionize

    GAP_US = 30 * 60 * 1_000_000
    T0US = T0 * 1000
    rows = [
        # user 1: exactly-gap pair -> ONE session
        (1, T0US), (1, T0US + GAP_US),
        # user 2: gap + 500us -> truncated diff == gap -> still ONE session
        (2, T0US), (2, T0US + GAP_US + 500),
        # user 3: gap + 1ms -> truncated diff > gap -> TWO sessions
        (3, T0US), (3, T0US + GAP_US + 1000),
    ]
    batch = spark.createDataFrame(
        [(u, t, 1.0) for u, t in rows], "user_id BIGINT, ts_us BIGINT, value DOUBLE"
    ).withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    got = {
        (r["user_id"], r["n_events"])
        for r in sessionize(batch, agg_cols={"value": "total_value"}).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 1), (3, 1)}

    # the streaming state machine must agree on every boundary
    src = str(tmp_path / "landing")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        f"{src}/p0.jsonl",
        [{"user_id": u, "ts_us": t, "value": 1.0} for u, t in rows]
        + [{"user_id": 99, "ts_us": T0US + 48 * 3_600_000_000, "value": 0.0}],
    )
    stream = (
        spark.readStream.schema("user_id BIGINT, ts_us BIGINT, value DOUBLE")
        .json(src)
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    )
    streaming_sessionize(stream, out, ckpt).awaitTermination(120)
    # second run: the far-future closer advanced the watermark; timeouts fire
    _write_jsonl(
        f"{src}/p1.jsonl",
        [{"user_id": 99, "ts_us": T0US + 49 * 3_600_000_000, "value": 0.0}],
    )
    streaming_sessionize(stream, out, ckpt).awaitTermination(120)
    sgot = {
        (r["user_id"], r["n_events"])
        for r in spark.read.parquet(out).where("user_id < 99").collect()
    }
    assert sgot == got
