"""Custom stateful streaming operators (beyond-reference, SURVEY §2 "not
present" list: session windows + streaming dedup).

The reference has no streaming state at all — its "state" is ClickHouse
merge-on-read (``clickhouse/clickhouse.py:70-81``).  Here the engine owns the
state natively:

- **streaming_sessionize** — gap-based session windows per user via
  ``applyInPandasWithState``: the one Structured Streaming surface for
  operators whose semantics built-in windowed aggs can't express (a session's
  end depends on data, not the clock grid).  State per user is O(1) — the open
  session's (start, end, count, sum) — so 100 M users ≈ a few GB of state
  store, RocksDB-backed on a real cluster.  Sessions close either when a new
  event arrives ≥ gap after the previous one (emitted immediately) or when the
  event-time watermark passes ``session_end + gap`` (timeout path) — so every
  session is emitted exactly once, matching the batch :func:`operators.
  sessionize.sessionize` on the same data once all input is ingested.
- **streaming_dedup** — exact first-wins dedup with BOUNDED state via
  ``dropDuplicatesWithinWatermark``: duplicate keys arriving within the
  watermark interval of each other collapse; state for a key is dropped once
  the watermark passes, so state size tracks the (rate × watermark) window,
  not the stream's lifetime.  This is the streaming twin of the batch
  ``operators.dedup.dedup_exact``.

Mirrors the batch/stream duality of the roll-up (``rollup_stream.py``): same
logical result, streaming physical plan.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# open session per user: (start_ms, end_ms, n_events, value_sum)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("vsum", DoubleType()),
    ]
)


def _session_fn(gap_ms: int):
    """Build the per-group stateful function.

    Pandas-batched (Arrow transfer), one state round-trip per (user, batch):
    events are folded in event-time order into the open session; each gap
    > ``gap_ms`` closes a session (yielded) and opens the next.  The surviving
    open session goes back into state with an event-time timeout at
    ``end + gap`` — when the watermark passes that, no future event can extend
    the session, so the timeout path emits it and clears state.
    """
    import pandas as pd  # executor-side import

    def fn(
        key: Tuple[Any, ...], pdf_iter: Iterator["pd.DataFrame"], state
    ) -> Iterator["pd.DataFrame"]:
        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [
                        pd.Timestamp(s, unit="ms", tz="UTC") for s, *_ in rows
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="ms", tz="UTC") for _, e, *_ in rows
                    ],
                    "n_events": [n for _, _, n, _ in rows],
                    "total_value": [round(v, 2) for *_, v in rows],
                }
            )

        if state.hasTimedOut:
            start, end, n, vsum = state.get
            state.remove()
            yield emit([(start, end, n, vsum)])
            return

        parts = [p for p in pdf_iter]
        pdf = pd.concat(parts).sort_values("ts")
        ts = pd.to_datetime(pdf["ts"])
        epoch = pd.Timestamp(0, tz=ts.dt.tz) if ts.dt.tz is not None else pd.Timestamp(0)
        ts_ms = ((ts - epoch) // pd.Timedelta(milliseconds=1)).tolist()
        vals = pdf["value"].tolist()

        if state.exists:
            start, end, n, vsum = state.get
        else:
            start = None
            end = n = 0
            vsum = 0.0

        closed = []
        for t, v in zip(ts_ms, vals):
            if start is None:
                start, end, n, vsum = t, t, 1, float(v)
            elif t - end > gap_ms:
                closed.append((start, end, n, vsum))
                start, end, n, vsum = t, t, 1, float(v)
            else:
                end = max(end, t)
                n += 1
                vsum += float(v)

        state.update((start, end, n, vsum))
        state.setTimeoutTimestamp(end + gap_ms)
        if closed:
            yield emit(closed)

    return fn


def streaming_sessionize(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous gap-sessionization: one output row per CLOSED session.

    Input must be a streaming DataFrame with event-time ``ts_col``.  Events
    later than ``watermark`` are dropped by the engine before reaching state
    (the price of bounded state; batch :func:`sessionize` has no such bound).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = df.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", watermark)

    sessions = src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1000),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """First-wins streaming dedup with watermark-bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only until the
    watermark passes its event time + interval — duplicates within that span
    collapse to the first arrival; state never grows unboundedly (the failure
    mode of plain ``dropDuplicates`` on an infinite stream).
    """
    if key_cols is None:
        key_cols = ["event_id"]
    deduped = df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
