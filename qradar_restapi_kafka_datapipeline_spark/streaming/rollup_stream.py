"""Streaming summing roll-up (SURVEY §2 B11 streaming mode, §7.2 item 2).

Two modes, one logical pipeline:

- **exact mode (default)** — ``foreachBatch`` + :func:`operators.rollup.merge_rollup`:
  every micro-batch is aggregate-added into the day-partitioned roll-up table.
  Accepts UNBOUNDED lateness, exactly like ClickHouse SummingMergeTree's
  merge-on-read (reference ``clickhouse/clickhouse.py:70-81``) — a row arriving
  a week late still folds into its hour bucket.  Checkpointing makes the sink
  exactly-once per epoch (strictly better than the reference's
  ``insert_deduplicate=False`` at-least-once, ``clickhouse/clickhouse.py:20``).
- **watermark mode** — a native watermarked tumbling-window aggregate for
  low-latency dashboards.  DOCUMENTED DEVIATION: rows later than the watermark
  are dropped; use exact mode when SummingMergeTree parity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from qradar_restapi_kafka_datapipeline_spark.operators.rollup import (
    DEFAULT_MEASURE,
    DEFAULT_TIME_COL,
    merge_rollup,
)


def streaming_rollup_exact(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    measure: str = DEFAULT_MEASURE,
    time_col: str = DEFAULT_TIME_COL,
    available_now: bool = True,
    processing_time: str = "10 seconds",
) -> StreamingQuery:
    """SummingMergeTree-parity sink: aggregate-add each micro-batch.

    ``available_now=True`` drains the backlog then stops — the batch-ingest
    mode (reference's one-shot ``etl``); ``False`` runs continuously at
    ``processing_time`` cadence (its hypothetical live mode).

    Exactly-once: ``foreachBatch`` alone is at-least-once — an epoch that
    merged but crashed before the checkpoint committed is REPLAYED, and an
    aggregate-ADD sink double-counts on replay (unlike an overwrite sink,
    where replay is naturally idempotent).  A ledger of committed epoch ids
    next to the table skips replayed epochs.  The ledger marker is written
    after the merge, so the crash window collapses to the marker write
    (~one small file) instead of the whole merge; a transactional table
    format (Delta/Iceberg txn-id) closes even that at production scale.
    The reference is strictly weaker on the same axis: at-least-once with
    dedup off (``insert_deduplicate=False``, clickhouse/clickhouse.py:20).
    """
    def fold(batch: DataFrame, epoch: int) -> None:
        # Hadoop FS API, not os.path: checkpoint may be s3a://, hdfs://, ...;
        # foreachBatch runs on the driver, so one FS round-trip per epoch.
        spark_ = batch.sparkSession
        jvm = spark_._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{checkpoint}/_committed_epochs/{epoch}"
        )
        fs = marker.getFileSystem(spark_._jsc.hadoopConfiguration())
        if fs.exists(marker):  # replayed epoch — already merged
            return
        if batch.isEmpty():
            return
        merge_rollup(
            spark_, batch, out_path, measure=measure, time_col=time_col
        )
        fs.create(marker, True).close()

    writer = (
        df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def rollup_events_streaming(spark, sf_dir: str, n_batches: int = 3) -> DataFrame:
    """Replay the qevents relation through the EXACT streaming roll-up and
    return the final table — the proof that the incremental foreachBatch
    merge computes the same relation as the one-shot batch aggregate
    (reference SummingMergeTree merge-on-read ≡ merge-on-write here).

    The roll-up inputs are split across ``n_batches`` parquet files replayed
    as micro-batches (``maxFilesPerTrigger=1``); rows of the same hour land
    in different batches, so the aggregate-add path (not just first-insert)
    is exercised.  No watermark/sentinel machinery is needed: exact mode
    accepts unbounded lateness by construction.
    """
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = spark.table("qevents").select("ts", "domainId", "eventName", "eventCount")
    base = tempfile.mkdtemp(prefix="rollup_stream_")
    src = os.path.join(base, "landing")
    os.makedirs(src)

    tbl = pa.Table.from_pandas(cols.toPandas(), preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl["ts"].cast(pa.timestamp("us", tz="UTC")),
    )
    now = 1_700_000_000
    for i in range(n_batches):
        # positional round-robin: any split yields the same merged result —
        # that invariance is exactly what the entry asserts
        part = tbl.filter(
            pa.array([j % n_batches == i for j in range(tbl.num_rows)], pa.bool_())
        )
        path = os.path.join(src, f"b{i}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = os.path.join(base, "rollup"), os.path.join(base, "ckpt")
    streaming_rollup_exact(
        stream, out, ckpt, measure="eventCount", time_col="ts"
    ).awaitTermination()
    return spark.read.parquet(out).select(
        F.col("ts").alias("Start_Time"),
        "domainId",
        "eventName",
        F.col("eventCount").cast("bigint").alias("Event_Count"),
    )


def rollup_events_streaming_watermarked(
    spark,
    sf_dir: str,
    n_batches: int = 3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Replay qevents through the WATERMARKED roll-up and return the final
    table — the parity proof for the low-latency mode.

    The exact-mode replay (:func:`rollup_events_streaming`) can split rows
    round-robin because aggregate-add accepts unbounded lateness; here the
    split is CONTIGUOUS IN EVENT TIME (how a real stream arrives), so every
    row lands within ``watermark`` of the running max event time and nothing
    is dropped — making the append-mode windowed aggregate equal the batch
    ``GROUP BY hour`` exactly.  Two far-future sentinel batches push the final
    watermark past every real window's end so the last windows flush (append
    mode only emits a window once the watermark passes it); sentinels carry a
    reserved ``domainId`` and are filtered from the result.
    """
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = (
        spark.table("qevents")
        .select("ts", "domainId", "eventName", "eventCount")
        .orderBy("ts")
    )
    base = tempfile.mkdtemp(prefix="rollup_wm_stream_")
    src = os.path.join(base, "landing")
    os.makedirs(src)

    tbl = pa.Table.from_pandas(cols.toPandas(), preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl["ts"].cast(pa.timestamp("us", tz="UTC")),
    )
    now = 1_700_000_000
    chunk = (tbl.num_rows + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = tbl.slice(i * chunk, chunk)  # time-ordered contiguous ranges
        path = os.path.join(src, f"b{i}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now + 10 * i, now + 10 * i))

    y2034_us = 2_019_686_400 * 1_000_000
    for j, ts_us in enumerate([y2034_us, y2034_us + 86_400_000_000]):
        sent = pa.table(
            {
                "ts": pa.array([ts_us], pa.timestamp("us", tz="UTC")),
                "domainId": pa.array([-1], pa.int64()),
                "eventName": pa.array(["__sentinel__"], pa.string()),
                "eventCount": pa.array([0], pa.int64()),
            }
        )
        path = os.path.join(src, f"z{j}.parquet")
        pq.write_table(sent, path)
        os.utime(path, (now + 10 * (n_batches + j), now + 10 * (n_batches + j)))

    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = os.path.join(base, "rollup"), os.path.join(base, "ckpt")
    streaming_rollup_watermarked(
        stream, out, ckpt, measure="eventCount", time_col="ts", watermark=watermark
    ).awaitTermination()
    return (
        spark.read.parquet(out)
        .where(F.col("domainId") >= 0)
        .select(
            F.col("ts").alias("Start_Time"),
            "domainId",
            "eventName",
            F.col("eventCount").cast("bigint").alias("Event_Count"),
        )
    )


def streaming_rollup_watermarked(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    measure: str = DEFAULT_MEASURE,
    time_col: str = DEFAULT_TIME_COL,
    watermark: str = "2 hours",
    dims: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Low-latency native windowed aggregate (late rows beyond ``watermark``
    are dropped — the documented deviation from SummingMergeTree)."""
    if dims is None:
        dims = [c for c in df.columns if c not in (measure, time_col)]
    agg = (
        df.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), "1 hour").alias("w"), *dims)
        .agg(F.sum(measure).alias(measure))
        .select(
            F.col("w.start").alias(time_col),
            *dims,
            measure,
        )
        .withColumn("event_date", F.to_date(F.col(time_col)))
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .partitionBy("event_date")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
