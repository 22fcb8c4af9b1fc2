"""Streaming text-curation pipe — the north-star ops as a document stream.

A training-data pipeline doesn't only run curation as batch sweeps: documents
arrive continuously (crawl landings, upload queues) and the stateless scoring
pass — language-ID, quality, token counts, PII scrub — runs as a Structured
Streaming projection with exactly the SQL expressions the batch path uses
(operators/text.py, operators/pii.py: one source of truth, so the streaming
result is oracle-checkable against the batch recompute).

The replay harness streams the documents table in Spark-written hash splits
(no driver materialization, same discipline as streaming/rollup_stream.py).
Stateless projections need no watermark: every micro-batch appends its scored
rows and the union over batches equals the batch relation row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.pii import pii_redact_sql
from qradar_restapi_kafka_datapipeline_spark.operators.text import (
    lang_id_sql,
    quality_score_sql,
    word_count_sql,
)


def curation_projection_sql(dialect: str, source: str = "documents") -> str:
    """The scored-document relation, one dialect-common definition.

    ``redacted_chars`` rides the PII chain so the scrub is part of the
    streamed plan (the synthetic docs are clean, so it equals ``n_chars`` —
    the point is the expression runs per micro-batch, value-checked).
    """
    return (
        f"SELECT doc_id, {lang_id_sql('text')} AS lang_pred, "
        f"{quality_score_sql('text', dialect)} AS quality, "
        f"CAST({word_count_sql('text', dialect)} AS BIGINT) AS n_words, "
        f"CAST(length({pii_redact_sql('text', dialect)}) AS BIGINT) "
        "AS redacted_chars "
        f"FROM {source}"
    )


def curate_documents_streaming(spark, sf_dir: str, n_batches: int = 3) -> DataFrame:
    """Replay the documents table through the streaming curation projection
    and return the scored relation — parity proof that the streamed pass
    computes exactly the batch relation (oracle: the same projection in
    DuckDB over the full table).
    """
    import os
    from qradar_restapi_kafka_datapipeline_spark.engine import scratch_dir

    from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
        _write_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = scratch_dir("curation_stream_")
    src = os.path.join(base, "landing")
    os.makedirs(src)
    now = 1_700_000_000
    for i in range(n_batches):
        path = os.path.join(src, f"b{i}.parquet")
        _write_split(
            docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == i), path
        )
        os.utime(path, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream.createOrReplaceTempView("__curation_stream")
    scored = spark.sql(curation_projection_sql("spark", "__curation_stream"))
    out, ckpt = os.path.join(base, "scored"), os.path.join(base, "ckpt")
    (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out)


def dsir_apply_streaming(
    spark,
    artifact: str,
    new_batch_sql: str,
    n_batches: int = 3,
    _crash_after_write_epoch: int | None = None,
) -> DataFrame:
    """Score a replayed NEW-document stream against a FROZEN DSIR selector
    (round 7, VERDICT r6 #4): the frozen-apply shape
    (:func:`~qradar_restapi_kafka_datapipeline_spark.operators.curation.dsir_apply_sql`)
    is exactly the stream-scoring posture — corpus statistics frozen in the
    ``(bucket, l6)`` artifact, one linear pass per batch — so the streaming
    twin is the batch kernel run per micro-batch via foreachBatch (the
    per-doc bigram self-join and score aggregate are intra-batch: each
    document lands whole in its hash split, so the union over batches
    equals the one-shot apply row-for-row).

    Output lands as per-epoch immutable parts (the round-7 replay-safe
    protocol shared with the sketch folds: a replayed epoch overwrites its
    own part, no commit window); ``_crash_after_write_epoch`` injects a
    crash for the replay test.  The gate oracle recomputes the whole apply
    from the artifact in DuckDB, so a lost/duplicated batch or any drift
    from the batch kernel hash-fails.
    """
    import os

    from qradar_restapi_kafka_datapipeline_spark.engine import scratch_dir
    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        dsir_apply_sql,
    )
    from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
        _write_split,
    )

    docs = spark.sql(f"SELECT doc_id, text FROM {new_batch_sql} nb")
    base = scratch_dir("dsir_stream_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    now = 1_700_000_000
    for i in range(n_batches):
        path = os.path.join(landing, f"b{i}.parquet")
        _write_split(
            docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == i),
            path,
        )
        os.utime(path, (now + 10 * i, now + 10 * i))

    out = os.path.join(base, "scored")
    ckpt = os.path.join(base, "ckpt")
    armed = {"epoch": _crash_after_write_epoch}

    def fold(batch, epoch: int) -> None:
        if batch.isEmpty():
            return
        batch.createOrReplaceTempView("__dsir_stream_batch")
        scored = batch.sparkSession.sql(
            dsir_apply_sql("spark", artifact, "__dsir_stream_batch")
        )
        scored.write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={epoch}")
        )
        if armed["epoch"] is not None and epoch >= armed["epoch"]:
            armed["epoch"] = None
            raise RuntimeError(
                "injected crash after scored-part write (replay test)"
            )

    def run() -> None:
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    try:
        run()
    except Exception:
        if _crash_after_write_epoch is None:
            raise
        run()
    return spark.read.parquet(out).select("doc_id", "dsir_score", "keep")
