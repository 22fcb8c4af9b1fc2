"""Ingest layer: JSONL / Kafka event streams → normalize → roll-up sink.

This is the reference's ETL path reborn (``etl.py:16-96``: ijson streaming
parse → add_date → rename → micro-batch → Arrow pivot → ClickHouse insert), as
Structured Streaming:

- ijson incremental parse (B3)         → distributed JSONL / Kafka-value
  ``from_json`` with a pinned schema (per-first-row inference is the reference
  bug SURVEY §1.2 says not to reproduce)
- micro-batcher w/ batch size (B7)     → ``maxFilesPerTrigger`` /
  ``maxOffsetsPerTrigger`` + trigger cadence
- Range-header resumability (B2)       → source offsets in the checkpoint
- tenacity retry (B19)                 → task retries + checkpoint recovery
- per-(customer, query) tables (B15)   → sanitized sink paths

Kafka requires the spark-sql-kafka package on the cluster; the reader here just
declares the plan (gated at call time so the local test env, which has no
broker, never touches it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from qradar_restapi_kafka_datapipeline_spark.operators.normalize import normalize

# Canonical raw-event schema (FIXTURES.md A1) — pinned, never first-row-inferred.
RAW_EVENT_DDL = (
    "domainName STRING, domainId BIGINT, eventCount BIGINT, sourceIP STRING, "
    "destinationIP STRING, sourcePort INT, destinationPort INT, "
    "startTime BIGINT, qid BIGINT, category INT, highlevelcategory INT, "
    "devicetype INT, logSourceId BIGINT, userName STRING, magnitude INT"
)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str = RAW_EVENT_DDL,
    max_files_per_trigger: int | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Streaming scan of a JSONL directory with a pinned schema.

    ``corrupt_col`` keeps unparseable lines instead of dissolving them into
    all-NULL rows: the raw text lands in that column (PERMISSIVE mode), so a
    quarantine sink can ``where(col(corrupt_col).isNotNull())`` them out.
    """
    reader = spark.readStream
    if corrupt_col is not None:
        if isinstance(schema, str):
            schema = f"{schema}, {corrupt_col} STRING"
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def split_quarantine(df: DataFrame, corrupt_col: str) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split on the corrupt-record column.

    The quarantine side keeps the full row (Spark also disallows projecting
    ONLY the corrupt column from raw JSON — QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    partially-parsed fields are useful forensics anyway.
    """
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull())
    return clean, bad


def parse_kafka_values(raw: DataFrame, schema: StructType | str = RAW_EVENT_DDL) -> DataFrame:
    """Kafka wire rows → parsed event rows: value bytes → ``from_json`` with
    the pinned schema.  ONE definition consumed by both the real source
    (:func:`read_kafka_stream`) and the file-backed loopback fake
    (``sources/kafka_fake.py``), so the tested parse chain IS the production
    one."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType | str = RAW_EVENT_DDL,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    sasl_jaas: str | None = None,
) -> DataFrame:
    """Kafka topic → parsed event rows (B14's consumer side, done properly).

    The reference provisions a SASL_PLAINTEXT broker it never uses
    (``mykafka/producer.py:7-20``, ``docker-compose.yml:10-28``); here Kafka is
    a first-class source: value bytes → ``from_json`` with the pinned schema.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    if sasl_jaas is not None:
        reader = (
            reader.option("kafka.security.protocol", "SASL_PLAINTEXT")
            .option("kafka.sasl.mechanism", "PLAIN")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """Kafka sink (B14 parity — the reference's producer, wired for real)."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def normalize_stream(df: DataFrame) -> DataFrame:
    """The per-event transform chain (B5/B6/B8/B9) — identical code for batch
    and streaming DataFrames; Catalyst fuses it with the source scan."""
    return normalize(df)


def table_name(customer_name: str, query_name: str) -> str:
    """Sink table name ``{customer}_{query}`` with the reference's
    sanitization: strip space, quotes, ``&`` and ``_`` from the customer
    (reference etl.py:68-77)."""
    cleaned = customer_name
    for ch in (" ", "'", '"', "&", "_"):
        cleaned = cleaned.replace(ch, "")
    return f"{cleaned}_{query_name}"
