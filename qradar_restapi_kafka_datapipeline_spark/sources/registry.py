"""Table registry: parquet sources → named temp views (SURVEY §2 A1/A2).

The reference's "source" is a QRadar REST search streamed as JSON
(``qradar/qradarconnector.py:108-166``); its table registry is the queries.json /
ep_clients.json loader (``attributes.py:42-51``).  Here a source is any path Spark
can scan; registration makes it addressable from both the DataFrame API and SQL
(the AQL frontend resolves ``FROM events`` / ``FROM GLOBALVIEW(...)`` against
these views).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.sources.qevents import qevents_sql

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True
) -> dict[str, DataFrame]:
    """Read every synthetic table; optionally register temp views by name.

    Schema inference is one driver→file round-trip per table; issuing them
    from a thread pool overlaps the I/O (Spark driver calls are thread-safe),
    cutting cold registration from ~3 s to well under 1 s locally — and on a
    real cluster, from one object-store HEAD+footer read per table serially to
    all of them in flight at once.
    """
    from concurrent.futures import ThreadPoolExecutor

    def read_one(name: str) -> tuple[str, DataFrame] | None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            return None
        df = spark.read.parquet(path)
        if name == "events":
            # Normalize ts across testdata generations: TIMESTAMP(NANOS)
            # files arrive as int64 nanos under nanosAsLong → floor-divide
            # to µs (DuckDB's ns→µs truncation); tz-naive TIMESTAMP(MICROS)
            # files arrive as TIMESTAMP_NTZ → cast to the session (UTC)
            # timestamp, an identity under UTC and what DuckDB's epoch_ms
            # computes on the same naive value.
            from pyspark.sql.types import LongType, TimestampNTZType

            dt = df.schema["ts"].dataType
            if isinstance(dt, LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif isinstance(dt, TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return name, df

    with ThreadPoolExecutor(max_workers=len(TABLES)) as pool:
        loaded = [r for r in pool.map(read_one, TABLES) if r is not None]
    out: dict[str, DataFrame] = dict(loaded)
    if register:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
    return out


def register_qevents(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Register the QRadar-shaped `qevents` view derived from `events`.

    Requires `events` to be registered (load_tables does it). The derivation SQL
    is shared with the DuckDB oracle (sources/qevents.py) so both engines see the
    identical synthetic relation.
    """
    if "events" not in [t.name for t in spark.catalog.listTables()]:
        load_tables(spark, sf_dir)
    df = spark.sql(qevents_sql("spark"))
    df.createOrReplaceTempView("qevents")
    return df

def materialize_events_day_partitioned(
    spark: SparkSession, path: str, source: str = "qevents"
) -> DataFrame:
    """Write the events relation DAY-PARTITIONED (``event_date=YYYY-MM-DD/``
    directories) and return the partition-aware reader.

    This is the storage layout a 100 TB deployment lands events in (the
    reference's ClickHouse tables use the same daily PARTITION BY, SURVEY
    §2 B11): a time-bounded scan then prunes at the FILE level before any
    row is read.  Pair with ``AQLFrontend(partition_col="event_date")`` so
    START/STOP clauses derive the constant DATE bounds Catalyst needs —
    a ``ts`` predicate alone cannot prune partitions.
    """
    from pyspark.sql import functions as F

    (
        spark.table(source)
        .withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    return spark.read.option("basePath", path).parquet(path)
