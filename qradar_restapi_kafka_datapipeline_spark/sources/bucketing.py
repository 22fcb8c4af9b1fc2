"""Bucketed tables: co-located joins without shuffles (SURVEY §4, 100 TB path).

A join between two tables bucketed on the same key with the same bucket count
needs NO exchange: each task reads matching buckets from both sides.  For the
engine's recurring joins — events⋈dimensions is broadcast, but events⋈events
(self-join on entity, session stitching, cross-day correlation) is shuffle-bound
— pre-bucketing by the join entity converts every future join/aggregation on
that key into a scan-local operation.  At 100 TB that's the difference between
re-shuffling the fact table per query and never shuffling it at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the SortMergeJoin's per-task
    sort. Bucket count should be sized so bucket × avg-row-size fits an
    executor's task comfortably (at 100 TB: thousands, not 64).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — Catalyst elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
