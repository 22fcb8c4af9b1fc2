"""Gap-based sessionization over the event stream.

Not in the reference's surface (SURVEY §2 "not present" list) but core to a
security/UBA engine: group a user's events into sessions separated by ≥ gap of
inactivity.  Classic two-window formulation — lag to mark session starts,
running sum to number them — all JVM window functions, one shuffle on the
partition key.  At 100 TB the shuffle is by ``user_id`` (high cardinality, no
skew hot-spot); the windows never materialize more than a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """One row per (user, session): bounds, event count, value sum.

    ``agg_cols`` maps measure column → output alias (summed per session).
    """
    gap_ms = gap_minutes * 60 * 1000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    marked = df.withColumn(
        "__new_session",
        F.when(
            (
                F.unix_millis(F.col(ts_col))
                - F.unix_millis(F.lag(ts_col).over(w))
            )
            > gap_ms,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for col, alias in (agg_cols or {}).items():
        aggs.append(F.round(F.sum(col), 2).alias(alias))
    return (
        marked.groupBy(user_col, "session_id")
        .agg(*aggs)
        .drop("__new_session")
    )


def sessionize_sql(dialect: str, gap_minutes: int = 30, source: str = "events") -> str:
    """The same sessionization as one SQL string per dialect (oracle twin)."""
    epoch_ms = "unix_millis({c})" if dialect == "spark" else "epoch_ms({c})"
    gap_ms = gap_minutes * 60 * 1000
    prev = epoch_ms.format(c="LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)")
    cur = epoch_ms.format(c="ts")
    return f"""
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM (
        SELECT user_id, ts, value,
               CASE WHEN {cur} - {prev} > {gap_ms}
                    THEN 1 ELSE 0 END AS new_session
        FROM {source}
      ) m
    ) s
    GROUP BY user_id, session_id
    """
