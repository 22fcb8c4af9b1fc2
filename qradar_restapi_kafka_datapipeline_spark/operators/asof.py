"""As-of (temporal) join: each left row picks the most recent right row.

Not in the reference's surface (SURVEY §2 "not present" list) but a staple of
event-time analytics the engine must offer (latest profile/config/rate at event
time).  Spark has no native ASOF JOIN; the naive formulation — equi-join on key
with ``r.ts <= l.ts`` then argmax — materializes every (left, right-history)
pair, quadratic in per-key history length.

This implementation is the scalable union-window pattern instead:

1. UNION the two sides with a marker (right rows carry their payload, left rows
   carry nulls).
2. One window per key ordered by (ts, marker): ``last(payload, ignorenulls)``
   over UNBOUNDED PRECEDING..CURRENT ROW carries the latest right payload
   forward to each left row.
3. Keep left rows.

Cost: ONE shuffle on the key (same as any join), no pair blow-up, window state
is O(1) per row.  At 100 TB this is shuffle-bound on (key, ts) pairs only.
Right rows sort BEFORE left rows at equal ts (marker 0 < 1), so the match is
inclusive (``r.ts <= l.ts``) — the same semantics as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which the correctness gate uses as oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for every left row, the payload of the latest right row
    with the same key(s) and ``right_ts <= left_ts`` (nulls when none exists).

    ``right_cols`` — payload columns carried from the right side (default: all
    non-key, non-ts columns), each emitted as ``<name><suffix>`` plus the match
    timestamp as ``<right_ts><suffix>``.

    Ties: several right rows at the same (key, ts) are resolved deterministically
    by sorting on the first payload column — pre-aggregate the right side to one
    row per (key, ts) when a specific tie rule is needed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    payload = [*right_cols, right_ts]
    # Right rows: marker 0, payload wrapped in ONE struct so last(ignorenulls)
    # carries the whole row atomically (never mixes columns from two matches).
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload]
    return carried.where(F.col("__is_left") == 1).select(*out_left, *out_right)
