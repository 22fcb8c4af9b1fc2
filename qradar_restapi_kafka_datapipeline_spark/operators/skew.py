"""Skew-resilient aggregation (the 100 TB survival kit).

AQE's skew-join splitting covers joins, but a groupBy on a hot key (one
customer producing 40% of events — routine in security telemetry) still funnels
that key's rows into one reducer.  ``salted_sum`` is the standard two-phase
fix: phase 1 aggregates on (key, salt) spreading the hot key over N reducers,
phase 2 folds the N partials.  Sums/counts are reassociable, so the result is
bit-identical to the direct groupBy — proven by the registry entry whose
DuckDB oracle IS the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase sum: groupBy(keys + salt) → groupBy(keys).

    ``measures`` maps input column → output alias. The salt derives from a hash
    of the full row's measure column (any spreading value works); partial sums
    reassociate exactly for integer measures and to normal float summation
    nondeterminism for doubles — same class as any parallel sum.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial_aggs = [F.sum(c).alias(f"__p_{c}") for c in measures]
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    final_aggs = [F.sum(f"__p_{c}").alias(alias) for c, alias in measures.items()]
    return partial.groupBy(*keys).agg(*final_aggs)


def bucketed_lag(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list,
    val_col: str,
    bucket_col: str,
    out_col: str = "prev",
) -> DataFrame:
    """``LAG(val_col) OVER (PARTITION BY part_cols ORDER BY order_cols)`` with
    BOUNDED window partitions — the hot-key mitigation for the per-user
    window family (VERDICT r2 #2).

    AQE splits skewed JOIN partitions but never window partitions: one bot
    account holding 5-20% of 100 TB of events makes the plain LAG a single
    straggler task that sorts that user's entire history.  The two-level
    rewrite here bounds every heavy partition by (key × one ``bucket_col``
    span, e.g. one day):

    1. inner LAG over ``part_cols + [bucket_col]`` — each bucket's first row
       gets NULL;
    2. a per-(key, bucket) LAST-row relation (row_number, same bounded
       partitions) — |keys × buckets| rows, tiny vs events;
    3. LAG over THAT relation ordered by bucket supplies each bucket-FIRST
       row's true predecessor (the last row of the key's previous non-empty
       bucket) — substituted by ROW POSITION after an equi-join back, never
       by coalesce, so a legitimate NULL value mid-bucket stays NULL exactly
       as plain LAG returns it.

    Exactly equal to the plain LAG whenever ``bucket_col`` is monotone in the
    primary order column (a coarse truncation of it) — proven by the gate
    entries ``*_bucketed``, whose DuckDB oracles ARE the plain-LAG forms.
    ``order_cols`` are Column expressions; ties must be settled by a unique
    tiebreaker column (the entries use ``event_id``).
    """
    from pyspark.sql.window import Window

    w_in = Window.partitionBy(*part_cols, bucket_col).orderBy(*order_cols)
    # position-based stitch, NOT coalesce: only each bucket's FIRST row takes
    # the previous bucket's last value.  A coalesce would also fire when the
    # inner LAG legitimately returns NULL because the predecessor row's VALUE
    # is NULL — diverging from plain LAG on NULL-bearing columns.
    inner = df.withColumn("__prev_in", F.lag(val_col).over(w_in)).withColumn(
        "__rn_in", F.row_number().over(w_in)
    )
    w_last = Window.partitionBy(*part_cols, bucket_col).orderBy(
        *[c.desc() for c in order_cols]
    )
    lasts = (
        df.withColumn("__rn", F.row_number().over(w_last))
        .where(F.col("__rn") == 1)
        .select(*part_cols, bucket_col, F.col(val_col).alias("__last_val"))
    )
    w_bucket = Window.partitionBy(*part_cols).orderBy(bucket_col)
    prev_last = lasts.withColumn(
        "__prev_bucket_last", F.lag("__last_val").over(w_bucket)
    ).select(*part_cols, bucket_col, "__prev_bucket_last")
    return (
        inner.join(prev_last, [*part_cols, bucket_col], "left")
        .withColumn(
            out_col,
            F.when(
                F.col("__rn_in") == 1, F.col("__prev_bucket_last")
            ).otherwise(F.col("__prev_in")),
        )
        .drop("__prev_in", "__prev_bucket_last", "__rn_in")
    )


def _events_ms(events: DataFrame) -> DataFrame:
    """events + exact epoch-ms order key + day bucket (ms truncation matches
    the oracle's epoch_ms — generation-proof per CLAUDE.md)."""
    return events.withColumn("__ms", F.expr("unix_millis(ts)")).withColumn(
        "__day", F.to_date("ts")
    )


def event_gaps_bucketed(events: DataFrame) -> DataFrame:
    """Skew-safe twin of the ``event_gaps_lag`` entry: per-user ms-since-prev
    via :func:`bucketed_lag` (day buckets) — identical output to the plain
    per-user LAG, window partitions bounded by (user × day)."""
    seq = bucketed_lag(
        _events_ms(events),
        ["user_id"],
        [F.col("__ms"), F.col("event_id")],
        "__ms",
        "__day",
        out_col="__prev_ms",
    )
    return seq.select(
        "event_id",
        "user_id",
        (F.col("__ms") - F.col("__prev_ms")).cast("long").alias("ms_since_prev"),
    )


def event_transitions_bucketed(events: DataFrame) -> DataFrame:
    """Skew-safe twin of ``event_transition_matrix``: prev event type from
    :func:`bucketed_lag`, then the tiny |types|² aggregate and per-prev
    probability window (that window runs over the aggregate, never events)."""
    from pyspark.sql.window import Window

    seq = bucketed_lag(
        _events_ms(events),
        ["user_id"],
        [F.col("__ms"), F.col("event_id")],
        "event_type",
        "__day",
        out_col="__prev",
    )
    agg = (
        seq.where(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev"), F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("prev")
    return agg.select(
        "prev",
        "next",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w) + F.lit(1e-9), 6).alias("p"),
    )


def beaconing_score_bucketed(events: DataFrame) -> DataFrame:
    """Skew-safe twin of ``beaconing_score``: inter-arrival gaps per
    (user, type) from :func:`bucketed_lag`, then the same exact-BIGINT
    cv = sqrt(n·s2 − s1²)/s1 (float only in the terminal sqrt/divide)."""
    seq = bucketed_lag(
        _events_ms(events),
        ["user_id", "event_type"],
        [F.col("__ms"), F.col("event_id")],
        "__ms",
        "__day",
        out_col="__prev_ms",
    )
    gaps = seq.where(F.col("__prev_ms").isNotNull()).select(
        "user_id",
        "event_type",
        F.expr(
            "CAST(__ms AS BIGINT) DIV 1000 - CAST(__prev_ms AS BIGINT) DIV 1000"
        ).alias("g"),
    )
    stats = (
        gaps.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").cast("long").alias("s1"),
            F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
        )
        .where((F.col("n") >= 5) & (F.col("s1") > 0))
    )
    return stats.select(
        "user_id",
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(
            F.sqrt(F.greatest(F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"),
                              F.lit(0)))
            / F.col("s1")
            + F.lit(1e-9),
            4,
        ).alias("beacon_cv"),
    )
