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
