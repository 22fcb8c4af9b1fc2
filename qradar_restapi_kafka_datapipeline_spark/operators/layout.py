"""Z-order (Morton) data layout — multi-dimensional file clustering.

At 100 TB the scan is the query: a table laid out by ingestion time serves
time-range queries with file skipping but reads EVERYTHING for a selective
``user_id`` predicate, because every file spans the full user range.
Interleaving the bits of both dimensions into one sort key (Morton order)
bounds each file's extent in EVERY interleaved dimension at once, so
min/max file statistics prune box queries on any of them — the Delta/
Iceberg ``OPTIMIZE ZORDER BY`` layout pass, expressed as plain Spark:
``repartitionByRange(zkey) → sortWithinPartitions(zkey) → write``.

(The reference pipeline has no layout management — it appends to ClickHouse
and lets MergeTree order by the primary key, one-dimensional by
construction; reference architecture context:
vikramaditya-tatke/qradar-restapi-kafka-datapipeline ``clickhouse/clickhouse.py:74-75``.)

The key computation is a pure integer expression (dialect-shared modulo the
shift spelling), so the registry entry hash-checks every event's Morton key
against DuckDB; the pruning CLAIM is proven by measurement in pytest — the
Z-ordered layout intersects strictly fewer file [min,max] extents than the
time-sorted layout for a box query, using real parquet footer statistics
(exactly the stats a table format's file-skipping consults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_key_sql(
    dialect: str, a_expr: str, b_expr: str, bits: int = 16
) -> str:
    """Interleaved-bit (Morton/Z-curve) key of two non-negative ints, low
    ``bits`` of each: bit ``i`` of ``a`` lands at position ``2i``, of ``b``
    at ``2i+1``.  Pure shifts/masks/ORs — whole-stage codegen in Spark,
    vectorized in DuckDB, bit-identical in both.
    """
    if dialect == "spark":
        def shl(x: str, n: int) -> str:
            return f"shiftleft({x}, {n})" if n else x

        def shr(x: str, n: int) -> str:
            return f"shiftright({x}, {n})" if n else x
    else:
        def shl(x: str, n: int) -> str:
            return f"(({x}) << {n})" if n else x

        def shr(x: str, n: int) -> str:
            return f"(({x}) >> {n})" if n else x

    a = f"CAST({a_expr} AS BIGINT)"
    b = f"CAST({b_expr} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr(a, i)} & 1)", 2 * i))
        terms.append(shl(f"({shr(b, i)} & 1)", 2 * i + 1))
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    zkey_col: str = "zkey",
    n_files: int = 16,
) -> None:
    """The layout pass: range-partition on the Morton key (contiguous key
    ranges per file — what bounds the per-file extents), sort within each
    partition, write one file per partition.  All executor-side; the driver
    only computes the ``n_files - 1`` range boundaries from Spark's sampled
    range partitioner.
    """
    (
        df.repartitionByRange(n_files, F.col(zkey_col))
        .sortWithinPartitions(zkey_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-FILE [min, max] of ``cols`` from parquet footer metadata — the
    statistics a lakehouse table format (Delta/Iceberg/Hudi) records per
    data file and consults for file skipping.  Footer-only reads: no data
    pages are touched, so this is cheap even on huge files."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i
               for i in range(md.row_group(0).num_columns)}
        stats: dict = {"file": os.path.basename(f)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[c]).statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats[c] = (lo, hi)
        out.append(stats)
    return out


def files_intersecting_box(
    stats: list[dict], box: dict[str, tuple]
) -> int:
    """How many files a file-skipping scan must read for a conjunctive box
    predicate, given per-file [min,max] stats."""
    n = 0
    for st in stats:
        if all(st[c][0] <= hi and st[c][1] >= lo for c, (lo, hi) in box.items()):
            n += 1
    return n


def zorder_bucketed_keys(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8, zkey_col: str = "zkey"
) -> DataFrame:
    """Range-normalize both dimensions into ``2^bits`` linear buckets before
    interleaving — without this, the dimension with the wider integer range
    monopolizes the high bits and the curve degenerates to a plain sort on
    it (Delta's OPTIMIZE does the same with range-partition ids).  Min/max
    come from one scalar aggregate broadcast back onto the scan; the bucket
    and key expressions are pure integer codegen.
    """
    n = 1 << bits
    mm = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    bucket_a = (
        f"CAST((CAST({col_a} AS BIGINT) - __amin) * {n} "
        f"/ (__amax - __amin + 1) AS BIGINT)"
    )
    bucket_b = (
        f"CAST((CAST({col_b} AS BIGINT) - __bmin) * {n} "
        f"/ (__bmax - __bmin + 1) AS BIGINT)"
    )
    return (
        df.join(F.broadcast(mm))
        .withColumn(
            zkey_col, F.expr(morton_key_sql("spark", bucket_a, bucket_b, bits))
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )
