"""Z-order layout tests: Morton key algebra + the measured pruning claim.

The registry entry ``zorder_layout_keys`` hash-checks every event's Morton
key against DuckDB; here we (a) pin the interleaving algebra against a
pure-Python reference, and (b) PROVE the layout claim by measurement —
the Z-ordered layout intersects strictly fewer per-file [min,max] extents
than a time-sorted layout for a selective user_id box query, using real
parquet footer statistics (exactly what Delta/Iceberg file skipping
consults).
"""

import pytest
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.layout import (
    file_minmax_stats,
    files_intersecting_box,
    morton_key_sql,
    zorder_bucketed_keys,
    zorder_write,
)


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 40000) for b in (0, 3, 7, 65535)]
    df = spark.createDataFrame(rows, "a INT, b INT")
    df.createOrReplaceTempView("mk")
    got = {
        (r.a, r.b): r.z
        for r in spark.sql(
            "SELECT a, b, " + morton_key_sql("spark", "a", "b") + " AS z FROM mk"
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_ref(a, b, 16), (a, b)


def test_morton_key_is_monotone_box_bounded(spark):
    # The property file skipping relies on: a contiguous zkey range maps to
    # a bounded box in (a, b) — specifically, the 4^k prefix blocks of the
    # curve are axis-aligned squares.  Check the first-level split: all keys
    # with top two bits 00 have both dims in the low half.
    import itertools

    bits = 4
    for a, b in itertools.product(range(16), range(16)):
        z = _morton_ref(a, b, bits)
        if z < 64:  # top quadrant bits 00
            assert a < 8 and b < 8


def test_zorder_prunes_more_files_than_time_sort(spark, tables, tmp_path):
    ev = tables["events"].select(
        "event_id",
        "user_id",
        F.expr("unix_millis(ts) DIV 3600000").alias("hr"),
    )
    n_files = 16

    # Layout 1: the ingestion-order default — sorted/clustered by time only.
    p_time = str(tmp_path / "time_sorted")
    (
        ev.repartitionByRange(n_files, "hr")
        .sortWithinPartitions("hr")
        .write.mode("overwrite")
        .parquet(p_time)
    )

    # Layout 2: Z-order on (user_id, hr).
    p_z = str(tmp_path / "zorder")
    zorder_write(zorder_bucketed_keys(ev, "user_id", "hr", bits=8), p_z,
                 n_files=n_files)

    stats_t = file_minmax_stats(p_time, ["user_id", "hr"])
    stats_z = file_minmax_stats(p_z, ["user_id", "hr"])
    assert len(stats_t) >= 8 and len(stats_z) >= 8

    lo_u, hi_u, lo_h, hi_h = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("hr"), F.max("hr")
    ).collect()[0]

    # Selective user box over the FULL time range: the worst case for a
    # time-clustered layout (every file spans the whole user range).
    span = max(1, (hi_u - lo_u) // 8)
    box = {"user_id": (lo_u, lo_u + span), "hr": (lo_h, hi_h)}
    read_t = files_intersecting_box(stats_t, box)
    read_z = files_intersecting_box(stats_z, box)
    assert read_t == len(stats_t)  # time layout cannot skip anything
    assert read_z < read_t  # the measured pruning claim

    # And the z layout still skips on time alone (both dims bounded): a
    # narrow hour box must not degrade to reading every file.
    hbox = {"hr": (lo_h, lo_h + max(1, (hi_h - lo_h) // 8))}
    assert files_intersecting_box(stats_z, hbox) < len(stats_z)

    # Layout passes never lose rows.
    assert (
        spark.read.parquet(p_z).count()
        == spark.read.parquet(p_time).count()
        == ev.count()
    )


def test_bucketed_keys_range(spark, tables):
    ev = tables["events"].select(
        "user_id", F.expr("unix_millis(ts) DIV 3600000").alias("hr")
    )
    bits = 8
    zdf = zorder_bucketed_keys(ev, "user_id", "hr", bits=bits)
    mm = zdf.agg(F.min("zkey"), F.max("zkey")).collect()[0]
    assert 0 <= mm[0] <= mm[1] < (1 << (2 * bits))
