"""Summing roll-up ≡ SummingMergeTree fold (SURVEY §5 item 3)."""

import datetime

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.rollup import (
    merge_rollup,
    summing_rollup,
)

T = datetime.datetime


def _events(spark):
    return spark.createDataFrame(
        [
            # same dims, same hour → collapse + sum (FIXTURES A5)
            (T(2024, 7, 19, 10, 5), "dimA", 2),
            (T(2024, 7, 19, 10, 55), "dimA", 3),
            # same dims, next hour → separate bucket
            (T(2024, 7, 19, 11, 0), "dimA", 7),
            # different dim, same hour
            (T(2024, 7, 19, 10, 30), "dimB", 1),
            # null grouping key groups with itself (allow_nullable_key=1 parity)
            (T(2024, 7, 19, 10, 1), None, 4),
            (T(2024, 7, 19, 10, 2), None, 6),
        ],
        ["Start_Time", "dim", "Event_Count"],
    )


def test_summing_rollup_collapses_equal_keys(spark):
    out = summing_rollup(_events(spark)).collect()
    got = {(r["Start_Time"], r["dim"]): r["Event_Count"] for r in out}
    assert got[(T(2024, 7, 19, 10), "dimA")] == 5
    assert got[(T(2024, 7, 19, 11), "dimA")] == 7
    assert got[(T(2024, 7, 19, 10), "dimB")] == 1
    assert got[(T(2024, 7, 19, 10), None)] == 10
    assert len(got) == 4
    assert all(r["event_date"] == datetime.date(2024, 7, 19) for r in out)


def test_merge_rollup_unbounded_lateness(spark, tmp_path):
    """Late rows merge whenever they arrive — SummingMergeTree's merge-on-read
    semantics (SURVEY §7.2 item 2: batch MERGE is the exact-parity mode)."""
    path = str(tmp_path / "rollup")
    merge_rollup(spark, _events(spark), path)
    # a very late row for an existing (hour, dim) key
    late = spark.createDataFrame(
        [(T(2024, 7, 19, 10, 59), "dimA", 100)], ["Start_Time", "dim", "Event_Count"]
    )
    merge_rollup(spark, late, path)
    got = {
        (r["Start_Time"], r["dim"]): r["Event_Count"]
        for r in spark.read.parquet(path).collect()
    }
    assert got[(T(2024, 7, 19, 10), "dimA")] == 105
    assert got[(T(2024, 7, 19, 11), "dimA")] == 7


def test_write_rollup_day_partitioned(spark, tmp_path):
    """B12: the plain day-partitioned append sink."""
    from qradar_restapi_kafka_datapipeline_spark.operators.rollup import write_rollup
    import os

    path = str(tmp_path / "plain")
    write_rollup(_events(spark), path)
    parts = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert parts == ["event_date=2024-07-19"]
    back = spark.read.parquet(path)
    assert back.agg(F.sum("Event_Count")).first()[0] == 23


def test_compaction_parity_and_file_count(spark, tmp_path):
    """VERDICT r4 #7: after repeated late folds every day partition holds one
    small file per shuffle task; compaction must shrink each partition to the
    target file count WITHOUT changing a single value (the parquet analog of
    ClickHouse's background merges — the gate entry rollup_compaction_parity
    proves the same against the raw-events oracle at sf0.01)."""
    import os

    from qradar_restapi_kafka_datapipeline_spark.operators.maintenance import (
        compact_rollup,
    )

    from qradar_restapi_kafka_datapipeline_spark.operators.rollup import (
        write_rollup,
    )

    path = str(tmp_path / "compact")
    write_rollup(_events(spark), path)
    for k in range(3):  # append-mode late folds: one new file set per batch
        late = spark.createDataFrame(
            [(T(2024, 7, 19, 10, k), f"dim{k}", 10 + k),
             (T(2024, 7, 20, 9, k), f"dim{k}", 20 + k)],
            ["Start_Time", "dim", "Event_Count"],
        )
        write_rollup(late, path, mode="append")

    def files_per_partition():
        out = {}
        for d in os.listdir(path):
            if d.startswith("event_date="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]
                )
        return out

    before_rows = sorted(
        map(tuple, spark.read.parquet(path).collect()), key=repr
    )
    before_files = files_per_partition()
    assert len(before_files) == 2  # two day partitions exist
    n_parts = compact_rollup(spark, path, target_files_per_partition=1)
    assert n_parts == 2
    after_files = files_per_partition()
    assert set(after_files) == set(before_files)
    assert all(n == 1 for n in after_files.values()), after_files
    assert sum(after_files.values()) < sum(before_files.values())
    # value-neutral: identical rows before and after
    after_rows = sorted(
        map(tuple, spark.read.parquet(path).collect()), key=repr
    )
    assert after_rows == before_rows
