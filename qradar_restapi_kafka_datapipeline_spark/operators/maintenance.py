"""Table maintenance: roll-up compaction + streaming metrics (SURVEY §2 B11/B22).

Continuous merge ingestion (streaming/rollup_stream.py) leaves each day
partition with one file set per micro-batch epoch — the small-files problem
that kills scan throughput at scale (file-open overhead dominates under ~32 MB
files).  ``compact_rollup`` rewrites partitions to a target file count, the
parquet analog of ClickHouse's background merges (the part of SummingMergeTree
the reference got for free, reference ``clickhouse/clickhouse.py:74``).

``MetricsListener`` is the engine-side replacement for the reference's
structured pipeline logger (``pipeline_logger.py:7-63``): per-batch
rows/duration from the StreamingQueryListener bus instead of hand-rolled
counters.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def compact_rollup(
    spark: SparkSession,
    path: str,
    target_files_per_partition: int = 1,
    partition_col: str = "event_date",
) -> int:
    """Rewrite a day-partitioned roll-up with ``target_files_per_partition``
    files per day. Returns partitions rewritten. Idempotent (same data,
    same collapse keys — only the file layout changes)."""
    df = spark.read.parquet(path)
    # Driver-side collect is bounded by the DAY count of the roll-up (one
    # value per partition directory — a few thousand rows after a decade),
    # not by data volume; this is maintenance metadata, not a data path.
    parts = [r[0] for r in df.select(partition_col).distinct().collect()]
    (
        df.repartition(target_files_per_partition * max(len(parts), 1),
                       F.col(partition_col))
        .sortWithinPartitions(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(parts)


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    duration_ms: int


@dataclass
class MetricsListener(StreamingQueryListener):
    """Collects per-micro-batch throughput; optionally emits JSON lines
    (the reference's ujson log-record shape, pipeline_logger.py:22-40)."""

    emit_json: bool = False
    batches: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        m = BatchMetric(
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            duration_ms=sum((p.durationMs or {}).values()),
        )
        self.batches.append(m)
        if self.emit_json:
            print(json.dumps({
                "event": "batch_complete",
                "batch_id": m.batch_id,
                "records_inserted": m.num_input_rows,
                "duration_ms": m.duration_ms,
            }))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)
