"""File-backed loopback Kafka fake — executable tests for the B14 wiring.

The sandbox has no broker (reference ``mykafka/producer.py:7-20`` provisions
one via ``docker-compose.yml:10-28``), so the real ``read_kafka_stream`` /
``write_kafka`` plans stay call-time gated.  This module gives the SAME
consumer contract a file-backed stand-in (VERDICT r4 #8), so the parse chain,
micro-batching, and offset-resume behavior have tests that actually execute:

- **Wire schema**: records surface as ``(key, value, topic, partition,
  offset, timestamp)`` rows — the shape spark-sql-kafka presents — and the
  consumer runs the PRODUCTION parse chain (``ingest.parse_kafka_values``,
  one definition for real source and fake).
- **Per-partition monotone offsets**: assigned at produce time, durable
  across producer instances (``_meta.json`` — underscore-prefixed, so
  Spark's file listing ignores it like ``_SUCCESS``); key-hash partition
  routing (same key → same partition, Kafka's ordering contract).
- **startingOffsets**: ``"earliest"`` / ``"latest"`` / per-partition dict
  ``{"<topic>": {"0": n, ...}}`` — the real source seeks, the fake filters;
  the visible rows are the same.
- **Offset resume**: one produced batch = one immutable file (write-temp +
  atomic rename), so Spark's file-source offset log provides exactly the
  Kafka checkpoint contract — a restarted query with the same checkpoint
  resumes mid-topic with no redelivery and no loss
  (``tests/test_kafka_fake.py`` drives this through the transactional
  roll-up sink).

NOT a broker: single-writer, no consumer groups, no retention/compaction —
loopback test infrastructure, clearly out of the production path.
"""

from __future__ import annotations

import json
import os
import zlib
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.sources.ingest import (
    RAW_EVENT_DDL,
    parse_kafka_values,
)

#: the column set spark-sql-kafka exposes (value/key kept as STRING here —
#: the production parse chain casts to string before from_json anyway)
KAFKA_WIRE_DDL = (
    "key STRING, value STRING, topic STRING, partition INT, "
    "offset BIGINT, timestamp TIMESTAMP"
)


class FileKafkaFake:
    """Loopback 'broker' rooted at ``root``; one subdirectory per topic."""

    def __init__(self, root: str, n_partitions: int = 2) -> None:
        self.root = root
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)

    # -- producer side -------------------------------------------------------

    def _topic_dir(self, topic: str) -> str:
        d = os.path.join(self.root, topic)
        os.makedirs(d, exist_ok=True)
        return d

    def _meta_path(self, topic: str) -> str:
        return os.path.join(self._topic_dir(topic), "_meta.json")

    def next_offsets(self, topic: str) -> dict[int, int]:
        """Offset each partition would assign to its NEXT record."""
        try:
            with open(self._meta_path(topic)) as f:
                meta = json.load(f)
            return {int(p): int(o) for p, o in meta["next"].items()}
        except FileNotFoundError:
            return {p: 0 for p in range(self.n_partitions)}

    def produce(
        self,
        topic: str,
        records: list[dict | str],
        keys: list[str | None] | None = None,
        timestamp: str = "2024-01-01 00:00:00",
    ) -> dict[int, int]:
        """Append one immutable batch file; returns the new next-offsets.

        dict records are JSON-serialized (the reference producer sends JSON
        event dicts, ``mykafka/producer.py:16-19``); keyed records route by
        key hash (stable partition per key — Kafka's per-key ordering),
        unkeyed ones round-robin.
        """
        nxt = self.next_offsets(topic)
        try:
            with open(self._meta_path(topic)) as f:
                n_batches = int(json.load(f).get("batches", 0))
        except FileNotFoundError:
            n_batches = 0
        rows = []
        for i, rec in enumerate(records):
            value = rec if isinstance(rec, str) else json.dumps(rec)
            key = keys[i] if keys is not None else None
            part = (
                zlib.crc32(key.encode("utf-8")) if key is not None else i
            ) % self.n_partitions
            rows.append(
                {
                    "key": key,
                    "value": value,
                    "topic": topic,
                    "partition": part,
                    "offset": nxt[part],
                    "timestamp": timestamp,
                }
            )
            nxt[part] += 1
        d = self._topic_dir(topic)
        tmp = os.path.join(d, f"._batch-{n_batches:08d}.jsonl.tmp")
        final = os.path.join(d, f"batch-{n_batches:08d}.jsonl")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, final)  # atomic: the file source never lists a torn file
        with open(self._meta_path(topic), "w") as f:
            json.dump(
                {"next": {str(p): o for p, o in nxt.items()},
                 "batches": n_batches + 1},
                f,
            )
        return nxt

    # -- consumer side -------------------------------------------------------

    def read_stream_raw(
        self,
        spark: SparkSession,
        topic: str,
        starting_offsets: str = "earliest",
        max_files_per_trigger: int | None = None,
    ) -> DataFrame:
        """Streaming wire-level rows, honoring ``startingOffsets``.

        ``max_files_per_trigger`` is the fake's ``maxOffsetsPerTrigger``:
        one produced batch file per trigger unit.
        """
        reader = spark.readStream.schema(KAFKA_WIRE_DDL)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.json(self._topic_dir(topic))
        start: dict[int, int] | None = None
        if starting_offsets == "latest":
            start = self.next_offsets(topic)  # only records produced after now
        elif starting_offsets != "earliest":
            spec = json.loads(starting_offsets)[topic]
            start = {int(p): int(o) for p, o in spec.items()}
        if start:
            cond = reduce(
                lambda a, b: a | b,
                [
                    (F.col("partition") == p) & (F.col("offset") >= o)
                    for p, o in start.items()
                ],
            )
            raw = raw.where(cond)
        return raw

    def read_stream(
        self,
        spark: SparkSession,
        topic: str,
        schema: str = RAW_EVENT_DDL,
        starting_offsets: str = "earliest",
        max_files_per_trigger: int | None = None,
    ) -> DataFrame:
        """Parsed event rows — the fake twin of ``ingest.read_kafka_stream``,
        running the identical production parse chain."""
        raw = self.read_stream_raw(
            spark, topic, starting_offsets, max_files_per_trigger
        )
        return parse_kafka_values(raw, schema)
