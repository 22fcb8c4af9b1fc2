#!/usr/bin/env python3
"""Single-node throughput measurement backing BASELINE.md's rows/s claims.

Amplifies sf0.1's events to ~K×100k rows (distinct user populations per
copy — tools/scale_curve.py's amplifier), then measures:

- ``ingest_pipeline``: the full reference-equivalent path — qevents
  derivation (epoch autodetect, decode-ready columns) + write to parquet.
  The reference does this row-at-a-time in one Python thread
  (ijson parse + dict transforms, etl.py:16-49): order 10-50k rows/s.
- ``summing_rollup``: hourly roll-up aggregate to the day-partitioned sink
  (SummingMergeTree-parity terminal aggregation).

    python3 tools/throughput.py [K]        # default 50 → 5M rows

Prints one JSON line per measurement (min of 2 runs, loadavg recorded —
this host is shared, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qradar_restapi_kafka_datapipeline_spark.engine import get_spark
from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
from tools.scale_curve import amplify


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark(app_name="throughput")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix=f"throughput_{k}x_")
    try:
        amplify(spark, base, k)
        setup(spark, base)
        n = spark.table("events").count()

        def report(name: str, times: list[float], rows: int | None = None) -> None:
            rows = n if rows is None else rows
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
            sec = min(times)
            print(
                json.dumps(
                    {
                        "metric": name,
                        "rows": rows,
                        "sec": round(sec, 2),
                        "rows_per_sec": int(rows / sec),
                        "runs": [round(t, 2) for t in times],
                        "loadavg1": load1,
                    }
                ),
                flush=True,
            )

        times = []
        for i in range(2):
            t0 = time.time()
            spark.table("qevents").write.mode("overwrite").parquet(
                f"{base}/out_qevents_{i}"
            )
            times.append(time.time() - t0)
        report("ingest_pipeline_rows_per_sec", times)

        spark.read.parquet(f"{base}/out_qevents_0").createOrReplaceTempView(
            "qevents_mat"
        )
        times = []
        for i in range(2):
            t0 = time.time()
            spark.sql(
                "SELECT date_trunc('hour', ts) AS Start_Time, domainId, eventName, "
                "SUM(eventCount) AS Event_Count, to_date(ts) AS event_date "
                "FROM qevents_mat GROUP BY 1, 2, 3, 5"
            ).write.mode("overwrite").partitionBy("event_date").parquet(
                f"{base}/out_rollup_{i}"
            )
            times.append(time.time() - t0)
        report("summing_rollup_rows_per_sec", times)

        # Streaming drain rate: the exact foreachBatch summing sink consuming
        # the same relation as an availableNow file stream (the reference's
        # one-shot etl mode, but exactly-once and columnar).
        from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
            streaming_rollup_exact,
        )

        src_df = spark.read.parquet(f"{base}/out_qevents_0").select(
            "ts", "domainId", "eventName", "eventCount"
        )
        times = []
        for i in range(2):
            stream = (
                spark.readStream.schema(src_df.schema)
                .option("maxFilesPerTrigger", 16)
                .parquet(f"{base}/out_qevents_0")
            )
            t0 = time.time()
            streaming_rollup_exact(
                stream,
                f"{base}/stream_rollup_{i}",
                f"{base}/stream_ckpt_{i}",
                measure="eventCount",
                time_col="ts",
            ).awaitTermination()
            times.append(time.time() - t0)
        report("streaming_rollup_drain_rows_per_sec", times)

        # Text-curation scoring throughput (docs/s): the batch/stream-shared
        # projection (lang-ID + quality + token counts + PII redact) over the
        # amplified documents table — all codegen expressions, zero shuffle,
        # so this is the pure per-doc scoring cost a 100 TB sweep pays.
        from qradar_restapi_kafka_datapipeline_spark.streaming.curation_stream import (
            curation_projection_sql,
        )

        nd = spark.table("documents").count()
        times = []
        for i in range(2):
            t0 = time.time()
            spark.sql(curation_projection_sql("spark")).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(time.time() - t0)
        report("curation_scoring_docs_per_sec", times, rows=nd)

        # Sketch-build throughput (rows/s): the fixed-size summaries a
        # telemetry deployment maintains continuously — CM cells (d hash
        # probes per row into a d*w constant keyspace) and HLL registers
        # (1 hash per row into 2^p buckets).  Both are pure groupBy with
        # map-side partials; the rate here is the per-row hashing cost.
        from qradar_restapi_kafka_datapipeline_spark.operators import (
            sketches as K,
        )

        for name, sql in (
            ("sketch_cm_build_rows_per_sec", K.cm_cells_sql("spark")),
            ("sketch_hll_build_rows_per_sec", K.hll_registers_sql("spark")),
            # round 7: HDR ranks (integer bitlen/shift, no hash at all) and
            # KMV bottom-k (1 hash per row + per-partition heaps of k)
            ("sketch_hdr_build_rows_per_sec", K.hdr_cells_sql("spark")),
            ("sketch_kmv_build_rows_per_sec", K.kmv_sketch_sql("spark")),
        ):
            times = []
            for _ in range(2):
                t0 = time.time()
                spark.sql(sql).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            report(name, times)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
