#!/usr/bin/env python3
"""Telemetry sketch lifecycle: the fixed-size summaries a 100 TB cluster
maintains instead of rescanning raw events.

    python3 examples/telemetry_sketches.py [sf_dir]

Walks the whole mergeable-summary family on real parquet: Count-Min heavy
hitters (+ join-cardinality inner product), HyperLogLog distinct (+ the
hourly register cube answering day grain and rolling windows), HDR rank
quantiles for UNBOUNDED value domains (+ the per-hour quantileState cube),
and the KMV bottom-k sketch whose order statistics support set algebra
(Jaccard / intersection of audiences).  Every summary merges: build per
partition/hour, combine by SUM or MAX, never re-touch raw data.  Run from
the repo root.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators import sketches as K
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="telemetry-sketches", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    print("== Count-Min: top talkers (est >= 60 events) ==")
    spark.sql(K.cm_heavy_hitters_sql("spark", threshold=60)).orderBy(
        "est", ascending=False
    ).show(5)

    print("== CM inner product: |click join view| on user_id, from sketches ==")
    spark.sql(K.cm_inner_product_sql("spark")).show()

    print("== HLL: distinct events (one 512-register summary) ==")
    spark.sql(K.hll_distinct_sql("spark")).show()

    print("== HLL cube: rolling 7-day distinct users, served from registers ==")
    K.hll_rolling_distinct(spark).orderBy("day_id").show(5)

    print("== HDR ranks: P50/P90/P99 of `value` (unbounded domain) ==")
    K.hdr_quantiles(spark).orderBy("q").show()

    print("== HDR grouped: per-event-type P99 ==")
    K.hdr_grouped_quantiles(spark, qs_permille=(990,)).orderBy("g").show()

    print("== KMV: distinct estimate + click/view audience overlap ==")
    spark.sql(K.kmv_distinct_sql("spark")).show()
    K.kmv_jaccard(spark).show()

    print("== KMV time cube: day-over-day cohort retention ==")
    K.kmv_retention(spark).orderBy("cohort_day", "later_day").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
