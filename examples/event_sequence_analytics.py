#!/usr/bin/env python3
"""Event-sequence analytics tour (round 9-10 operators).

    python3 examples/event_sequence_analytics.py [sf_dir]

Walks the behavioral-analytics family over the events table:

1. windowFunnel conversion — deepest view→click→purchase level per user
   within a 1-day window, plus the ClickHouse-style strict modes.
2. The hot-user-safe bucketed funnel — identical output (gate-proven),
   bounded window partitions; use it when one entity owns a large share
   of the stream (bots, NAT gateways, service accounts).
3. Top event-path trigrams — the Sankey path analysis (plain + bucketed).
4. Hysteresis alert episodes — two-threshold flapping-proof alerting,
   batch and streamed (per-epoch parts, replay-safe).

Run from the repo root (mapInPandas-free: every op here is pure SQL).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import (
    event_path_trigrams_bucketed,
    event_path_trigrams_sql,
    hysteresis_alerts_sql,
    hysteresis_streaming,
    window_funnel_sql,
)
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="event-sequence-example", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    day = 86_400_000

    print("== windowFunnel: view -> click -> purchase within 1 day ==")
    spark.sql(window_funnel_sql("spark", window_ms=day)).show()

    print("== strict_order (foreign events break chains) ==")
    spark.sql(
        window_funnel_sql("spark", window_ms=day, mode="strict_order")
    ).show()

    print("== bucketed twin (hot-user-safe; identical output) ==")
    spark.sql(window_funnel_sql("spark", window_ms=day, bucketed=True)).show()

    print("== top event-path trigrams (Sankey) ==")
    spark.sql(event_path_trigrams_sql("spark", top_k=10)).show(truncate=False)

    print("== same, via the per-day bucketed decomposition ==")
    event_path_trigrams_bucketed(spark, top_k=10).show(truncate=False)

    print("== hysteresis alert episodes (ON at 105%, OFF at 99% of mean) ==")
    spark.sql(hysteresis_alerts_sql("spark", 105, 99)).show()

    print("== streamed: per-epoch rate parts, episodes derived at read ==")
    hysteresis_streaming(spark, 105, 99).show()

    spark.stop()


if __name__ == "__main__":
    main()
