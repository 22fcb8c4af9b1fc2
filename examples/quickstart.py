#!/usr/bin/env python3
"""Quickstart: the engine end-to-end in one script.

    python3 examples/quickstart.py [sf_dir]

Walks the full surface: load tables → AQL through the frontend → hourly
summing roll-up → GLOBALVIEW materialization → dedup + kNN + text analysis on
the documents/embeddings tables.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.aql_corpus import ALLOWED_OUTBOUND_TRAFFIC, DEFAULT_PARAMS
from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
from qradar_restapi_kafka_datapipeline_spark.operators.dedup import exact_dup_groups, minhash_lsh_pairs
from qradar_restapi_kafka_datapipeline_spark.operators.rollup import summing_rollup
from qradar_restapi_kafka_datapipeline_spark.operators.similarity import knn_bruteforce
from qradar_restapi_kafka_datapipeline_spark.operators.text import lang_id, quality_score
from qradar_restapi_kafka_datapipeline_spark.views import materialize_globalviews


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. register tables + the QRadar-shaped event relation + views + functions
    frontend = setup(spark, sf_dir)

    # 2. the reference's own AQL, executed natively
    df = frontend.sql(ALLOWED_OUTBOUND_TRAFFIC, DEFAULT_PARAMS)
    print(f"AllowedOutboundTraffic → {df.count()} rows")
    df.select("domainName", "Source IP", "Destination IP", "Event Count").show(3)

    # 3. the SummingMergeTree-equivalent hourly roll-up
    rolled = summing_rollup(
        spark.sql(
            "SELECT ts AS Start_Time, domainId, eventName, eventCount AS Event_Count "
            "FROM qevents"
        )
    )
    print(f"hourly roll-up → {rolled.count()} (hour × dims) buckets")

    # 4. materialized GLOBALVIEWs
    with tempfile.TemporaryDirectory() as tmp:
        materialize_globalviews(spark, tmp)
        print(f"materialized 9 GLOBALVIEWs under {tmp}")

    # 4b. aggregate navigator: a covered raw-events aggregate auto-routes
    # to the pre-aggregation (same answer, collapsed scan — ~4x faster)
    routed = frontend.sql(
        "SELECT userName, CAST(SUM(eventCount) AS BIGINT) AS total "
        "FROM events WHERE magnitude >= 7 GROUP BY userName "
        "ORDER BY SUM(eventCount) DESC, userName ASC LIMIT 3",
        auto_route=True,
    )
    print("auto-routed top talkers (served from MongoDB_TopSecurityEvents):")
    routed.show()

    # 5. training-data ops on documents/embeddings
    docs = spark.table("documents")
    print(f"exact dup groups → {exact_dup_groups(docs).count()}")
    print(f"minhash near-dup pairs (j≥0.3) → {minhash_lsh_pairs(docs, threshold=0.3).count()}")
    docs.select("doc_id", lang_id().alias("lang_pred"),
                quality_score().alias("quality")).show(3)
    knn_bruteforce(spark.table("embeddings"), query_ids=[0, 1], k=3).show()

    spark.stop()


if __name__ == "__main__":
    main()
