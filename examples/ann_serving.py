#!/usr/bin/env python3
"""ANN serving lifecycle: build a persisted IVF index, search it cold,
absorb new vectors incrementally, and re-check the recall contract.

    python3 examples/ann_serving.py [sf_dir]

The index is plain parquet: ``centroids/`` plus ``assignments/`` PARTITIONED
BY list_id — the FAISS inverted-file idea expressed as storage layout, so a
query probing nprobe lists file-prunes to those partitions before a row is
read.  Run from the repo root (Spark python workers resolve the package via
the driver's cwd).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
    append_to_ivf_index,
    build_ivf_index,
    knn_bruteforce,
    knn_ivf_from_index,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="ann-serving-example")
    spark.sparkContext.setLogLevel("ERROR")
    setup(spark, SF_DIR)
    emb = spark.table("embeddings")

    index = os.path.join(tempfile.mkdtemp(prefix="ann_example_"), "index")

    # 1. Build: train the coarse quantizer on a bounded sample, write the
    #    partitioned inverted file.  An initial 6/7 of the corpus stands in
    #    for "yesterday's" vectors.
    old = emb.where("vec_id % 7 != 0")
    cents = build_ivf_index(spark, old, index, n_centroids=16)
    print(f"built index at {index}: {len(cents)} lists, "
          f"{spark.read.parquet(index + '/assignments').count()} vectors")

    # 2. Serve: cold search straight off the parquet index — nothing lives in
    #    memory between calls; the probed lists become a static partition
    #    filter on the assignments scan.
    queries = emb.where("vec_id < 5")
    hits = knn_ivf_from_index(spark, index, queries, k=3, nprobe=4)
    hits.show(truncate=False)

    # 3. Grow: assign "today's" vectors with the PERSISTED quantizer and
    #    append into the affected list partitions — no retrain, no rewrite.
    new = emb.where("vec_id % 7 = 0")
    append_to_ivf_index(spark, index, new)
    print("after append:",
          spark.read.parquet(index + "/assignments").count(), "vectors")

    # 4. Trust but verify: measure recall vs brute force after the append —
    #    retrain + rebuild only when drift pushes this below your floor.
    approx = knn_ivf_from_index(spark, index, queries, k=3, nprobe=4)
    exact = knn_bruteforce(emb, query_ids=[0, 1, 2, 3, 4], k=3)
    hit_n = (
        approx.select("q_id", "n_id")
        .join(exact.select("q_id", "n_id"), ["q_id", "n_id"], "left_semi")
        .count()
    )
    print(f"recall@3 after append: {hit_n}/{exact.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
