#!/usr/bin/env python3
"""Perceptual-hash image dedup end-to-end: encode → hash → banded pairs.

    python3 examples/image_dedup.py [sf_dir]

The image-dedup stage every multimodal training pipeline runs, on this
repo's operators (round 9):

1. attach a textured BMP payload per document (stands in for the crawl's
   image bytes; the encoder is deterministic so the run is reproducible),
2. compute a 64-bit dHash per image with the REAL byte-walking kernel
   (stride-aware pixel walk → integer nearest-neighbor 9×8 resample →
   adjacent-pixel comparison bits) — Arrow-batched mapInPandas,
3. generate near-duplicate pairs by Hamming-banded equi-join (8 one-byte
   bands; pigeonhole-lossless for distance ≤ 7 — never all-pairs),
4. report the distance spectrum and the dedup verdict (images whose hash
   matches a lower-id image at distance ≤ 2 are droppable).

Run from the repo root (Spark python workers resolve the package via the
driver's cwd).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators import multimodal as M
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="image-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    docs = spark.table("documents")
    n_docs = docs.count()

    pairs = M.image_phash_pairs(spark, docs, max_hamming=2).cache()
    spectrum = (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
        .collect()
    )
    print(f"corpus: {n_docs} images")
    for r in spectrum:
        print(f"  hamming={r['hamming']}: {r['n_pairs']} pairs")

    # dedup verdict: drop any image that has a ≤2-distance twin with a
    # smaller id (min-id canonical, the exact-dedup convention)
    droppable = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    n_drop = droppable.count()
    print(
        f"droppable near-duplicate images: {n_drop} "
        f"({100.0 * n_drop / n_docs:.1f}% of corpus)"
    )
    kept = n_docs - n_drop
    print(f"kept canonicals: {kept}")
    pairs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
