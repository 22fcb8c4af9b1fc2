#!/usr/bin/env python3
"""Index freshness end-to-end: the round-8 incremental-maintenance motif.

    python3 examples/index_freshness.py [sf_dir]

A 100 TB corpus can't rebuild its text index per delivery.  This example
drives the maintained form of BOTH retrieval indexes:

1. one-shot BM25 and chunk retrieval (the baseline answers),
2. the same corpus replayed as a document STREAM, each micro-batch landing
   an immutable per-epoch term-frequency part (replay-safe: a crashed batch
   overwrites exactly its own part),
3. serving straight from the merged parts — value-IDENTICAL answers, because
   every corpus-wide statistic (df, N, avgdl) is an aggregate over the
   merged relation,
4. committed-frontier compaction folding the part tree down to one part
   (consulting the stream's own checkpoint commit log), answers unchanged.

Run from the repo root (Spark python workers resolve the package via the
driver's cwd).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators.sketches import (
    compact_sketch_parts,
)
from qradar_restapi_kafka_datapipeline_spark.operators.text import (
    bm25_index_streaming,
    bm25_topk_sql,
    chunk_index_streaming,
    chunk_knn_sql,
)
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="index-freshness", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    # 1. one-shot baselines
    bm25_once = spark.sql(bm25_topk_sql("spark")).collect()
    chunk_once = spark.sql(chunk_knn_sql("spark")).collect()
    print("one-shot BM25 top-3:",
          [(r["doc_id"], r["score"]) for r in bm25_once[:3]])

    # 2+3. streamed maintenance (with an injected crash mid-stream — the
    # replay overwrites its own part, so answers must not move)
    parts_info: list = []
    bm25_stream = bm25_index_streaming(
        spark, _crash_after_write_epoch=1, _parts_out=parts_info
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in bm25_stream] == [
        (r["doc_id"], r["score"]) for r in bm25_once
    ], "streamed BM25 diverged from the one-shot build"
    print("streamed BM25 == one-shot (through a crash+replay)")

    chunk_stream = chunk_index_streaming(spark).collect()
    assert [(r["chunk_doc_id"], r["chunk_start"]) for r in chunk_stream] == [
        (r["chunk_doc_id"], r["chunk_start"]) for r in chunk_once
    ], "streamed chunk index diverged from the one-shot build"
    print("streamed chunk index == one-shot")

    # 4. background compaction bounded by the committed frontier
    parts, ckpt = parts_info
    folded = compact_sketch_parts(
        spark, parts, ("doc_id", "word"), {"tf": "sum"}, checkpoint_dir=ckpt
    )
    merged = f"(SELECT doc_id, word, tf FROM parquet.`{parts}`)"
    bm25_compacted = spark.sql(
        bm25_topk_sql("spark", tf_rel=merged)
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in bm25_compacted] == [
        (r["doc_id"], r["score"]) for r in bm25_once
    ], "compaction changed served answers"
    print(f"compacted {folded} epoch parts -> 1; answers unchanged")
    spark.stop()


if __name__ == "__main__":
    main()
