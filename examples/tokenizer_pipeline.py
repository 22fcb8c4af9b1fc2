#!/usr/bin/env python3
"""Corpus-trained BPE lifecycle: train a merge vocabulary from the corpus,
tokenize every document relationally, and pack sequences to a token budget
using the REAL counts.

    python3 examples/tokenizer_pipeline.py [sf_dir]

Train is one distributed word-frequency pass + driver-side merge learning
on the capped vocabulary (the same bounded-sample pattern as IVF quantizer
training); application is longest-match against the learned vocab — a
substring equi-join plus a bounded per-word fold, so the corpus text is
scanned once no matter how many consumers read the token counts.  Run from
the repo root (Spark python workers resolve the package via the driver's
cwd).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from qradar_restapi_kafka_datapipeline_spark import get_spark
    from qradar_restapi_kafka_datapipeline_spark.operators import bpe as B
    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        pack_sequences,
    )
    from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

    spark = get_spark(app_name="tokenizer-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    # 1. train: distributed vocab extraction, deterministic merge learning
    tokens = B.train_bpe(spark, n_merges=48)
    print(f"learned {len(tokens)} merge tokens; longest: "
          f"{max(tokens, key=len)!r}")

    # 2. apply: relational longest-match tokenize, one corpus pass
    doc_tokens = B.bpe_doc_tokens(spark, tokens)
    doc_tokens.orderBy("doc_id").show(5, truncate=False)
    stats = doc_tokens.agg(
        F.sum("n_words").alias("words"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).first()
    print(f"corpus: {stats['words']} words -> {stats['bpe_tokens']} BPE tokens "
          f"({stats['bpe_tokens'] / max(stats['words'], 1):.2f} tokens/word)")

    # 3. pack to a 512-token budget with the REAL counts
    packed = pack_sequences(
        spark.table("documents"),
        budget=512,
        shard_size=100,
        tokens_df=doc_tokens.select(
            "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
        ),
    )
    bins = packed.groupBy("source").agg(
        F.countDistinct("shard", "bin_id").alias("n_bins"),
        F.sum("n_tokens").alias("tokens"),
    )
    bins.orderBy("source").show()
    spark.stop()


if __name__ == "__main__":
    main()
