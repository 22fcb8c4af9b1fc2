#!/usr/bin/env python3
"""ANN index lifecycle end-to-end: build → append → rebalance → serve.

    python3 examples/ann_lifecycle.py [sf_dir]

The maintenance story at 100 TB: the quantizer stays FROZEN while the
corpus grows (appends are cheap and never rewrite existing lists), and
only when drift degrades the recall contract do you pay a retrain —
``rebalance_ivf_index`` rebuilds from the index's own vectors behind a
crash-safe rename swap, with no serving-code change.  This script drives
the whole loop and checks the honesty conditions at each step:

1. build on 6/7 of the vectors, append the rest with the frozen quantizer,
2. recall@3 of the served index vs the brute-force truth (before),
3. rebalance (retrain + reassign + swap), recall again — must not drop,
4. full-probe search == exact brute force, before AND after (the
   approximate path differs from exact ONLY by the probe budget).

Run from the repo root (Spark python workers resolve the package via the
driver's cwd).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
    append_to_ivf_index,
    build_ivf_index,
    knn_bruteforce,
    knn_ivf_from_index,
    rebalance_ivf_index,
)
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables


def recall_at_k(spark, base, emb, query_ids, k=3, nprobe=4):
    truth = {
        (r["q_id"], r["n_id"])
        for r in knn_bruteforce(emb, query_ids=query_ids, k=k).collect()
    }
    got = {
        (r["q_id"], r["n_id"])
        for r in knn_ivf_from_index(
            spark, base, emb.where(
                f"vec_id IN ({','.join(map(str, query_ids))})"
            ), k=k, nprobe=nprobe,
        ).collect()
    }
    return len(got & truth) / len(truth)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann-lifecycle", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    qids = list(range(10))
    base = os.path.join(tempfile.mkdtemp(prefix="ann_lc_"), "index")

    build_ivf_index(spark, emb.where("vec_id % 7 != 0"), base)
    append_to_ivf_index(spark, base, emb.where("vec_id % 7 = 0"))
    print("built on 6/7 + appended 1/7 with the frozen quantizer")

    def full_probe_exact():
        got = {
            (r["q_id"], r["n_id"], r["cos"])
            for r in knn_ivf_from_index(
                spark, base, emb.where("vec_id < 10"), k=3, nprobe=16
            ).collect()
        }
        want = {
            (r["q_id"], r["n_id"], r["cos"])
            for r in knn_bruteforce(emb, query_ids=qids, k=3).collect()
        }
        assert got == want, "full probe must equal exact brute force"

    before = recall_at_k(spark, base, emb, qids)
    full_probe_exact()
    print(f"recall@3 before rebalance: {before:.2f} (full probe exact: ok)")

    n = rebalance_ivf_index(spark, base)
    after = recall_at_k(spark, base, emb, qids)
    full_probe_exact()
    print(f"rebalanced {n} vectors; recall@3 after: {after:.2f} "
          "(full probe exact: ok)")
    assert after >= before - 1e-9, "rebalance must not degrade recall"
    spark.stop()
    print("ANN LIFECYCLE OK")


if __name__ == "__main__":
    main()
