#!/usr/bin/env python3
"""Takedown (GDPR/opt-out) lifecycle across every maintained index.

    python3 examples/takedown_lifecycle.py [sf_dir]

A training-data pipeline receives document-removal requests constantly;
this script drives the delete story end-to-end and checks the honesty
condition at each step — a removed document must vanish from EVERY
serving surface, and global statistics (BM25's df/N/avgdl, the postings
df-damping) must shrink as if the document had never existed:

1. persisted text index: tombstone log → serve masks → compaction drops
   the rows physically and clears the log, serve unchanged;
2. streamed BM25 index: deletes arrive as their OWN stream (per-epoch
   immutable tombstone parts, replay-safe) and the served ranking equals
   a one-shot rebuild over the remaining documents exactly;
3. vector index: tombstone → serve excludes → compaction (quantizer
   untouched, serving value-identical at any probe budget);
4. (round 13) the ONE-CALL form a real GDPR event uses: a single id set
   fanned across a registered catalog of maintained indexes by
   ``operators.takedown.takedown`` — what steps 1-3 choreograph by hand
   — followed by ``maintenance.vacuum_index`` measuring the masked-row
   debt and compacting when the policy threshold trips.

Run from the repo root (Spark python workers resolve the package via the
driver's cwd).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.operators import text as T
from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
    build_ivf_index,
    compact_ivf_index,
    delete_from_ivf_index,
    knn_ivf_from_index,
)
from qradar_restapi_kafka_datapipeline_spark.sources.registry import load_tables

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="takedown-lifecycle", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF)
    docs = spark.table("documents")
    work = tempfile.mkdtemp(prefix="takedown_")

    # -- 1. persisted text index ------------------------------------------
    ix = os.path.join(work, "text_index")
    T.build_text_index(spark, ix, dim=4096)
    qtext = docs.where("doc_id = 0").first()["text"]
    before = T.text_knn_from_index(spark, ix, qtext, k=10, dim=4096,
                                   query_id=0, exclude_id=0).collect()
    victim = int(before[0]["n_id"])
    print(f"[text] top hit before takedown: doc {victim}")
    T.delete_from_text_index(
        spark, ix, spark.createDataFrame([(victim,)], "doc_id LONG")
    )
    after = T.text_knn_from_index(spark, ix, qtext, k=10, dim=4096,
                                  query_id=0, exclude_id=0).collect()
    assert all(int(r["n_id"]) != victim for r in after)
    print("[text] masked at serve (tombstone anti-join)")
    T.compact_text_index(spark, ix)
    assert not os.path.exists(f"{ix}/tombstones")
    import pyspark.sql.functions as F

    assert spark.read.parquet(f"{ix}/postings") \
        .where(F.col("doc_id") == victim).count() == 0
    after2 = T.text_knn_from_index(spark, ix, qtext, k=10, dim=4096,
                                   query_id=0, exclude_id=0).collect()
    assert [r["n_id"] for r in after2] == [r["n_id"] for r in after]
    print("[text] compaction dropped rows physically; serve unchanged")

    # -- 2. streamed BM25 index: delete stream ≡ rebuild -------------------
    got = sorted(
        (r["doc_id"], r["score"], r["rk"])
        for r in T.text_index_delete_streaming(spark).collect()
    )
    docs.where("NOT (doc_id % 9 = 0)").createOrReplaceTempView("__rem")
    want = sorted(
        (r["doc_id"], r["score"], r["rk"])
        for r in spark.sql(
            T.bm25_topk_sql("spark", query_doc=1, k=10, source="__rem")
        ).collect()
    )
    assert got == want
    print("[bm25] streamed tombstone parts ≡ one-shot rebuild over "
          f"remaining docs ({len(got)} rows, df/N/avgdl all shrank)")

    # -- 3. vector index ----------------------------------------------------
    emb = spark.table("embeddings")
    vix = os.path.join(work, "ivf")
    build_ivf_index(spark, emb, vix)
    served = knn_ivf_from_index(spark, vix, emb.where("vec_id < 5"), k=3)
    gone = {int(r["n_id"]) for r in served.collect()[:2]}
    delete_from_ivf_index(
        spark, vix,
        spark.createDataFrame([(i,) for i in gone], "vec_id LONG"),
    )
    rows = knn_ivf_from_index(spark, vix, emb.where("vec_id < 5"), k=3).collect()
    assert not any(int(r["n_id"]) in gone for r in rows)
    n = compact_ivf_index(spark, vix)
    print(f"[ann] tombstoned {sorted(gone)}, compacted to {n} live vectors "
          "(quantizer untouched — serving value-identical)")

    # -- 4. the one-call fan-out + measured vacuum policy -------------------
    from qradar_restapi_kafka_datapipeline_spark.operators.maintenance import (
        vacuum_index,
    )
    from qradar_restapi_kafka_datapipeline_spark.operators.takedown import (
        RegisteredIndex,
        takedown,
    )

    ix2 = os.path.join(work, "text_index2")
    vix2 = os.path.join(work, "ivf2")
    T.build_text_index(spark, ix2, dim=4096)
    build_ivf_index(spark, spark.table("embeddings"), vix2)
    report = takedown(
        spark,
        docs.where("doc_id % 9 = 0").select("doc_id"),
        [
            RegisteredIndex("text", "text", ix2),
            RegisteredIndex("ann", "ivf", vix2),
        ],
    )
    print(f"[one-call] fanned one id set across {len(report)} indexes: "
          f"{report}")
    for name, kind, path in (("text", "text", ix2), ("ann", "ivf", vix2)):
        out = vacuum_index(spark, path, kind, max_masked_fraction=0.05)
        print(f"[vacuum:{name}] masked_fraction="
              f"{out['masked_fraction']} -> {out['action']}")
        assert out["action"] == "compacted"
        assert out["after"]["masked_rows"] == 0

    print("TAKEDOWN LIFECYCLE OK")
    spark.stop()


if __name__ == "__main__":
    main()
