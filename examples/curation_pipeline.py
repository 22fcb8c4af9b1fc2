#!/usr/bin/env python3
"""Training-data curation end-to-end: the funnel a 100 TB corpus runs through.

    python3 examples/curation_pipeline.py [sf_dir]

Stage order mirrors a production pretraining-data pipeline:

    raw corpus
      → blocklist screen (source/term verdicts)
      → length histogram (choose cutoffs)
      → lang/quality/length filter + exact-dedup canonicalization
      → per-language quality-quantile pruning (relative floor)
      → passage-level dedup (cross-document boilerplate scrub)
      → near-dup removal (prefix fingerprint, then MinHash LSH)
      → incremental dedup of a NEW delivery against the held corpus
      → cross-split contamination screen (protect the eval split)
      → unigram LM quality score (corpus-trained perplexity proxy)
      → domain mixing weights + stratified sample + lang rebalance
      → token-budget sequence packing

Every stage is a DataFrame transformation (no driver-side loops); the same
operators are value-checked against DuckDB oracles in the registry gate.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark import get_spark
from qradar_restapi_kafka_datapipeline_spark.entry_queries import setup
from qradar_restapi_kafka_datapipeline_spark.operators.contamination import (
    contamination_report,
)
from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
    blocklist_verdict_sql,
    curate_corpus_sql,
    length_histogram_sql,
    mix_to_target_sql,
    pack_sequences,
    quality_quantile_sql,
    stratified_sample,
)
from qradar_restapi_kafka_datapipeline_spark.operators.dedup import (
    dedup_corpus_near,
    incremental_dedup,
    minhash_lsh_pairs,
    passage_dedup,
    prefix_dup_groups,
)
from qradar_restapi_kafka_datapipeline_spark.operators.text import (
    domain_mix_sql,
    unigram_loglik_sql,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    setup(spark, sf_dir)
    docs = spark.table("documents")
    n_raw = docs.count()
    print(f"[0] raw corpus: {n_raw} docs")

    # 0b. blocklist screen — the first gate a web corpus passes
    verdicts = spark.sql(blocklist_verdict_sql("spark"))
    vc = {r["verdict"]: r["count"] for r in verdicts.groupBy("verdict").count().collect()}
    print(f"[0b] blocklist verdicts: {vc}")

    # 1. length histogram — the diagnostic you pick cutoffs from
    hist = spark.sql(length_histogram_sql()).orderBy("len_bucket")
    print("[1] length histogram (bucket=50 chars):")
    hist.show(5, truncate=False)

    # 2. absolute funnel: lang x quality x length x exact-dedup
    funnel = spark.sql(curate_corpus_sql("spark"))
    print(f"[2] funnel kept (en, q>=0.3, deduped): {funnel.count()}")

    # 3. relative floor: per-language p25 quality quantile
    quant = spark.sql(quality_quantile_sql("spark"))
    print(f"[3] above per-lang p25 quality: {quant.count()} of {n_raw}")

    # 3b. passage-level dedup: scrub passages repeated across documents
    scrubbed = passage_dedup(spark, k=10, min_dup_docs=2)
    touched = scrubbed.where(F.col("n_dropped") > 0).count()
    print(f"[3b] passage dedup: {touched} of {n_raw} docs had passages scrubbed")

    # 4. near-dup removal: cheap prefix screen, then MinHash LSH + verify
    prefix_groups = prefix_dup_groups(docs)
    near = minhash_lsh_pairs(docs, threshold=0.85)
    deduped = dedup_corpus_near(docs)
    print(
        f"[4] near-dup screens: {prefix_groups.count()} prefix groups, "
        f"{near.count()} LSH pairs at jaccard>=0.85; "
        f"cluster-collapsed corpus: {deduped.count()} docs"
    )

    # 4b. incremental dedup: a NEW delivery (doc_id % 7 == 0 stands in)
    # against the held corpus — the recurring-crawl step
    survivors = incremental_dedup(
        docs.where("doc_id % 7 = 0"),
        docs.where("doc_id % 7 != 0"),
        prefix_words=20,
    )
    n_new = docs.where("doc_id % 7 = 0").count()
    print(f"[4b] incremental dedup: {survivors.count()} of {n_new} new docs survive")

    # 5. contamination screen on the held-out split (doc_id % 5 == 0)
    cont = contamination_report(docs)
    flagged = cont.where(F.col("contamination_rate") > 0.5)
    print(
        f"[5] contamination: {cont.count()} test docs screened, "
        f"{flagged.count()} flagged at rate>0.5"
    )

    # 5b. corpus-trained unigram LM score (CCNet/KenLM-style quality proxy)
    lm = spark.sql(unigram_loglik_sql("spark"))
    print("[5b] unigram LM score (lowest-likelihood docs):")
    lm.orderBy("mean_loglik").select("doc_id", "n_tokens", "mean_loglik").show(3)

    # 6. mixing weights + deterministic stratified sample + lang rebalance
    print("[6] domain mix weights:")
    spark.sql(domain_mix_sql()).orderBy(F.desc("mix_weight")).show(5)
    sample = stratified_sample(docs, {"src0": 5000, "src1": 2500}, default_bp=1000)
    print(f"    stratified sample: {sample.count()} docs")
    balanced = spark.sql(mix_to_target_sql("spark", strat_col="lang"))
    print(f"    lang-balanced (uniform target): {balanced.count()} docs")

    # 6b. round 7: the pre-launch planning pair — what the α=0.5 mixture
    # DELIVERS per lang (docs/tokens in vs kept), and a token-proportional
    # deterministic sample (long docs over-drawn per token mass)
    from qradar_restapi_kafka_datapipeline_spark.operators.curation import (
        mix_token_budget_sql,
        weighted_sample_sql,
    )

    print("[6b] per-lang token budget under the temperature mix:")
    spark.sql(mix_token_budget_sql("spark")).orderBy("stratum").show()
    ws = spark.sql(weighted_sample_sql("spark", k=20))
    print(f"     weighted (token-proportional) sample: {ws.count()} docs, "
          f"mean tokens {ws.agg(F.avg('n_tok')).first()[0]:.1f}")

    # 7. pack into token-budget training sequences
    packed = pack_sequences(docs, budget=512, shard_size=100)
    n_bins = packed.select("source", "shard", "bin_id").distinct().count()
    print(f"[7] packed {packed.count()} docs into {n_bins} sequences (budget 512)")

    spark.stop()


if __name__ == "__main__":
    main()
